"""Device base (reference ``devices/device_base.py``)."""

from __future__ import annotations


class DeviceBase:
    """Contract: ``reset()``, ``add_callback(key, fn)``, ``advance() -> cmd``."""

    def __init__(self):
        self._callbacks: dict = {}

    def reset(self):
        pass

    def add_callback(self, key: str, func):
        self._callbacks[key] = func

    def advance(self):
        raise NotImplementedError
