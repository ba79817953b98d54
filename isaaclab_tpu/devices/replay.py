"""Scripted/replay teleop device: feeds recorded or programmatic command
sequences through the DeviceBase contract (the headless stand-in for
spacemouse/gamepad/OpenXR backends)."""

from __future__ import annotations

import numpy as np

from .device_base import DeviceBase


class ReplayDevice(DeviceBase):
    def __init__(self, commands, loop: bool = True):
        """``commands``: (T, D) array or list of per-step commands."""
        super().__init__()
        self._commands = np.asarray(commands)
        self._loop = loop
        self._t = 0

    def reset(self):
        self._t = 0

    def advance(self):
        if self._t >= len(self._commands):
            if self._loop:
                self._t = 0
            else:
                return self._commands[-1]
        cmd = self._commands[self._t]
        self._t += 1
        return cmd
