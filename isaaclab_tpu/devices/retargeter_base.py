"""Retargeter interface (reference ``devices/retargeter_base.py``)."""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any


class RetargeterBase(ABC):
    """Transforms raw device data into robot control commands — hand joints
    to end-effector poses, device commands to robot motions, etc."""

    @abstractmethod
    def retarget(self, data: Any) -> Any:
        """Retarget input data to the implementation's output format."""
