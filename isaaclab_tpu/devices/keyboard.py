"""Keyboard teleop (reference ``devices/keyboard/``): SE(2)/SE(3) command
devices reading single characters from stdin (termios raw mode when a TTY is
attached; no-ops otherwise)."""

from __future__ import annotations

import select
import sys

import numpy as np

from .device_base import DeviceBase


def _read_key_nonblocking() -> str | None:
    if not sys.stdin.isatty():
        return None
    ready, _, _ = select.select([sys.stdin], [], [], 0.0)
    if ready:
        return sys.stdin.read(1)
    return None


class Se2Keyboard(DeviceBase):
    """(vx, vy, wz) base commands (reference Se2Keyboard bindings:
    arrows/WASD-style)."""

    def __init__(self, v_x_sensitivity=0.8, v_y_sensitivity=0.4,
                 omega_z_sensitivity=1.0):
        super().__init__()
        self._sens = np.array([v_x_sensitivity, v_y_sensitivity, omega_z_sensitivity])
        self._command = np.zeros(3)

    def reset(self):
        self._command[:] = 0.0

    def advance(self) -> np.ndarray:
        key = _read_key_nonblocking()
        if key:
            delta = {
                "w": [1, 0, 0], "s": [-1, 0, 0],
                "a": [0, 1, 0], "d": [0, -1, 0],
                "q": [0, 0, 1], "e": [0, 0, -1],
            }.get(key.lower())
            if key.lower() == "r":
                self.reset()
            elif delta is not None:
                self._command = np.asarray(delta) * self._sens
            if key in self._callbacks:
                self._callbacks[key]()
        return self._command.copy()


class Se3Keyboard(DeviceBase):
    """(dx, dy, dz, drx, dry, drz) + gripper command (reference Se3Keyboard)."""

    def __init__(self, pos_sensitivity=0.4, rot_sensitivity=0.8):
        super().__init__()
        self._pos_s = pos_sensitivity
        self._rot_s = rot_sensitivity
        self._close_gripper = False
        self._delta = np.zeros(6)

    def reset(self):
        self._delta[:] = 0.0
        self._close_gripper = False

    def advance(self):
        key = _read_key_nonblocking()
        self._delta[:] = 0.0
        if key:
            k = key.lower()
            pos_map = {"w": (0, 1), "s": (0, -1), "a": (1, 1), "d": (1, -1),
                       "q": (2, 1), "e": (2, -1)}
            rot_map = {"z": (3, 1), "x": (3, -1), "t": (4, 1), "g": (4, -1),
                       "c": (5, 1), "v": (5, -1)}
            if k in pos_map:
                i, sign = pos_map[k]
                self._delta[i] = sign * self._pos_s
            elif k in rot_map:
                i, sign = rot_map[k]
                self._delta[i] = sign * self._rot_s
            elif k == "k":
                self._close_gripper = not self._close_gripper
            elif k == "r":
                self.reset()
            if key in self._callbacks:
                self._callbacks[key]()
        return self._delta.copy(), self._close_gripper
