"""Gamepad / SpaceMouse teleop devices (reference ``devices/gamepad/``,
``devices/spacemouse/``).

There is no HID stack on a headless TPU host (the reference reads carb input
events / pyspacemouse). These devices consume the same command layout from a
JSON-lines stream instead: set ``ISAACLAB_TPU_TELEOP_STREAM`` to a FIFO or
file whose lines are ``{"cmd": [dx, dy, dz, rx, ry, rz, grip]}`` (SE(3)) or
``{"cmd": [vx, vy, wz]}`` (SE(2)); any bridge process (ROS node, websocket,
actual gamepad reader on another machine) can feed it. Without a stream they
return zero commands — same no-op behavior the reference has with no device
plugged in."""

from __future__ import annotations

import json
import os

import numpy as np

from .device_base import DeviceBase


class _StreamDevice(DeviceBase):
    dim: int = 7

    def __init__(self, pos_sensitivity: float = 1.0, rot_sensitivity: float = 1.0):
        super().__init__()
        self._pos_s = pos_sensitivity
        self._rot_s = rot_sensitivity
        self._command = np.zeros(self.dim)
        self._fh = None
        path = os.environ.get("ISAACLAB_TPU_TELEOP_STREAM")
        if path and os.path.exists(path):
            self._fh = open(path, "r")

    def reset(self):
        self._command[:] = 0.0

    def _poll(self):
        if self._fh is None:
            return
        line = self._fh.readline()
        if not line:
            return
        try:
            cmd = np.asarray(json.loads(line)["cmd"], dtype=np.float64)
        except (ValueError, KeyError):
            return
        n = min(self.dim, cmd.shape[0])
        self._command[:n] = cmd[:n]
        if self.dim >= 6:
            self._command[:3] *= self._pos_s
            self._command[3:6] *= self._rot_s
        else:
            self._command *= self._pos_s

    def advance(self) -> np.ndarray:
        self._poll()
        return self._command.copy()


class Se3Gamepad(_StreamDevice):
    """Reference ``Se3Gamepad``: (dpos, drot, gripper) deltas."""

    dim = 7
    help_str = "Se3Gamepad: stream [dx,dy,dz,rx,ry,rz,grip] via ISAACLAB_TPU_TELEOP_STREAM"


class Se2Gamepad(_StreamDevice):
    """Reference ``Se2Gamepad``: (vx, vy, wz) base commands."""

    dim = 3
    help_str = "Se2Gamepad: stream [vx,vy,wz] via ISAACLAB_TPU_TELEOP_STREAM"


class Se3SpaceMouse(_StreamDevice):
    """Reference ``Se3SpaceMouse``: 6-dof deltas + gripper."""

    dim = 7
    help_str = "Se3SpaceMouse: stream [dx,dy,dz,rx,ry,rz,grip] via ISAACLAB_TPU_TELEOP_STREAM"


class Se2SpaceMouse(_StreamDevice):
    dim = 3
    help_str = "Se2SpaceMouse: stream [vx,vy,wz] via ISAACLAB_TPU_TELEOP_STREAM"
