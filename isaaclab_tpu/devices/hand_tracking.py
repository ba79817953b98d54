"""OpenXR-style hand-tracking teleop with retargeters (reference
``devices/openxr/``: ``OpenXRDevice`` + ``retargeters/manipulator/``).

Headless TPU build: there is no XR runtime, so hand-joint poses arrive
programmatically (``push_hand_pose``) or from the same JSON-lines stream the
other stream devices use (``ISAACLAB_TPU_TELEOP_STREAM``, lines
``{"hand": "left"|"right", "joints": [[x,y,z,qw,qx,qy,qz], ...26]}``).
The retargeting pipeline — the part with actual logic — is implemented in
full: absolute/relative SE(3) end-effector retargeting from pinch or wrist,
and hysteretic gripper open/close from thumb-index distance (reference
``se3_abs_retargeter.py``, ``se3_rel_retargeter.py``,
``gripper_retargeter.py``).
"""

from __future__ import annotations

import json
import os
from enum import Enum

import numpy as np

from .device_base import DeviceBase
from .retargeter_base import RetargeterBase

# Standard OpenXR hand-joint enumeration (26 joints; OpenXR spec ordering,
# reference devices/openxr/common.py)
HAND_JOINT_NAMES = [
    "palm", "wrist",
    "thumb_metacarpal", "thumb_proximal", "thumb_distal", "thumb_tip",
    "index_metacarpal", "index_proximal", "index_intermediate",
    "index_distal", "index_tip",
    "middle_metacarpal", "middle_proximal", "middle_intermediate",
    "middle_distal", "middle_tip",
    "ring_metacarpal", "ring_proximal", "ring_intermediate",
    "ring_distal", "ring_tip",
    "little_metacarpal", "little_proximal", "little_intermediate",
    "little_distal", "little_tip",
]
_J = {n: i for i, n in enumerate(HAND_JOINT_NAMES)}
NUM_HAND_JOINTS = len(HAND_JOINT_NAMES)


class TrackingTarget(Enum):
    """What to track (reference OpenXRDevice.TrackingTarget)."""

    HAND_LEFT = 0
    HAND_RIGHT = 1
    HEAD = 2


def _quat_mul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def _yaw_only(q):
    """Project a quaternion to pure z rotation (zero_out_xy_rotation)."""
    w, _x, _y, z = q
    n = np.sqrt(w * w + z * z)
    if n < 1e-9:
        return np.array([1.0, 0.0, 0.0, 0.0])
    return np.array([w / n, 0.0, 0.0, z / n])


class Se3AbsRetargeter(RetargeterBase):
    """Hand joints -> absolute end-effector (pos, quat) command
    (reference ``Se3AbsRetargeter``): pinch midpoint (thumb/index tips) or
    wrist, optional yaw-only orientation."""

    def __init__(self, bound_hand: TrackingTarget,
                 zero_out_xy_rotation: bool = False,
                 use_wrist_rotation: bool = False,
                 use_wrist_position: bool = False,
                 enable_visualization: bool = False):
        if bound_hand not in (TrackingTarget.HAND_LEFT,
                              TrackingTarget.HAND_RIGHT):
            raise ValueError("bound_hand must be HAND_LEFT or HAND_RIGHT")
        self.bound_hand = bound_hand
        self._zero_xy = zero_out_xy_rotation
        self._wrist_rot = use_wrist_rotation
        self._wrist_pos = use_wrist_position

    def retarget(self, data) -> np.ndarray:
        joints = np.asarray(data[self.bound_hand])  # (26, 7)
        if self._wrist_pos:
            pos = joints[_J["wrist"], :3]
        else:
            pos = 0.5 * (joints[_J["thumb_tip"], :3]
                         + joints[_J["index_tip"], :3])
        src = "wrist" if self._wrist_rot else "palm"
        quat = joints[_J[src], 3:7]
        if self._zero_xy:
            quat = _yaw_only(quat)
        return np.concatenate([pos, quat])


class Se3RelRetargeter(RetargeterBase):
    """Hand joints -> delta-pose command from the motion since the last
    frame (reference ``Se3RelRetargeter``), with deadzone + sensitivity."""

    def __init__(self, bound_hand: TrackingTarget,
                 delta_pos_scale_factor: float = 1.0,
                 delta_rot_scale_factor: float = 1.0,
                 min_translation_threshold: float = 0.0005,
                 min_rotation_threshold: float = 0.005,
                 **_kwargs):
        if bound_hand not in (TrackingTarget.HAND_LEFT,
                              TrackingTarget.HAND_RIGHT):
            raise ValueError("bound_hand must be HAND_LEFT or HAND_RIGHT")
        self.bound_hand = bound_hand
        self._pos_scale = delta_pos_scale_factor
        self._rot_scale = delta_rot_scale_factor
        self._pos_dead = min_translation_threshold
        self._rot_dead = min_rotation_threshold
        self._prev = None

    def retarget(self, data) -> np.ndarray:
        joints = np.asarray(data[self.bound_hand])
        pose = np.concatenate([
            0.5 * (joints[_J["thumb_tip"], :3] + joints[_J["index_tip"], :3]),
            joints[_J["palm"], 3:7],
        ])
        if self._prev is None:
            self._prev = pose
            return np.zeros(6)
        dpos = pose[:3] - self._prev[:3]
        if np.linalg.norm(dpos) < self._pos_dead:
            dpos = np.zeros(3)
        # rotation delta as axis-angle of q_new * conj(q_old)
        qo = self._prev[3:7] * np.array([1.0, -1.0, -1.0, -1.0])
        dq = _quat_mul(pose[3:7], qo)
        angle = 2.0 * np.arctan2(np.linalg.norm(dq[1:]), abs(dq[0]))
        if angle < self._rot_dead or np.linalg.norm(dq[1:]) < 1e-9:
            drot = np.zeros(3)
        else:
            axis = dq[1:] / np.linalg.norm(dq[1:]) * np.sign(dq[0])
            drot = axis * angle
        self._prev = pose
        return np.concatenate([dpos * self._pos_scale,
                               drot * self._rot_scale])


class GripperRetargeter(RetargeterBase):
    """Thumb-index distance -> boolean gripper close command with
    hysteresis (reference ``GripperRetargeter``: close < 3 cm,
    open > 5 cm)."""

    GRIPPER_CLOSE_METERS = 0.03
    GRIPPER_OPEN_METERS = 0.05

    def __init__(self, bound_hand: TrackingTarget):
        if bound_hand not in (TrackingTarget.HAND_LEFT,
                              TrackingTarget.HAND_RIGHT):
            raise ValueError("bound_hand must be HAND_LEFT or HAND_RIGHT")
        self.bound_hand = bound_hand
        self._closed = False

    def retarget(self, data) -> bool:
        joints = np.asarray(data[self.bound_hand])
        dist = float(np.linalg.norm(
            joints[_J["thumb_tip"], :3] - joints[_J["index_tip"], :3]))
        if dist < self.GRIPPER_CLOSE_METERS:
            self._closed = True
        elif dist > self.GRIPPER_OPEN_METERS:
            self._closed = False
        return self._closed


class HandTrackingDevice(DeviceBase):
    """Headless OpenXRDevice equivalent: holds the latest (26, 7) joint
    poses per hand, runs the configured retargeters on ``advance()`` and
    returns the tuple of their outputs (reference openxr_device.py
    ``advance`` contract)."""

    TrackingTarget = TrackingTarget

    def __init__(self, retargeters: list[RetargeterBase] | None = None):
        super().__init__()
        self._retargeters = list(retargeters or [])
        ident = np.zeros((NUM_HAND_JOINTS, 7))
        ident[:, 3] = 1.0
        self._data = {
            TrackingTarget.HAND_LEFT: ident.copy(),
            TrackingTarget.HAND_RIGHT: ident.copy(),
            TrackingTarget.HEAD: np.array([0, 0, 0, 1, 0, 0, 0.0]),
        }
        self._fh = None
        path = os.environ.get("ISAACLAB_TPU_TELEOP_STREAM")
        if path and os.path.exists(path):
            self._fh = open(path, "r")

    def push_hand_pose(self, target: TrackingTarget, joints):
        """Programmatic injection of (26, 7) [pos, wxyz-quat] joint poses."""
        self._data[target] = np.asarray(joints, dtype=np.float64)

    def _poll(self):
        if self._fh is None:
            return
        line = self._fh.readline()
        if not line:
            return
        try:
            msg = json.loads(line)
            target = (TrackingTarget.HAND_LEFT if msg.get("hand") == "left"
                      else TrackingTarget.HAND_RIGHT)
            self._data[target] = np.asarray(msg["joints"], dtype=np.float64)
        except (ValueError, KeyError):
            return

    def reset(self):
        for r in self._retargeters:
            if hasattr(r, "_prev"):
                r._prev = None

    def advance(self):
        self._poll()
        if not self._retargeters:
            return self._data
        return tuple(r.retarget(self._data) for r in self._retargeters)
