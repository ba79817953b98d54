"""Teleop device layer: stream devices + hand-tracking retargeters
(reference devices/ incl. openxr/retargeters/manipulator)."""

import numpy as np

from isaaclab_tpu.devices import (
    GripperRetargeter,
    HandTrackingDevice,
    Se3AbsRetargeter,
    Se3RelRetargeter,
    TrackingTarget,
)
from isaaclab_tpu.devices.hand_tracking import HAND_JOINT_NAMES, _J


def _hand(thumb_tip, index_tip, palm_quat=(1, 0, 0, 0)):
    j = np.zeros((26, 7))
    j[:, 3] = 1.0
    j[_J["thumb_tip"], :3] = thumb_tip
    j[_J["index_tip"], :3] = index_tip
    j[_J["palm"], 3:7] = palm_quat
    j[_J["wrist"], :3] = 0.5 * (np.asarray(thumb_tip) + np.asarray(index_tip))
    return j


class TestRetargeters:
    def test_abs_pinch_midpoint(self):
        dev = HandTrackingDevice([Se3AbsRetargeter(TrackingTarget.HAND_RIGHT)])
        dev.push_hand_pose(
            TrackingTarget.HAND_RIGHT, _hand([0.1, 0.0, 0.3], [0.2, 0.0, 0.3]))
        (cmd,) = dev.advance()
        np.testing.assert_allclose(cmd[:3], [0.15, 0.0, 0.3], atol=1e-9)
        np.testing.assert_allclose(cmd[3:], [1, 0, 0, 0], atol=1e-9)

    def test_abs_yaw_only(self):
        # palm tilted about x: zero_out_xy_rotation must strip it
        tilt = (np.cos(0.3), np.sin(0.3), 0.0, 0.0)
        ret = Se3AbsRetargeter(
            TrackingTarget.HAND_LEFT, zero_out_xy_rotation=True)
        data = {TrackingTarget.HAND_LEFT: _hand(
            [0, 0, 0.3], [0.05, 0, 0.3], palm_quat=tilt)}
        cmd = ret.retarget(data)
        np.testing.assert_allclose(cmd[3:], [1, 0, 0, 0], atol=1e-7)

    def test_rel_delta(self):
        ret = Se3RelRetargeter(TrackingTarget.HAND_RIGHT)
        d0 = {TrackingTarget.HAND_RIGHT: _hand([0.1, 0, 0.3], [0.2, 0, 0.3])}
        assert np.allclose(ret.retarget(d0), 0.0)  # first frame: no delta
        d1 = {TrackingTarget.HAND_RIGHT: _hand([0.1, 0.02, 0.3],
                                               [0.2, 0.02, 0.3])}
        cmd = ret.retarget(d1)
        np.testing.assert_allclose(cmd[:3], [0.0, 0.02, 0.0], atol=1e-9)

    def test_gripper_hysteresis(self):
        ret = GripperRetargeter(TrackingTarget.HAND_RIGHT)
        far = {TrackingTarget.HAND_RIGHT: _hand([0, 0, 0], [0.08, 0, 0])}
        near = {TrackingTarget.HAND_RIGHT: _hand([0, 0, 0], [0.02, 0, 0])}
        mid = {TrackingTarget.HAND_RIGHT: _hand([0, 0, 0], [0.04, 0, 0])}
        assert ret.retarget(far) is False
        assert ret.retarget(near) is True
        assert ret.retarget(mid) is True   # hysteresis: stays closed
        assert ret.retarget(far) is False
        assert ret.retarget(mid) is False  # hysteresis: stays open

    def test_joint_enumeration_matches_openxr(self):
        assert len(HAND_JOINT_NAMES) == 26
        assert HAND_JOINT_NAMES[0] == "palm"
        assert "index_tip" in HAND_JOINT_NAMES


class TestStreamDevices:
    def test_stream_feeds_commands(self, tmp_path, monkeypatch):
        import json

        from isaaclab_tpu.devices import Se3SpaceMouse

        p = tmp_path / "teleop.jsonl"
        p.write_text(json.dumps(
            {"cmd": [0.1, 0, 0, 0, 0, 0.2, 1.0]}) + "\n")
        monkeypatch.setenv("ISAACLAB_TPU_TELEOP_STREAM", str(p))
        dev = Se3SpaceMouse(pos_sensitivity=2.0, rot_sensitivity=0.5)
        cmd = dev.advance()
        np.testing.assert_allclose(cmd[0], 0.2, atol=1e-9)   # 0.1 * 2.0
        np.testing.assert_allclose(cmd[5], 0.1, atol=1e-9)   # 0.2 * 0.5
        assert cmd[6] == 1.0
