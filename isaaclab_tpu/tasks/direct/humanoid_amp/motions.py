"""Reference-motion source for the AMP humanoid (reference
``direct/humanoid_amp/motions/motion_loader.py``: npz mocap clips).

No mocap assets ship with this repo, so the loader synthesizes a parametric
gait — phase-offset sinusoidal hip/knee/ankle trajectories with arm
counter-swing — sampled at arbitrary times, which exercises the identical
AMP machinery (discriminator, style reward, reference buffers). Swap in real
clips by implementing ``sample_frames`` over recorded data.
"""

from __future__ import annotations

import numpy as np


class ProceduralMotionLoader:
    """Walk/run/dance-style synthetic gait clips.

    AMP observation frame layout (matches HumanoidAmpEnv._amp_frame):
    ``[joint_pos (n), joint_vel (n), root_h (1), lin_vel_b (3), ang_vel_b (3)]``
    """

    def __init__(self, num_joints: int = 19, style: str = "walk",
                 dt: float = 1.0 / 30.0):
        self.num_joints = num_joints
        self.dt = dt
        p = {
            "walk": dict(freq=1.4, hip=0.5, knee=0.7, arm=0.3, speed=1.2,
                         bounce=0.02),
            "run": dict(freq=2.6, hip=0.8, knee=1.1, arm=0.6, speed=3.5,
                        bounce=0.05),
            "dance": dict(freq=1.0, hip=0.3, knee=0.4, arm=1.0, speed=0.0,
                          bounce=0.08),
        }[style]
        self.p = p
        self.duration = 10.0

    def _joint_traj(self, t):
        """(T, n) joint positions of the gait at times t (T,).

        Model joint order (assets_presets/humanoid.py): abdomen(3),
        right leg(hip_x, hip_z, hip_y, knee, ankle), left leg(...),
        right arm(sh1, sh2, elbow), left arm(...)."""
        p = self.p
        w = 2 * np.pi * p["freq"]
        phase = w * t
        n = self.num_joints
        q = np.zeros(t.shape + (n,))
        s, c = np.sin(phase), np.sin(phase + np.pi)
        # legs: hip_y at idx 5 (right), 10 (left); knee 6, 11; ankle 7, 12
        q[..., 5] = -p["hip"] * s
        q[..., 10] = -p["hip"] * c
        q[..., 6] = p["knee"] * np.maximum(s, 0.0) + 0.1
        q[..., 11] = p["knee"] * np.maximum(c, 0.0) + 0.1
        q[..., 7] = 0.3 * p["hip"] * s - 0.1
        q[..., 12] = 0.3 * p["hip"] * c - 0.1
        # arms counter-swing: sh1 at 13 (right), 16 (left); elbow 15, 18
        q[..., 13] = p["arm"] * c * 0.8
        q[..., 16] = p["arm"] * s * 0.8
        q[..., 15] = -0.4 - 0.2 * p["arm"] * np.abs(s)
        q[..., 18] = -0.4 - 0.2 * p["arm"] * np.abs(c)
        # abdomen sway
        q[..., 0] = 0.05 * np.sin(2 * phase)
        return q

    def sample_frames(self, times: np.ndarray) -> np.ndarray:
        """(T, frame_dim) AMP frames at the given times."""
        p = self.p
        q = self._joint_traj(times)
        dq = (self._joint_traj(times + 1e-3) - q) / 1e-3
        w = 2 * np.pi * p["freq"]
        root_h = 1.3 + p["bounce"] * np.sin(2 * w * times)
        lin_vel = np.stack(
            [np.full_like(times, p["speed"]),
             np.zeros_like(times),
             2 * w * p["bounce"] * np.cos(2 * w * times)],
            axis=-1,
        )
        ang_vel = np.zeros(times.shape + (3,))
        return np.concatenate(
            [q, dq, root_h[..., None], lin_vel, ang_vel], axis=-1
        ).astype(np.float32)

    @property
    def frame_dim(self):
        return 2 * self.num_joints + 7

    def sample(self, num_samples: int, num_frames: int, rng=None):
        """(num_samples, num_frames * frame_dim) stacked reference windows
        (reference collect_reference_motions)."""
        rng = rng or np.random.default_rng(0)
        t0 = rng.uniform(0.0, self.duration, size=(num_samples, 1))
        ts = t0 - self.dt * np.arange(num_frames)[None, :]
        frames = self.sample_frames(ts)  # (S, F, D)
        return frames.reshape(num_samples, -1)
