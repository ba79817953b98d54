"""UAV deployment env (fork-specific; reference
``direct/quadcopter/lidardeployment_env.py``): a host-facing single-robot view
of the lidar-navigation MDP for running trained policies against external
state — observations are assembled from caller-provided odometry + scan
instead of the simulator, so the exported policy can be driven by real sensor
streams."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ....utils import math as math_utils


class LidarDeploymentEnv:
    """Builds LidarFly/LidarGuide-layout observations from external data.

    Usage::

        env = LidarDeploymentEnv(num_rays=72, lidar_range=10.0)
        obs = env.compute_obs(odom, scan, goal, last_action)
        action = policy(obs)
    """

    def __init__(self, num_rays: int, lidar_range: float = 10.0,
                 obs_history: int = 0):
        self.num_rays = num_rays
        self.lidar_range = lidar_range
        self.obs_history = obs_history
        self._queue = None

    def reset(self):
        self._queue = None

    def compute_obs(self, pos_w, quat_w, lin_vel_b, ang_vel_b, scan_distances,
                    goal_w, last_action):
        """Assemble the LidarFly observation (lidarfly_env.py:228-253 layout)
        from external odometry. All inputs are single-robot (no batch)."""
        pos_w = jnp.asarray(pos_w)[None]
        quat_w = jnp.asarray(quat_w)[None]
        lin_vel_b = jnp.asarray(lin_vel_b)[None]
        ang_vel_b = jnp.asarray(ang_vel_b)[None]
        goal_w = jnp.asarray(goal_w)[None]
        last_action = jnp.asarray(last_action)[None]
        dist = jnp.clip(jnp.asarray(scan_distances)[None], 0.0, self.lidar_range)
        scan = (self.lidar_range - dist) / self.lidar_range

        delta = goal_w - pos_w
        dist_xy = jnp.linalg.norm(delta[:, :2], axis=-1)
        dir_xy = delta[:, :2] / jnp.maximum(dist_xy[:, None], 1e-6)
        target_yaw = jnp.arctan2(delta[:, 1], delta[:, 0])
        roll, pitch, yaw = math_utils.euler_xyz_from_quat(quat_w)
        yaw_error = math_utils.wrap_to_pi(target_yaw - yaw)
        non_lidar = jnp.concatenate(
            [
                lin_vel_b / 5.0,
                ang_vel_b,
                (delta[:, 2])[:, None] / 2.0,
                (roll / jnp.pi)[:, None],
                (pitch / jnp.pi)[:, None],
                (yaw_error / jnp.pi)[:, None],
                dir_xy,
                dist_xy[:, None] / 10.0,
                last_action,
            ],
            axis=-1,
        )
        if self.obs_history:
            if self._queue is None:
                self._queue = np.zeros(
                    (self.obs_history, non_lidar.shape[-1]), dtype=np.float32
                )
            self._queue = np.concatenate(
                [self._queue[1:], np.asarray(non_lidar)], axis=0
            )
            non_lidar = jnp.asarray(self._queue.reshape(1, -1))
        return jnp.clip(
            jnp.concatenate([scan, non_lidar], axis=-1), -5.0, 5.0
        )[0]
