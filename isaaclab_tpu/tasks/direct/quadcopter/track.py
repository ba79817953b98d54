"""Track: UAV goal-tracking task (fork-specific; reference
``direct/quadcopter/track.py``): hover MDP with near-origin resampled goals,
height-band termination and tanh-mapped distance reward."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ....utils.configclass import configclass
from .quadcopter_env import QuadcopterEnv, QuadcopterEnvCfg


@configclass
class TrackEnvCfg(QuadcopterEnvCfg):
    """Reference track.py TrackEnvCfg."""

    episode_length_s: float = 10.0
    # reference track rewards: mapped distance (1 - tanh(d/2)) + action diff
    distance_to_goal_reward_scale: float = 15.0
    action_diff_reward_scale: float = -0.2


class TrackEnv(QuadcopterEnv):
    cfg: TrackEnvCfg

    def _get_rewards(self, state):
        """Reference track.py:193-250 (distance tanh/2 mapping)."""
        data = self._robot_views(state)
        cfg = self.cfg
        dist = jnp.linalg.norm(
            state.user["desired_pos_w"] - data.root_pos_w, axis=1
        )
        dist_mapped = 1.0 - jnp.tanh(dist / 2.0)
        action_diff = jnp.sum(
            jnp.square(state.actions - state.prev_actions), axis=1
        )
        ang_vel = jnp.sum(jnp.square(data.root_ang_vel_b), axis=1)
        return (
            dist_mapped * cfg.distance_to_goal_reward_scale
            + action_diff * cfg.action_diff_reward_scale
            + ang_vel * cfg.ang_vel_reward_scale
        ) * self.step_dt

    def _get_dones(self, state):
        """Reference track.py:252-267: height band only."""
        data = self._robot_views(state)
        time_out = state.episode_length >= self.max_episode_length - 1
        z = data.root_pos_w[:, 2]
        height_died = (z < 0.15) | (z > 3.0)
        zeros = jnp.zeros_like(height_died)
        return zeros, height_died, zeros, zeros, time_out

    def _reset_idx(self, state, mask):
        """Reference track.py:269-308: goals xy in [-1,1], z in [0.25,2]."""
        state = super()._reset_idx(state, mask)
        key, k1, k2 = jax.random.split(state.key, 3)
        E = self.num_envs
        goal_xy = jax.random.uniform(k1, (E, 2), minval=-1.0, maxval=1.0)
        goal_z = jax.random.uniform(k2, (E, 1), minval=0.25, maxval=2.0)
        new_goal = jnp.concatenate([goal_xy, goal_z], axis=-1)
        user = dict(state.user)
        user["desired_pos_w"] = jnp.where(
            mask[:, None], new_goal, user["desired_pos_w"]
        )
        return state._replace(user=user, key=key)
