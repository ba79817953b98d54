"""Shared direct-workflow locomotion env (reference
``direct/locomotion/locomotion_env.py:LocomotionEnv``): MuJoCo-style
run-toward-target MDP used by the direct Ant and Humanoid tasks."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ....envs.direct_rl_env import DirectRLEnv, DirectRLEnvCfg
from ....utils import math as math_utils
from ....utils.configclass import configclass


@configclass
class LocomotionDirectEnvCfg(DirectRLEnvCfg):
    action_scale: float = 1.0
    joint_gears: list = None  # per-joint effort gearing
    heading_weight: float = 0.5
    up_weight: float = 0.1
    energy_cost_scale: float = 0.05
    actions_cost_scale: float = 0.005
    alive_reward_scale: float = 0.5
    dof_vel_scale: float = 0.2
    death_cost: float = -2.0
    termination_height: float = 0.31
    angular_velocity_scale: float = 1.0
    contact_force_scale: float = 0.1


class LocomotionDirectEnv(DirectRLEnv):
    """Run in +x (reference locomotion_env.py: target 1000m ahead)."""

    cfg: LocomotionDirectEnvCfg

    TARGET = (1000.0, 0.0, 0.0)

    def __init__(self, cfg, **kwargs):
        super().__init__(cfg, **kwargs)
        self._robot = self.scene.articulations["robot"]
        self._gears = np.asarray(cfg.joint_gears, dtype=np.float32)
        wm = self._robot.world_model
        s = self._robot.slice
        self._dof_lo = np.asarray(
            wm.dof_limit_lower[s.dof_start : s.dof_start + s.dof_count],
            dtype=np.float32,
        )
        self._dof_hi = np.asarray(
            wm.dof_limit_upper[s.dof_start : s.dof_start + s.dof_count],
            dtype=np.float32,
        )

    # ------------------------------------------------------------------
    def _views(self, state):
        views, _ = self.scene.data_views(state.scene, self.physics_dt)
        return views["robot"]

    def _pre_physics_step(self, state, actions):
        effort = actions * self.cfg.action_scale * self._gears
        est = state.scene.entities["robot"]
        est = self._robot.set_joint_effort_target(est, effort)
        ents = dict(state.scene.entities)
        ents["robot"] = est
        return state._replace(
            scene=state.scene._replace(entities=ents), actions=actions
        )

    def _get_observations(self, state):
        cfg = self.cfg
        data = self._views(state)
        pos = data.root_pos_w
        quat = data.root_quat_w
        lin_vel_b = data.root_lin_vel_b
        ang_vel_b = data.root_ang_vel_b
        target = jnp.asarray(self.TARGET)
        to_target = target - pos
        angle = jnp.arctan2(to_target[:, 1], to_target[:, 0])
        _, _, yaw = math_utils.euler_xyz_from_quat(quat)
        roll, pitch, _ = math_utils.euler_xyz_from_quat(quat)
        up_proj = math_utils.quat_apply(
            quat, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), pos.shape)
        )[:, 2]
        heading_proj = jnp.cos(angle - yaw)
        jp = data.joint_pos
        jv = data.joint_vel
        jp_scaled = math_utils.scale_transform(jp, self._dof_lo, self._dof_hi)
        obs = jnp.concatenate(
            [
                pos[:, 2:3],
                lin_vel_b,
                ang_vel_b * cfg.angular_velocity_scale,
                math_utils.wrap_to_pi(yaw)[:, None],
                math_utils.wrap_to_pi(roll)[:, None],
                math_utils.wrap_to_pi(angle - yaw)[:, None],
                up_proj[:, None],
                heading_proj[:, None],
                jp_scaled,
                jv * cfg.dof_vel_scale,
                state.actions,
            ],
            axis=-1,
        )
        return {"policy": obs}

    def _get_rewards(self, state):
        cfg = self.cfg
        data = self._views(state)
        pos = data.root_pos_w
        quat = data.root_quat_w
        target = jnp.asarray(self.TARGET)
        to_target = target - pos
        angle = jnp.arctan2(to_target[:, 1], to_target[:, 0])
        _, _, yaw = math_utils.euler_xyz_from_quat(quat)
        heading_proj = jnp.cos(angle - yaw)
        up_proj = math_utils.quat_apply(
            quat, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), pos.shape)
        )[:, 2]
        heading_reward = jnp.where(
            heading_proj > 0.8,
            cfg.heading_weight,
            cfg.heading_weight * heading_proj / 0.8,
        )
        up_reward = jnp.where(up_proj > 0.93, cfg.up_weight, 0.0)
        actions_cost = jnp.sum(jnp.square(state.actions), axis=-1)
        jv = data.joint_vel
        electricity_cost = jnp.sum(
            jnp.abs(state.actions * jv * cfg.dof_vel_scale), axis=-1
        )
        # progress: forward velocity toward the target
        vel_toward = data.root_lin_vel_w[:, 0]
        alive = cfg.alive_reward_scale
        total = (
            vel_toward
            + alive
            + up_reward
            + heading_reward
            - cfg.actions_cost_scale * actions_cost
            - cfg.energy_cost_scale * electricity_cost
        )
        died, _ = self._get_dones(state)
        return jnp.where(died, cfg.death_cost, total)

    def _get_dones(self, state):
        data = self._views(state)
        died = data.root_pos_w[:, 2] < self.cfg.termination_height
        time_out = state.episode_length >= self.max_episode_length - 1
        return died, time_out

    def _reset_idx(self, state, mask):
        state = super()._reset_idx(state, mask)
        key, k1, k2 = jax.random.split(state.key, 3)
        E = self.num_envs
        n = self._robot.num_joints
        dq = jax.random.uniform(k1, (E, n), minval=-0.2, maxval=0.2)
        dv = jax.random.uniform(k2, (E, n), minval=-0.1, maxval=0.1)
        est = state.scene.entities["robot"]
        jp = jnp.clip(est.default_joint_pos + dq, self._dof_lo, self._dof_hi)
        jv = est.default_joint_vel + dv
        q, qd = self._robot.write_joint_state_to_sim(
            state.scene.phys.q, state.scene.phys.qd, jp, jv, mask
        )
        phys = state.scene.phys._replace(q=q, qd=qd)
        return state._replace(
            scene=state.scene._replace(phys=phys), key=key
        )
