"""UAV hover/track tasks (fork-specific; reference
``direct/quadcopter/quadcopter_env.py`` + ``quadcopter_cfg.py``).

Per-rotor dynamics via :class:`MotorModel` + body-rate :class:`RateController`
(reference _apply_action:150-161); the action is (body-rate cmd(3)·pi,
normalized thrust). The single-body UAV receives the net rotor wrench
(thrust along body z at the rotor arms + yaw reaction torque), the wrench-sum
equivalent of the reference's per-rotor-body forces.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ....assets_presets.quadcopter import UAVLIDAR_CFG
from ....envs.direct_rl_env import DirectEnvState, DirectRLEnv, DirectRLEnvCfg
from ....scene import InteractiveSceneCfg
from ....utils import math as math_utils
from ....utils.configclass import configclass
from .modules import (
    MIXER,
    MotorDomainRandomizationCfg,
    MotorModel,
    RateController,
)


@configclass
class QuadcopterSceneCfg(InteractiveSceneCfg):
    robot = UAVLIDAR_CFG


@configclass
class DomainRandomizationCfg:
    motor: MotorDomainRandomizationCfg = MotorDomainRandomizationCfg()

    @configclass
    class NoiseCfg:
        enable: bool = False
        root_lin_vel_b: float = 0.05
        root_ang_vel_b: float = 0.1

    noise: NoiseCfg = NoiseCfg()


@configclass
class QuadcopterEnvCfg(DirectRLEnvCfg):
    """Reference quadcopter_cfg.py: episode 10 s, decimation 5, dt 0.004."""

    episode_length_s: float = 10.0
    decimation: int = 5
    action_space: int = 4
    observation_space: int = 16
    scene: QuadcopterSceneCfg = QuadcopterSceneCfg(num_envs=4096, env_spacing=2.5)
    domain_randomization: DomainRandomizationCfg = DomainRandomizationCfg()
    # reward scales (reference quadcopter_cfg.py:98-101)
    lin_vel_reward_scale: float = -0.05
    ang_vel_reward_scale: float = -0.05
    action_diff_reward_scale: float = -0.1
    distance_to_goal_reward_scale: float = 20.0
    arm_length: float = 0.17

    def __post_init__(self):
        self.sim.dt = 0.004


class QuadcopterEnv(DirectRLEnv):
    """The fork's ``Hover`` task (reference quadcopter_env.py:36)."""

    cfg: QuadcopterEnvCfg

    def __init__(self, cfg: QuadcopterEnvCfg, **kwargs):
        super().__init__(cfg, **kwargs)
        self.motor_model = MotorModel(
            self.num_envs, self.physics_dt, cfg.domain_randomization.motor
        )
        self.rate_controller = RateController(self.num_envs)
        self._robot = self.scene.articulations["robot"]
        L = cfg.arm_length
        # rotor arms consistent with the mixer columns (see module docstring)
        self._rotor_xy = np.stack(
            [-L * np.asarray(MIXER[:, 1]), L * np.asarray(MIXER[:, 0])], axis=-1
        )

    def _init_user_state(self) -> dict:
        return {
            "motor": self.motor_model.init_state(),
            "rate_ctrl": self.rate_controller.init_state(),
            "desired_pos_w": jnp.zeros((self.num_envs, 3)),
            "target_rate": jnp.zeros((self.num_envs, 3)),
            "target_thrust": jnp.zeros((self.num_envs, 1)),
        }

    # ------------------------------------------------------------------
    def _pre_physics_step(self, state, actions):
        """reference quadcopter_env.py:111-139: rate + thrust targets."""
        user = dict(state.user)
        user["target_rate"] = jnp.clip(actions[:, 0:3], -1.0, 1.0) * jnp.pi
        user["target_thrust"] = jnp.clip(actions[:, 3:4], 0.0, 1.0)
        return state._replace(actions=actions, user=user)

    def _robot_views(self, state):
        views, _ = self.scene.data_views(state.scene, self.physics_dt)
        return views["robot"]

    def _apply_action(self, state):
        """reference _apply_action:150-161: controller -> rotors -> wrench."""
        data = self._robot_views(state)
        user = dict(state.user)
        rc_state, cmds = self.rate_controller.run(
            user["rate_ctrl"],
            user["target_rate"],
            user["target_thrust"],
            data.root_ang_vel_b,
            self.physics_dt,
        )
        motor_state, thrusts, moments = self.motor_model.step(user["motor"], cmds)
        user["rate_ctrl"], user["motor"] = rc_state, motor_state

        quat = data.root_quat_w
        z_b = math_utils.quat_apply(quat, jnp.array([0.0, 0.0, 1.0]))
        f_net_w = jnp.sum(thrusts, axis=1, keepdims=True) * z_b
        # roll/pitch torque from rotor placement + yaw reaction torque
        rotor_xy = jnp.asarray(self._rotor_xy)  # (4, 2)
        tau_x = jnp.sum(thrusts * rotor_xy[None, :, 1], axis=1)
        tau_y = -jnp.sum(thrusts * rotor_xy[None, :, 0], axis=1)
        tau_z = -jnp.sum(moments, axis=1)
        tau_b = jnp.stack([tau_x, tau_y, tau_z], axis=-1)
        tau_w = math_utils.quat_apply(quat, tau_b)
        wrench = jnp.concatenate([tau_w, f_net_w], axis=-1)  # (E, 6)

        body = self._robot.slice.body_start
        f_ext = state.scene.phys.f_ext_w.at[:, body].set(wrench)
        scene_state = state.scene._replace(
            phys=state.scene.phys._replace(f_ext_w=f_ext)
        )
        return state._replace(scene=scene_state, user=user)

    # ------------------------------------------------------------------
    def _get_observations(self, state):
        """reference _get_observations:167-210 (16-dim)."""
        data = self._robot_views(state)
        desired_pos_b, _ = math_utils.subtract_frame_transforms(
            data.root_pos_w, data.root_quat_w, state.user["desired_pos_w"]
        )
        g = data.projected_gravity_b
        g = g / jnp.maximum(jnp.linalg.norm(g, axis=1, keepdims=True), 1e-9)
        obs = jnp.concatenate(
            [data.root_lin_vel_b, data.root_ang_vel_b, g, desired_pos_b,
             state.actions],
            axis=-1,
        )
        return {"policy": obs}

    def _get_rewards(self, state):
        """reference _get_rewards:212-228."""
        data = self._robot_views(state)
        cfg = self.cfg
        lin_vel = jnp.sum(jnp.square(data.root_lin_vel_b), axis=1)
        ang_vel = jnp.sum(jnp.square(data.root_ang_vel_b), axis=1)
        dist = jnp.linalg.norm(
            state.user["desired_pos_w"] - data.root_pos_w, axis=1
        )
        dist_mapped = 1.0 - jnp.tanh(dist / 4.0)
        action_diff = jnp.sum(
            jnp.square(state.actions - state.prev_actions), axis=1
        )
        return (
            lin_vel * cfg.lin_vel_reward_scale
            + ang_vel * cfg.ang_vel_reward_scale
            + dist_mapped * cfg.distance_to_goal_reward_scale
            + action_diff * cfg.action_diff_reward_scale
        ) * self.step_dt

    def _get_dones(self, state):
        """reference _get_dones:230-239 — the fork's 5-tuple."""
        data = self._robot_views(state)
        time_out = state.episode_length >= self.max_episode_length - 1
        z = data.root_pos_w[:, 2]
        died = (z < 0.25) | (z > 3.0)
        zeros = jnp.zeros_like(died)
        return died, zeros, zeros, zeros, time_out

    def _reset_idx(self, state, mask):
        """reference _reset_idx:241-284: respawn + new goal."""
        state = super()._reset_idx(state, mask)
        key, k1, k2, k3 = jax.random.split(state.key, 4)
        user = dict(state.user)
        E = self.num_envs
        goal_xy = jax.random.uniform(k1, (E, 2), minval=-2.0, maxval=2.0)
        goal_z = jax.random.uniform(k2, (E, 1), minval=0.5, maxval=1.5)
        new_goal = jnp.concatenate([goal_xy, goal_z], axis=-1)
        user["desired_pos_w"] = jnp.where(
            mask[:, None], new_goal, user["desired_pos_w"]
        )
        user["motor"] = self.motor_model.reset(user["motor"], k3, mask)
        user["rate_ctrl"] = self.rate_controller.reset(user["rate_ctrl"], mask)
        m = mask[:, None]
        user["target_rate"] = jnp.where(m, 0.0, user["target_rate"])
        user["target_thrust"] = jnp.where(m, 0.0, user["target_thrust"])
        # clear external wrench for reset envs
        f_ext = jnp.where(
            mask[:, None, None], 0.0, state.scene.phys.f_ext_w
        )
        scene_state = state.scene._replace(
            phys=state.scene.phys._replace(f_ext_w=f_ext)
        )
        return state._replace(scene=scene_state, user=user, key=key)
