"""Cart–double-pendulum MARL task (reference
``direct/cart_double_pendulum/cart_double_pendulum_env.py``): two agents —
``cart`` pushes the cart, ``pendulum`` torques the second pivot — cooperate to
keep both links upright."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ....assets_presets.cartpole import CART_DOUBLE_PENDULUM_CFG
from ....envs.direct_marl_env import DirectMARLEnv, DirectMARLEnvCfg
from ....scene import InteractiveSceneCfg
from ....utils import math as math_utils
from ....utils.configclass import configclass


@configclass
class CartDoublePendulumSceneCfg(InteractiveSceneCfg):
    robot = CART_DOUBLE_PENDULUM_CFG


@configclass
class CartDoublePendulumEnvCfg(DirectMARLEnvCfg):
    """Reference CartDoublePendulumEnvCfg."""

    decimation: int = 2
    episode_length_s: float = 5.0
    possible_agents: list = ["cart", "pendulum"]
    action_spaces: dict = {"cart": 1, "pendulum": 1}
    observation_spaces: dict = {"cart": 4, "pendulum": 3}
    state_space: int = -1
    scene: CartDoublePendulumSceneCfg = CartDoublePendulumSceneCfg(
        num_envs=4096, env_spacing=4.0
    )
    cart_action_scale: float = 100.0
    pendulum_action_scale: float = 50.0
    max_cart_pos: float = 3.0
    initial_pole_angle_range: tuple = (-0.25, 0.25)
    # reward scales (reference)
    rew_scale_alive: float = 1.0
    rew_scale_terminated: float = -2.0
    rew_scale_cart_pos: float = 0.0
    rew_scale_cart_vel: float = -0.01
    rew_scale_pole_pos: float = -1.0
    rew_scale_pole_vel: float = -0.01
    rew_scale_pendulum_pos: float = -1.0
    rew_scale_pendulum_vel: float = -0.01

    def __post_init__(self):
        self.sim.dt = 1 / 120.0


class CartDoublePendulumEnv(DirectMARLEnv):
    cfg: CartDoublePendulumEnvCfg

    def __init__(self, cfg, **kwargs):
        super().__init__(cfg, **kwargs)
        self._robot = self.scene.articulations["robot"]
        ids, _ = self._robot.find_joints("slider_to_cart")
        self._cart_dof = int(ids[0])
        ids, _ = self._robot.find_joints("cart_to_pole")
        self._pole_dof = int(ids[0])
        ids, _ = self._robot.find_joints("pole_to_pendulum")
        self._pend_dof = int(ids[0])

    def _joint_state(self, state):
        q = self._robot.joint_pos_from_world(state.scene.phys.q)
        qd = self._robot.joint_vel_from_world(state.scene.phys.qd)
        return q, qd

    def _pre_physics_step(self, state, flat):
        acts = self._split_actions(flat)
        effort = jnp.zeros((self.num_envs, self._robot.num_joints))
        effort = effort.at[:, self._cart_dof].set(
            jnp.clip(acts["cart"][:, 0], -1, 1) * self.cfg.cart_action_scale
        )
        effort = effort.at[:, self._pend_dof].set(
            jnp.clip(acts["pendulum"][:, 0], -1, 1)
            * self.cfg.pendulum_action_scale
        )
        est = state.scene.entities["robot"]
        est = self._robot.set_joint_effort_target(est, effort)
        ents = dict(state.scene.entities)
        ents["robot"] = est
        return state._replace(
            scene=state.scene._replace(entities=ents), actions=flat
        )

    def _get_observations(self, state):
        q, qd = self._joint_state(state)
        pole = math_utils.wrap_to_pi(q[:, self._pole_dof])
        pend = math_utils.wrap_to_pi(q[:, self._pend_dof])
        return {
            "cart": jnp.stack(
                [
                    q[:, self._cart_dof],
                    qd[:, self._cart_dof],
                    pole,
                    qd[:, self._pole_dof],
                ],
                axis=-1,
            ),
            "pendulum": jnp.stack(
                [pole + pend, pend, qd[:, self._pend_dof]], axis=-1
            ),
        }

    def _get_rewards(self, state):
        cfg = self.cfg
        q, qd = self._joint_state(state)
        pole = math_utils.wrap_to_pi(q[:, self._pole_dof])
        pend = math_utils.wrap_to_pi(q[:, self._pend_dof])
        died, _ = self._dones_impl(state, q, pole)
        alive = cfg.rew_scale_alive * 1.0
        term = cfg.rew_scale_terminated * died.astype(jnp.float32)
        cart_rew = (
            alive
            + term
            + cfg.rew_scale_pole_pos * jnp.square(pole)
            + cfg.rew_scale_cart_vel * jnp.abs(qd[:, self._cart_dof])
            + cfg.rew_scale_pole_vel * jnp.abs(qd[:, self._pole_dof])
        )
        pend_rew = (
            alive
            + term
            + cfg.rew_scale_pendulum_pos * jnp.square(pole + pend)
            + cfg.rew_scale_pendulum_vel * jnp.abs(qd[:, self._pend_dof])
        )
        return {"cart": cart_rew, "pendulum": pend_rew}

    def _dones_impl(self, state, q, pole):
        died = (
            jnp.abs(q[:, self._cart_dof]) > self.cfg.max_cart_pos
        ) | (jnp.abs(pole) > jnp.pi / 2)
        time_out = state.episode_length >= self.max_episode_length - 1
        return died, time_out

    def _get_dones(self, state):
        q, _ = self._joint_state(state)
        pole = math_utils.wrap_to_pi(q[:, self._pole_dof])
        died, time_out = self._dones_impl(state, q, pole)
        d = {a: died for a in self.possible_agents}
        t = {a: time_out for a in self.possible_agents}
        return d, t

    def _reset_idx(self, state, mask):
        state = super()._reset_idx(state, mask)
        key, k1, k2 = jax.random.split(state.key, 3)
        E = self.num_envs
        lo, hi = self.cfg.initial_pole_angle_range
        pole = jax.random.uniform(k1, (E,), minval=lo * jnp.pi, maxval=hi * jnp.pi)
        pend = jax.random.uniform(k2, (E,), minval=lo * jnp.pi, maxval=hi * jnp.pi)
        jp = jnp.zeros((E, 3))
        jp = jp.at[:, self._pole_dof].set(pole)
        jp = jp.at[:, self._pend_dof].set(pend)
        jv = jnp.zeros((E, 3))
        q, qd = self._robot.write_joint_state_to_sim(
            state.scene.phys.q, state.scene.phys.qd, jp, jv, mask
        )
        return state._replace(
            scene=state.scene._replace(
                phys=state.scene.phys._replace(q=q, qd=qd)
            ),
            key=key,
        )
