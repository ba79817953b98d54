"""Direct-workflow cartpole (reference ``direct/cartpole/cartpole_env.py``):
the headline throughput benchmark env (BASELINE.md row 1). Same MDP as the
manager-based task, hand-written hooks."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ....assets_presets.cartpole import CARTPOLE_CFG
from ....envs.direct_rl_env import DirectRLEnv, DirectRLEnvCfg
from ....scene import InteractiveSceneCfg
from ....utils.configclass import configclass


@configclass
class CartpoleDirectSceneCfg(InteractiveSceneCfg):
    robot = CARTPOLE_CFG


@configclass
class CartpoleDirectEnvCfg(DirectRLEnvCfg):
    """Reference CartpoleEnvCfg (direct/cartpole/cartpole_env.py cfg)."""

    decimation: int = 2
    episode_length_s: float = 5.0
    action_scale: float = 100.0
    action_space: int = 1
    observation_space: int = 4
    scene: CartpoleDirectSceneCfg = CartpoleDirectSceneCfg(
        num_envs=4096, env_spacing=4.0
    )
    # reward scales (reference direct cartpole)
    rew_scale_alive: float = 1.0
    rew_scale_terminated: float = -2.0
    rew_scale_pole_pos: float = -1.0
    rew_scale_cart_vel: float = -0.01
    rew_scale_pole_vel: float = -0.005
    initial_pole_angle_range: tuple = (-0.25, 0.25)  # fraction of pi
    max_cart_pos: float = 3.0

    def __post_init__(self):
        self.sim.dt = 1 / 120.0


class CartpoleDirectEnv(DirectRLEnv):
    cfg: CartpoleDirectEnvCfg

    def __init__(self, cfg: CartpoleDirectEnvCfg, **kwargs):
        super().__init__(cfg, **kwargs)
        self._robot = self.scene.articulations["robot"]
        ids, _ = self._robot.find_joints("slider_to_cart")
        self._cart_dof = int(ids[0])
        ids, _ = self._robot.find_joints("cart_to_pole")
        self._pole_dof = int(ids[0])

    def _joint_state(self, state):
        q = self._robot.joint_pos_from_world(state.scene.phys.q)
        qd = self._robot.joint_vel_from_world(state.scene.phys.qd)
        return q, qd

    def _pre_physics_step(self, state, actions):
        effort = jnp.clip(actions, -1.0, 1.0) * self.cfg.action_scale
        est = state.scene.entities["robot"]
        est = self._robot.set_joint_effort_target(
            est, effort, joint_ids=[self._cart_dof]
        )
        ents = dict(state.scene.entities)
        ents["robot"] = est
        return state._replace(
            scene=state.scene._replace(entities=ents), actions=actions
        )

    def _get_observations(self, state):
        q, qd = self._joint_state(state)
        obs = jnp.stack(
            [
                q[:, self._pole_dof],
                qd[:, self._pole_dof],
                q[:, self._cart_dof],
                qd[:, self._cart_dof],
            ],
            axis=-1,
        )
        return {"policy": obs}

    def _get_rewards(self, state):
        cfg = self.cfg
        q, qd = self._joint_state(state)
        died, _ = self._dones_impl(state, q)
        return (
            cfg.rew_scale_alive * 1.0
            + cfg.rew_scale_terminated * died.astype(jnp.float32)
            + cfg.rew_scale_pole_pos * jnp.square(q[:, self._pole_dof])
            + cfg.rew_scale_cart_vel * jnp.abs(qd[:, self._cart_dof])
            + cfg.rew_scale_pole_vel * jnp.abs(qd[:, self._pole_dof])
        )

    def _dones_impl(self, state, q):
        died = jnp.abs(q[:, self._cart_dof]) > self.cfg.max_cart_pos
        time_out = state.episode_length >= self.max_episode_length - 1
        return died, time_out

    def _get_dones(self, state):
        q, _ = self._joint_state(state)
        return self._dones_impl(state, q)

    def _reset_idx(self, state, mask):
        state = super()._reset_idx(state, mask)
        key, k1, k2 = jax.random.split(state.key, 3)
        E = self.num_envs
        lo, hi = self.cfg.initial_pole_angle_range
        pole = jax.random.uniform(
            k1, (E,), minval=lo * jnp.pi, maxval=hi * jnp.pi
        )
        pole_vel = jax.random.uniform(k2, (E,), minval=-0.1, maxval=0.1)
        q, qd = state.scene.phys.q, state.scene.phys.qd
        jp = jnp.zeros((E, 2)).at[:, self._pole_dof].set(pole)
        jv = jnp.zeros((E, 2)).at[:, self._pole_dof].set(pole_vel)
        q, qd = self._robot.write_joint_state_to_sim(q, qd, jp, jv, mask)
        return state._replace(
            scene=state.scene._replace(
                phys=state.scene.phys._replace(q=q, qd=qd)
            ),
            key=key,
        )
