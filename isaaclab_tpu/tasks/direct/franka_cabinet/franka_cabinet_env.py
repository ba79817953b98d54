"""Direct-workflow Franka cabinet (reference
``direct/franka_cabinet/franka_cabinet_env.py``): open the drawer, dense
distance/rotation/opening rewards, obs 23."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ....assets_presets.franka import FRANKA_PANDA_CFG
from ....envs.direct_rl_env import DirectRLEnv, DirectRLEnvCfg
from ....scene import InteractiveSceneCfg
from ....utils import math as math_utils
from ....utils.configclass import configclass
from ...manager_based.manipulation.cabinet.cabinet_env_cfg import CABINET_CFG


@configclass
class FrankaCabinetSceneCfg(InteractiveSceneCfg):
    robot = FRANKA_PANDA_CFG
    cabinet = CABINET_CFG


@configclass
class FrankaCabinetDirectEnvCfg(DirectRLEnvCfg):
    """Reference FrankaCabinetEnvCfg (direct/franka_cabinet)."""

    decimation: int = 2
    episode_length_s: float = 8.3333
    action_scale: float = 7.5
    dof_velocity_scale: float = 0.1
    action_space: int = 9
    observation_space: int = 23
    scene: FrankaCabinetSceneCfg = FrankaCabinetSceneCfg(
        num_envs=4096, env_spacing=3.0
    )
    dist_reward_scale: float = 1.5
    rot_reward_scale: float = 1.5
    open_reward_scale: float = 10.0
    action_penalty_scale: float = 0.05
    finger_reward_scale: float = 2.0

    def __post_init__(self):
        self.sim.dt = 1 / 120.0


class FrankaCabinetDirectEnv(DirectRLEnv):
    cfg: FrankaCabinetDirectEnvCfg

    def __init__(self, cfg, **kwargs):
        super().__init__(cfg, **kwargs)
        self._robot = self.scene.articulations["robot"]
        self._cabinet = self.scene.articulations["cabinet"]
        ids, _ = self._robot.find_bodies("panda_hand")
        self._hand_body = int(ids[0])
        ids, _ = self._cabinet.find_bodies("drawer")
        self._drawer_body = int(ids[0])
        ids, _ = self._cabinet.find_joints("drawer_joint")
        self._drawer_joint = int(ids[0])
        wm, s = self._robot.world_model, self._robot.slice
        self._dof_lo = np.asarray(
            wm.dof_limit_lower[s.dof_start : s.dof_start + s.dof_count],
            dtype=np.float32,
        )
        self._dof_hi = np.asarray(
            wm.dof_limit_upper[s.dof_start : s.dof_start + s.dof_count],
            dtype=np.float32,
        )

    def _views(self, state):
        views, _ = self.scene.data_views(state.scene, self.physics_dt)
        return views["robot"], views["cabinet"]

    def _hand_and_handle(self, robot, cab):
        hand_pos = robot.body_pos_w[:, self._hand_body]
        hand_quat = robot.body_quat_w[:, self._hand_body]
        dq = cab.body_quat_w[:, self._drawer_body]
        dp = cab.body_pos_w[:, self._drawer_body]
        handle = dp + math_utils.quat_apply(
            dq, jnp.broadcast_to(jnp.asarray([-0.305, 0.0, 0.01]), dp.shape)
        )
        return hand_pos, hand_quat, handle

    def _pre_physics_step(self, state, actions):
        actions = jnp.clip(actions, -1.0, 1.0)
        est = state.scene.entities["robot"]
        targets = jnp.clip(
            est.joint_pos_target
            + self.cfg.action_scale * self.physics_dt * actions,
            self._dof_lo,
            self._dof_hi,
        )
        est = self._robot.set_joint_position_target(est, targets)
        ents = dict(state.scene.entities)
        ents["robot"] = est
        return state._replace(
            scene=state.scene._replace(entities=ents), actions=actions
        )

    def _get_observations(self, state):
        robot, cab = self._views(state)
        hand_pos, _, handle = self._hand_and_handle(robot, cab)
        jp_scaled = math_utils.scale_transform(
            robot.joint_pos, self._dof_lo, self._dof_hi
        )
        drawer_q = cab.joint_pos[:, self._drawer_joint]
        drawer_v = cab.joint_vel[:, self._drawer_joint]
        obs = jnp.concatenate(
            [
                jp_scaled,
                robot.joint_vel * self.cfg.dof_velocity_scale,
                handle - hand_pos,
                drawer_q[:, None],
                drawer_v[:, None],
            ],
            axis=-1,
        )
        return {"policy": obs}

    def _get_rewards(self, state):
        cfg = self.cfg
        robot, cab = self._views(state)
        hand_pos, hand_quat, handle = self._hand_and_handle(robot, cab)
        d = jnp.linalg.norm(handle - hand_pos, axis=-1)
        dist_reward = 1.0 / (1.0 + d**2)
        dist_reward = jnp.where(d <= 0.02, 2.0 * dist_reward**2, dist_reward**2)
        # ee z-axis should point at the drawer (world -x)
        ee_z = math_utils.quat_apply(
            hand_quat,
            jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), hand_pos.shape),
        )
        rot_reward = jnp.square(jnp.clip(-ee_z[:, 0], 0.0, None))
        drawer_q = cab.joint_pos[:, self._drawer_joint]
        open_reward = drawer_q
        action_penalty = jnp.sum(jnp.square(state.actions), axis=-1)
        return (
            cfg.dist_reward_scale * dist_reward
            + cfg.rot_reward_scale * rot_reward
            + cfg.open_reward_scale * open_reward
            - cfg.action_penalty_scale * action_penalty
        )

    def _get_dones(self, state):
        _, cab = self._views(state)
        opened = cab.joint_pos[:, self._drawer_joint] > 0.39
        time_out = state.episode_length >= self.max_episode_length - 1
        return opened, time_out

    def _reset_idx(self, state, mask):
        state = super()._reset_idx(state, mask)
        key, k1 = jax.random.split(state.key)
        E = self.num_envs
        est = state.scene.entities["robot"]
        n = self._robot.num_joints
        noise = jax.random.uniform(k1, (E, n), minval=-0.125, maxval=0.125)
        jp = jnp.clip(est.default_joint_pos + noise, self._dof_lo, self._dof_hi)
        q, qd = self._robot.write_joint_state_to_sim(
            state.scene.phys.q, state.scene.phys.qd, jp, jnp.zeros_like(jp),
            mask,
        )
        est = self._robot.set_joint_position_target(est, jp)
        ents = dict(state.scene.entities)
        ents["robot"] = est
        return state._replace(
            scene=state.scene._replace(
                phys=state.scene.phys._replace(q=q, qd=qd), entities=ents
            ),
            key=key,
        )
