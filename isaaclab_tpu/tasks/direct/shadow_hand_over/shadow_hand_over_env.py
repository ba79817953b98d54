"""Shadow-hand-over MARL task (reference
``direct/shadow_hand_over/shadow_hand_over_env.py``): two shadow hands facing
each other pass a cube — agent per hand, shared object-transport reward."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ....assets import RigidObjectCfg, RigidObjectInitStateCfg
from ....assets_presets.shadow_hand import SHADOW_HAND_CFG
from ....envs.direct_marl_env import DirectMARLEnv, DirectMARLEnvCfg
from ....scene import InteractiveSceneCfg
from ....utils import math as math_utils
from ....utils.configclass import configclass
from ..shadow_hand.shadow_hand_env import build_repose_cube

# the left hand faces the right one: offset along y, yawed pi
_LEFT_HAND_CFG = SHADOW_HAND_CFG.replace(
    init_state=SHADOW_HAND_CFG.init_state.replace(
        pos=(0.0, -0.6, 0.0), rot=(0.0, 0.0, 0.0, 1.0)
    )
)


@configclass
class ShadowHandOverSceneCfg(InteractiveSceneCfg):
    right_hand = SHADOW_HAND_CFG
    left_hand = _LEFT_HAND_CFG
    object = RigidObjectCfg(
        model=build_repose_cube,
        init_state=RigidObjectInitStateCfg(pos=(0.0, -0.01, 0.62)),
    )


@configclass
class ShadowHandOverEnvCfg(DirectMARLEnvCfg):
    """Reference ShadowHandOverEnvCfg."""

    decimation: int = 2
    episode_length_s: float = 7.5
    possible_agents: list = ["right_hand", "left_hand"]
    action_spaces: dict = {"right_hand": 23, "left_hand": 23}
    observation_spaces: dict = {"right_hand": 0, "left_hand": 0}  # set at init
    state_space: int = -1
    scene: ShadowHandOverSceneCfg = ShadowHandOverSceneCfg(
        num_envs=8192, env_spacing=0.75
    )
    dist_reward_scale: float = 20.0
    throw_goal: tuple = (0.0, -0.59, 0.62)  # above the left palm
    fall_height: float = 0.3
    reset_position_noise: float = 0.01
    reset_dof_pos_noise: float = 0.2

    def __post_init__(self):
        self.sim.dt = 1.0 / 120.0


class ShadowHandOverEnv(DirectMARLEnv):
    cfg: ShadowHandOverEnvCfg

    def __init__(self, cfg, **kwargs):
        # per-hand obs: jp + jv + object pose(7) + goal(3) — resolved below
        super().__init__(cfg, **kwargs)
        self._right = self.scene.articulations["right_hand"]
        self._left = self.scene.articulations["left_hand"]
        self._object = self.scene.rigid_objects["object"]
        nd = self._right.num_joints
        self.num_hand_dofs = nd
        obs_dim = 2 * nd + 7 + 3
        self.cfg.observation_spaces = {
            "right_hand": obs_dim, "left_hand": obs_dim,
        }
        self.num_observations = 2 * obs_dim
        self._goal = np.asarray(cfg.throw_goal, dtype=np.float32)
        wm = self._right.model
        self._dof_lower = np.asarray(wm.dof_limit_lower, dtype=np.float32)
        self._dof_upper = np.asarray(wm.dof_limit_upper, dtype=np.float32)
        self._in_hand_pos = np.asarray(
            cfg.scene.object.init_state.pos, dtype=np.float32
        )

    def _views(self, state):
        views, _ = self.scene.data_views(state.scene, self.physics_dt)
        return views["right_hand"], views["left_hand"], views["object"]

    def _pre_physics_step(self, state, flat):
        acts = self._split_actions(flat)
        ents = dict(state.scene.entities)
        for name, art in (("right_hand", self._right), ("left_hand", self._left)):
            targets = math_utils.unscale_transform(
                jnp.clip(acts[name], -1.0, 1.0),
                self._dof_lower, self._dof_upper,
            )
            ents[name] = art.set_joint_position_target(ents[name], targets)
        return state._replace(
            scene=state.scene._replace(entities=ents), actions=flat
        )

    def _agent_obs(self, hand_view, obj, goal):
        jp = math_utils.scale_transform(
            hand_view.joint_pos, self._dof_lower, self._dof_upper
        )
        return jnp.concatenate(
            [
                jp,
                hand_view.joint_vel * 0.2,
                obj.root_pos_w,
                obj.root_quat_w,
                jnp.broadcast_to(goal, obj.root_pos_w.shape),
            ],
            axis=-1,
        )

    def _get_observations(self, state):
        right, left, obj = self._views(state)
        goal = jnp.asarray(self._goal)
        return {
            "right_hand": self._agent_obs(right, obj, goal),
            "left_hand": self._agent_obs(left, obj, goal),
        }

    def _get_rewards(self, state):
        _, _, obj = self._views(state)
        d = jnp.linalg.norm(obj.root_pos_w - self._goal[None], axis=-1)
        rew = self.cfg.dist_reward_scale * jnp.exp(-10.0 * d)
        return {a: rew for a in self.possible_agents}

    def _get_dones(self, state):
        _, _, obj = self._views(state)
        fell = obj.root_pos_w[:, 2] < self.cfg.fall_height
        time_out = state.episode_length >= self.max_episode_length - 1
        d = {a: fell for a in self.possible_agents}
        t = {a: time_out for a in self.possible_agents}
        return d, t

    def _reset_idx(self, state, mask):
        state = super()._reset_idx(state, mask)
        E = self.num_envs
        key, k1, k2, k3 = jax.random.split(state.key, 4)
        pos_noise = jax.random.uniform(
            k1, (E, 3), minval=-self.cfg.reset_position_noise,
            maxval=self.cfg.reset_position_noise,
        )
        new_pos = self._in_hand_pos[None] + pos_noise
        new_rot = math_utils.random_orientation(k2, E)
        pose = jnp.concatenate([new_pos, new_rot], axis=-1)
        q = self._object.write_root_pose_to_sim(state.scene.phys.q, pose, mask)
        qd = self._object.write_root_velocity_to_sim(
            q, state.scene.phys.qd, jnp.zeros((E, 6)), mask
        )
        ents = dict(state.scene.entities)
        for name, art in (("right_hand", self._right), ("left_hand", self._left)):
            est = ents[name]
            noise = jax.random.uniform(
                k3, (E, self.num_hand_dofs), minval=-1.0, maxval=1.0
            )
            jp = jnp.clip(
                est.default_joint_pos + self.cfg.reset_dof_pos_noise * noise,
                self._dof_lower, self._dof_upper,
            )
            q, qd = art.write_joint_state_to_sim(
                q, qd, jp, jnp.zeros_like(jp), mask
            )
            ents[name] = art.set_joint_position_target(est, jp)
        return state._replace(
            scene=state.scene._replace(
                phys=state.scene.phys._replace(q=q, qd=qd), entities=ents
            ),
            key=key,
        )
