"""In-hand cube repose (reference ``direct/shadow_hand/shadow_hand_env.py`` /
``inhand_manipulation``): rotate a cube held in the upturned hand to a target
orientation. The reference's headline contact benchmark
(Isaac-Repose-Cube-Shadow-Direct-v0, BASELINE.md Shadow rows).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ....assets import RigidObjectCfg, RigidObjectInitStateCfg
from ....assets_presets.shadow_hand import SHADOW_HAND_CFG
from ....envs.direct_rl_env import DirectRLEnv, DirectRLEnvCfg
from ....physics.model import GEOM_BOX, JOINT_FREE, ModelBuilder
from ....scene import InteractiveSceneCfg
from ....utils import math as math_utils
from ....utils.configclass import configclass


def build_repose_cube():
    b = ModelBuilder("cube")
    body = b.add_body(
        "object", -1, JOINT_FREE, mass=0.065,
        inertia=np.eye(3) * (0.065 * 2 * 0.0325**2 / 3),
    )
    b.add_geom(body, GEOM_BOX, (0.0325, 0.0325, 0.0325), friction=1.2)
    return b.build()


@configclass
class ShadowHandSceneCfg(InteractiveSceneCfg):
    robot = SHADOW_HAND_CFG
    object = RigidObjectCfg(
        model=build_repose_cube,
        init_state=RigidObjectInitStateCfg(pos=(0.0, -0.01, 0.62)),
    )


@configclass
class ShadowHandEnvCfg(DirectRLEnvCfg):
    """Reference ShadowHandEnvCfg: 20 actuated joints, 8s episodes."""

    decimation: int = 2
    episode_length_s: float = 10.0
    action_space: int = 23  # 22 hand + 1 wrist dof in our URDF-built model
    observation_space: int = 124  # placeholder; computed from model at init
    scene: ShadowHandSceneCfg = ShadowHandSceneCfg(num_envs=8192, env_spacing=0.75)
    dist_reward_scale: float = -10.0
    rot_reward_scale: float = 1.0
    rot_eps: float = 0.1
    action_penalty_scale: float = -0.0002
    reach_goal_bonus: float = 250.0
    fall_dist: float = 0.24
    fall_penalty: float = 0.0
    success_tolerance: float = 0.1
    act_moving_average: float = 1.0
    reset_position_noise: float = 0.01
    reset_dof_pos_noise: float = 0.2
    reset_dof_vel_noise: float = 0.0

    def __post_init__(self):
        self.sim.dt = 1.0 / 120.0
        # active-set compaction: the cube realistically touches palm + a
        # few phalanx pads at once — 12 of the 40 candidates cover it.
        # r5 A/B at 8192 envs: K=12 103.7k / K=16 97.9k / K=0 57.3k
        # env-steps/s (artifacts/r05/shadow_k12.jsonl, shadow_k0.log)
        self.sim.max_active_contacts = 12


@configclass
class ShadowHandOpenAIEnvCfg(ShadowHandEnvCfg):
    """Reference OpenAI-style variant (direct/shadow_hand openai cfgs):
    asymmetric actor-critic — the policy sees a reduced observation (poses,
    no velocities), the critic sees the full state."""

    asymmetric_obs: bool = True
    success_tolerance: float = 0.4
    act_moving_average: float = 0.3


class ShadowHandEnv(DirectRLEnv):
    """Reference ``InHandManipulationEnv`` recast as pure hooks."""

    cfg: ShadowHandEnvCfg

    def __init__(self, cfg: ShadowHandEnvCfg, **kwargs):
        super().__init__(cfg, **kwargs)
        self._robot = self.scene.articulations["robot"]
        self._object = self.scene.rigid_objects["object"]
        self.num_hand_dofs = self._robot.num_joints
        self.cfg.action_space = self.num_hand_dofs
        self.num_actions = self.num_hand_dofs
        # obs layout (see _get_observations): jp + jv + obj(13) + goal(4) +
        # quat_diff(4) + actions
        self._full_obs_dim = 3 * self.num_hand_dofs + 21
        self._asymmetric = getattr(self.cfg, "asymmetric_obs", False)
        if self._asymmetric:
            # reduced policy obs: jp_scaled + obj pos/quat + goal + quat_diff
            # + actions (no velocities — OpenAI observations)
            self.num_observations = 2 * self.num_hand_dofs + 15
            self.num_states = self._full_obs_dim
        else:
            self.num_observations = self._full_obs_dim
        import numpy as _np

        lo = _np.asarray(self._robot.model.dof_limit_lower, dtype=_np.float32)
        hi = _np.asarray(self._robot.model.dof_limit_upper, dtype=_np.float32)
        self._dof_lower, self._dof_upper = lo, hi
        self._in_hand_pos = _np.asarray(
            self.cfg.scene.object.init_state.pos, dtype=_np.float32
        )

    def _init_user_state(self) -> dict:
        E = self.num_envs
        return {
            "goal_rot": jnp.tile(jnp.array([1.0, 0, 0, 0]), (E, 1)),
            "cur_targets": jnp.zeros((E, self.num_hand_dofs)),
            "successes": jnp.zeros((E,)),
            "consecutive_successes": jnp.zeros(()),
        }

    # ------------------------------------------------------------------
    def _views(self, state):
        views, _ = self.scene.data_views(state.scene, self.physics_dt)
        return views["robot"], views["object"]

    def _pre_physics_step(self, state, actions):
        """Reference: actions scaled into joint limits with moving average."""
        user = dict(state.user)
        targets = math_utils.unscale_transform(
            jnp.clip(actions, -1.0, 1.0), self._dof_lower, self._dof_upper
        )
        ma = self.cfg.act_moving_average
        new_t = ma * targets + (1.0 - ma) * user["cur_targets"]
        new_t = jnp.clip(new_t, self._dof_lower, self._dof_upper)
        user["cur_targets"] = new_t
        est = state.scene.entities["robot"]
        est = self._robot.set_joint_position_target(est, new_t)
        ents = dict(state.scene.entities)
        ents["robot"] = est
        return state._replace(
            scene=state.scene._replace(entities=ents), actions=actions, user=user
        )

    def _get_observations(self, state):
        robot, obj = self._views(state)
        jp_scaled = math_utils.scale_transform(
            robot.joint_pos, self._dof_lower, self._dof_upper
        )
        goal = state.user["goal_rot"]
        quat_diff = math_utils.quat_mul(
            obj.root_quat_w, math_utils.quat_conjugate(goal)
        )
        full = jnp.concatenate(
            [
                jp_scaled,
                robot.joint_vel * 0.2,
                obj.root_pos_w,
                obj.root_quat_w,
                obj.root_lin_vel_w,
                obj.root_ang_vel_w * 0.2,
                goal,
                quat_diff,
                state.actions,
            ],
            axis=-1,
        )
        if self._asymmetric:
            reduced = jnp.concatenate(
                [
                    jp_scaled,
                    obj.root_pos_w,
                    obj.root_quat_w,
                    goal,
                    quat_diff,
                    state.actions,
                ],
                axis=-1,
            )
            return {"policy": reduced, "critic": full}
        return {"policy": full}

    def _rot_dist(self, state, obj):
        goal = state.user["goal_rot"]
        quat_diff = math_utils.quat_mul(
            obj.root_quat_w, math_utils.quat_conjugate(goal)
        )
        return 2.0 * jnp.arcsin(
            jnp.clip(jnp.linalg.norm(quat_diff[:, 1:4], axis=-1), None, 1.0)
        )

    def _get_rewards(self, state):
        """Reference compute_rewards (in-hand): rot reward + dist penalty +
        action penalty + goal bonus + fall penalty."""
        robot, obj = self._views(state)
        cfg = self.cfg
        goal_dist = jnp.linalg.norm(
            obj.root_pos_w - self._in_hand_pos[None], axis=-1
        )
        rot_dist = self._rot_dist(state, obj)
        rot_rew = 1.0 / (jnp.abs(rot_dist) + cfg.rot_eps) * cfg.rot_reward_scale
        action_pen = jnp.sum(jnp.square(state.actions), axis=-1)
        reward = (
            cfg.dist_reward_scale * goal_dist
            + rot_rew
            + cfg.action_penalty_scale * action_pen
        )
        reward = reward + jnp.where(
            jnp.abs(rot_dist) <= cfg.success_tolerance, cfg.reach_goal_bonus, 0.0
        )
        reward = reward + jnp.where(goal_dist >= cfg.fall_dist, cfg.fall_penalty, 0.0)
        return reward

    def _get_dones(self, state):
        robot, obj = self._views(state)
        goal_dist = jnp.linalg.norm(
            obj.root_pos_w - self._in_hand_pos[None], axis=-1
        )
        fell = goal_dist >= self.cfg.fall_dist
        time_out = state.episode_length >= self.max_episode_length - 1
        # goal reached -> resample goal in-place (no env reset, reference
        # semantics); handled in step via _maybe_new_goal
        return fell, time_out

    def step_state(self, state, action):
        # resample goals for envs that reached the target (before the base
        # step's reset logic would see them)
        state, out = super().step_state(state, action)
        obs, reward, died, time_out, extras = out
        _, obj = self._views(state)
        rot_dist = self._rot_dist(state, obj)
        reached = jnp.abs(rot_dist) <= self.cfg.success_tolerance
        key, sub = jax.random.split(state.key)
        user = dict(state.user)
        new_goal = math_utils.random_orientation(sub, self.num_envs)
        user["goal_rot"] = jnp.where(
            reached[:, None], new_goal, user["goal_rot"]
        )
        user["successes"] = user["successes"] + reached.astype(jnp.float32)
        state = state._replace(user=user, key=key)
        extras["successes"] = user["successes"]
        return state, (obs, reward, died, time_out, extras)

    def _reset_idx(self, state, mask):
        state = super()._reset_idx(state, mask)
        E = self.num_envs
        key, k1, k2, k3, k4 = jax.random.split(state.key, 5)
        # randomize object pose around the in-hand position
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
        # randomize hand dofs
        dof_noise = jax.random.uniform(
            k3, (E, self.num_hand_dofs), minval=-1.0, maxval=1.0
        )
        est = state.scene.entities["robot"]
        jp = jnp.clip(
            est.default_joint_pos + self.cfg.reset_dof_pos_noise * dof_noise,
            self._dof_lower, self._dof_upper,
        )
        q, qd = self._robot.write_joint_state_to_sim(
            q, qd, jp, jnp.zeros_like(jp), mask
        )
        est = self._robot.set_joint_position_target(est, jp)
        ents = dict(state.scene.entities)
        ents["robot"] = est
        user = dict(state.user)
        user["goal_rot"] = jnp.where(
            mask[:, None], math_utils.random_orientation(k4, E), user["goal_rot"]
        )
        user["successes"] = jnp.where(mask, 0.0, user["successes"])
        user["cur_targets"] = jnp.where(mask[:, None], jp, user["cur_targets"])
        return state._replace(
            scene=state.scene._replace(
                phys=state.scene.phys._replace(q=q, qd=qd), entities=ents
            ),
            user=user,
            key=key,
        )
