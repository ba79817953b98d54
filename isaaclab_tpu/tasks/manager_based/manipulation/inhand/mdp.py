"""In-hand reorientation MDP terms (reference
``manager_based/manipulation/inhand/mdp/``): the success-driven orientation
command, orientation-tracking rewards, consecutive-success termination, and
the within-limits joint reset event.

TPU notes: the reference command keeps metrics/counters on the term object
(orientation_command.py); here they live in the ``CommandTermState.extra``
tuple so the whole success-resample loop stays inside jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from isaaclab_tpu.envs.mdp import *  # noqa: F401,F403
from isaaclab_tpu.managers import SceneEntityCfg
from isaaclab_tpu.managers.command_manager import CommandTerm, CommandTermState
from isaaclab_tpu.managers.manager_term_cfg import CommandTermCfg
from isaaclab_tpu.utils import configclass
from isaaclab_tpu.utils import math as math_utils

_ROBOT = SceneEntityCfg("robot")
_OBJECT = SceneEntityCfg("object")


# ---------------------------------------------------------------------------
# Command: goal orientation, resampled on success
# (reference mdp/commands/orientation_command.py:InHandReOrientationCommand)
# ---------------------------------------------------------------------------


class InHandReOrientationCommand(CommandTerm):
    """Command = (pos(3), quat(4)); position is a fixed offset from the
    object's default pose, orientation is uniformly re-drawn whenever the
    object reaches the current goal (update_goal_on_success)."""

    @property
    def command_dim(self) -> int:
        return 7

    def init_state(self, num_envs: int) -> CommandTermState:
        cmd = jnp.zeros((num_envs, 7))
        cmd = cmd.at[:, 3].set(1.0)
        return CommandTermState(
            command=cmd,
            time_left=jnp.zeros((num_envs,)),
            extra=(jnp.zeros((num_envs,), dtype=jnp.int32),),  # consecutive successes
        )

    def _goal_pos(self, env):
        obj = env.scene[self.cfg.asset_name]
        default = obj.data.default_root_state[:, 0:3] - env.scene.env_origins
        return default + jnp.asarray(self.cfg.init_pos_offset)

    def sample(self, env, state, key, mask):
        E = state.command.shape[0]
        quat = math_utils.random_orientation(key, E)
        if self.cfg.make_quat_unique:
            quat = math_utils.quat_unique(quat)
        cmd = jnp.concatenate([self._goal_pos(env), quat], axis=-1)
        return state._replace(
            command=jnp.where(mask[:, None], cmd, state.command)
        )

    def compute(self, env, state, key, dt, reset_mask):
        obj = env.scene[self.cfg.asset_name]
        err = math_utils.quat_error_magnitude(
            obj.data.root_quat_w, state.command[:, 3:7]
        )
        success = err < self.cfg.orientation_success_threshold
        succ_count = state.extra[0]
        succ_count = jnp.where(reset_mask, 0, succ_count + success.astype(jnp.int32))
        state = state._replace(extra=(succ_count,))
        need = reset_mask
        if self.cfg.update_goal_on_success:
            need = need | success
        return self.sample(env, state, key, need)


@configclass
class InHandReOrientationCommandCfg(CommandTermCfg):
    """Reference ``InHandReOrientationCommandCfg`` (commands_cfg.py)."""

    class_type: type = InHandReOrientationCommand
    resampling_time_range: tuple = (1.0e9, 1.0e9)  # success-driven only
    asset_name: str = "object"
    init_pos_offset: tuple = (0.0, 0.0, 0.0)
    update_goal_on_success: bool = True
    orientation_success_threshold: float = 0.1
    make_quat_unique: bool = False
    marker_pos_offset: tuple = (0.0, 0.0, 0.0)


# ---------------------------------------------------------------------------
# Observations (reference inhand/mdp/observations.py)
# ---------------------------------------------------------------------------


def goal_quat_diff(
    env,
    asset_cfg: SceneEntityCfg = _OBJECT,
    command_name: str = "object_pose",
    make_quat_unique: bool = False,
):
    """Quaternion from the current object orientation to the goal."""
    goal = env.command_manager.get_command(command_name)[:, 3:7]
    quat = env.scene[asset_cfg.name].data.root_quat_w
    diff = math_utils.quat_mul(quat, math_utils.quat_conjugate(goal))
    return math_utils.quat_unique(diff) if make_quat_unique else diff


# ---------------------------------------------------------------------------
# Rewards (reference inhand/mdp/rewards.py)
# ---------------------------------------------------------------------------


def track_pos_l2(env, object_cfg: SceneEntityCfg = _OBJECT,
                 command_name: str = "object_pose"):
    goal = env.command_manager.get_command(command_name)[:, 0:3]
    pos = env.scene[object_cfg.name].data.root_pos_w - env.scene.env_origins
    return jnp.sum(jnp.square(pos - goal), axis=-1)


def track_orientation_inv_l2(env, object_cfg: SceneEntityCfg = _OBJECT,
                             rot_eps: float = 0.1,
                             command_name: str = "object_pose"):
    """1 / (|rot error| + eps) orientation-tracking shaping."""
    goal = env.command_manager.get_command(command_name)[:, 3:7]
    quat = env.scene[object_cfg.name].data.root_quat_w
    err = math_utils.quat_error_magnitude(quat, goal)
    return 1.0 / (err + rot_eps)


def success_bonus(env, object_cfg: SceneEntityCfg = _OBJECT,
                  command_name: str = "object_pose"):
    """1 when the goal orientation is reached this step."""
    term = env.command_manager.get_term(command_name)
    goal = env.command_manager.get_command(command_name)[:, 3:7]
    quat = env.scene[object_cfg.name].data.root_quat_w
    err = math_utils.quat_error_magnitude(quat, goal)
    return (err < term.cfg.orientation_success_threshold).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Terminations (reference inhand/mdp/terminations.py)
# ---------------------------------------------------------------------------


def max_consecutive_success(env, num_success: int,
                            command_name: str = "object_pose"):
    """Episode ends after N goals reached without a drop."""
    count = env.command_manager.get_term_state(command_name).extra[0]
    return count >= num_success


def object_away_from_robot(env, threshold: float,
                           asset_cfg: SceneEntityCfg = _ROBOT,
                           object_cfg: SceneEntityCfg = _OBJECT):
    robot = env.scene[asset_cfg.name].data
    obj = env.scene[object_cfg.name].data
    dist = jnp.linalg.norm(robot.root_pos_w - obj.root_pos_w, axis=-1)
    return dist > threshold


def object_away_from_goal(env, threshold: float,
                          command_name: str = "object_pose",
                          object_cfg: SceneEntityCfg = _OBJECT):
    goal = env.command_manager.get_command(command_name)[:, 0:3]
    pos = env.scene[object_cfg.name].data.root_pos_w - env.scene.env_origins
    return jnp.linalg.norm(pos - goal, axis=-1) > threshold


# ---------------------------------------------------------------------------
# Events (reference inhand/mdp/events.py:reset_joints_within_limits_range)
# ---------------------------------------------------------------------------


def reset_joints_within_limits_range(
    env,
    scene_state,
    key,
    mask,
    position_range: dict = None,
    velocity_range: dict = None,
    use_default_offset: bool = True,
    operation: str = "scale",
    asset_cfg: SceneEntityCfg = _ROBOT,
):
    """Joint positions drawn within a scaled sub-range of the joint limits
    centred on the default pose (reference events.py:
    reset_joints_within_limits_range; the regex-per-joint ranges collapse to
    one scale here — every inhand config uses a single '.*' entry)."""
    entity = env.scene[asset_cfg.name]
    est = scene_state.entities[asset_cfg.name]
    scale = float(next(iter((position_range or {".*": (0.2, 0.2)}).values()))[0])
    vscale = float(next(iter((velocity_range or {".*": (0.0, 0.0)}).values()))[0])
    sl = entity.slice
    lo = jnp.asarray(entity.world_model.dof_limit_lower[
        sl.dof_start : sl.dof_start + sl.dof_count
    ])
    hi = jnp.asarray(entity.world_model.dof_limit_upper[
        sl.dof_start : sl.dof_start + sl.dof_count
    ])
    k1, k2 = jax.random.split(key)
    default = est.default_joint_pos if use_default_offset else 0.5 * (lo + hi)
    u = jax.random.uniform(k1, est.default_joint_pos.shape, minval=-1.0, maxval=1.0)
    span = jnp.where(u >= 0, hi - default, default - lo)
    pos = jnp.clip(default + u * scale * span, lo, hi)
    vel = vscale * jax.random.uniform(
        k2, est.default_joint_vel.shape, minval=-1.0, maxval=1.0
    )
    q, qd = entity.write_joint_state_to_sim(
        scene_state.phys.q, scene_state.phys.qd, pos, vel, mask
    )
    m = mask[:, None]
    ents = dict(scene_state.entities)
    ents[asset_cfg.name] = est._replace(
        joint_pos_target=jnp.where(m, pos, est.joint_pos_target)
    )
    return scene_state._replace(
        phys=scene_state.phys._replace(q=q, qd=qd), entities=ents
    )
