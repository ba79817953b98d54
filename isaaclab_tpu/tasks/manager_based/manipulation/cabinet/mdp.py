"""Cabinet-task term functions (reference
``manipulation/cabinet/mdp/rewards.py`` + ``observations.py``): approach/
align/grasp the drawer handle, open-drawer bonuses."""

import jax.numpy as jnp

from isaaclab_tpu.envs.mdp import *  # noqa: F401,F403 — re-export the library
from isaaclab_tpu.managers import SceneEntityCfg
from isaaclab_tpu.utils import math as math_utils

_EE = SceneEntityCfg("robot", body_names=["panda_hand"])
_HANDLE = SceneEntityCfg("cabinet", body_names=["drawer"])


def _ee_pos(env):
    robot = env.scene["robot"].data
    ids, _ = env.scene["robot"].find_bodies("panda_hand")
    return robot.body_pos_w[:, ids[0]]


def _handle_pos(env):
    cab = env.scene["cabinet"].data
    ids, _ = env.scene["cabinet"].find_bodies("drawer")
    # handle sits at the drawer front face
    quat = cab.body_quat_w[:, ids[0]]
    pos = cab.body_pos_w[:, ids[0]]
    offset = jnp.asarray([0.305, 0.0, 0.01])
    return pos + math_utils.quat_apply(quat, jnp.broadcast_to(offset, pos.shape))


def rel_ee_drawer_distance(env):
    """Handle position relative to the ee (observation)."""
    return _handle_pos(env) - _ee_pos(env)


def cabinet_joint_pos(env, joint_name: str = "drawer_joint"):
    cab = env.scene["cabinet"].data
    ids, _ = env.scene["cabinet"].find_joints(joint_name)
    return cab.joint_pos[:, ids]


def cabinet_joint_vel(env, joint_name: str = "drawer_joint"):
    cab = env.scene["cabinet"].data
    ids, _ = env.scene["cabinet"].find_joints(joint_name)
    return cab.joint_vel[:, ids]


def approach_ee_handle(env, threshold: float = 0.2):
    """Inverse-square approach reward, doubled inside ``threshold``
    (reference cabinet/mdp/rewards.py approach_ee_handle)."""
    dist = jnp.linalg.norm(_handle_pos(env) - _ee_pos(env), axis=-1)
    r = 1.0 / (1.0 + dist**2)
    r = r * r
    return jnp.where(dist <= threshold, 2.0 * r, r)


def align_ee_handle(env):
    """Dot-product alignment of the ee z-axis with the drawer outward axis."""
    robot = env.scene["robot"].data
    ids, _ = env.scene["robot"].find_bodies("panda_hand")
    ee_quat = robot.body_quat_w[:, ids[0]]
    ee_z = math_utils.quat_apply(
        ee_quat, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), ee_quat[..., :3].shape)
    )
    # drawer opens along world -x (cabinet faces the robot at +x offset)
    out_axis = jnp.asarray([-1.0, 0.0, 0.0])
    align = jnp.sum(ee_z * out_axis, axis=-1)
    return jnp.square(jnp.clip(align, 0.0, None))


def open_drawer_bonus(env, joint_name: str = "drawer_joint"):
    """Drawer opening displacement (reference open_drawer_bonus)."""
    return cabinet_joint_pos(env, joint_name)[:, 0]


def multi_stage_open_drawer(env, joint_name: str = "drawer_joint"):
    """Staged bonus at 10/20/30cm opening (reference multi_stage rewards)."""
    q = cabinet_joint_pos(env, joint_name)[:, 0]
    return (
        0.5 * (q > 0.10).astype(jnp.float32)
        + 0.5 * (q > 0.20).astype(jnp.float32)
        + 1.0 * (q > 0.30).astype(jnp.float32)
    )
