"""Stack-task MDP terms (reference
``manager_based/manipulation/stack/mdp/{observations,terminations,
franka_stack_events}.py``): cube-state observations, grasp/stack subtask
signals for mimic, and the stack-specific reset events.

TPU notes: the reference's per-env Python rejection sampling for
``randomize_object_pose`` (franka_stack_events.py:79-137) becomes a
vectorized candidate-draw + first-valid selection so the whole reset stays
inside jit; ``object_grasped``/``object_stacked`` are pure functions of the
scene state returned as float masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from isaaclab_tpu.envs.mdp import *  # noqa: F401,F403 — shared term library
from isaaclab_tpu.managers import SceneEntityCfg
from isaaclab_tpu.utils import math as math_utils

_ROBOT = SceneEntityCfg("robot")


# ---------------------------------------------------------------------------
# Observations (reference stack/mdp/observations.py)
# ---------------------------------------------------------------------------


def cube_positions_in_world_frame(
    env,
    cube_1_cfg: SceneEntityCfg = SceneEntityCfg("cube_1"),
    cube_2_cfg: SceneEntityCfg = SceneEntityCfg("cube_2"),
    cube_3_cfg: SceneEntityCfg = SceneEntityCfg("cube_3"),
):
    """Reference observations.py:cube_positions_in_world_frame."""
    return jnp.concatenate(
        [
            env.scene[c.name].data.root_pos_w
            for c in (cube_1_cfg, cube_2_cfg, cube_3_cfg)
        ],
        axis=1,
    )


def cube_orientations_in_world_frame(
    env,
    cube_1_cfg: SceneEntityCfg = SceneEntityCfg("cube_1"),
    cube_2_cfg: SceneEntityCfg = SceneEntityCfg("cube_2"),
    cube_3_cfg: SceneEntityCfg = SceneEntityCfg("cube_3"),
):
    """Reference observations.py:cube_orientations_in_world_frame."""
    return jnp.concatenate(
        [
            env.scene[c.name].data.root_quat_w
            for c in (cube_1_cfg, cube_2_cfg, cube_3_cfg)
        ],
        axis=1,
    )


def object_obs(
    env,
    cube_1_cfg: SceneEntityCfg = SceneEntityCfg("cube_1"),
    cube_2_cfg: SceneEntityCfg = SceneEntityCfg("cube_2"),
    cube_3_cfg: SceneEntityCfg = SceneEntityCfg("cube_3"),
    ee_frame_cfg: SceneEntityCfg = SceneEntityCfg("ee_frame"),
):
    """Cube poses (env-local), gripper->cube and cube->cube offsets
    (reference observations.py:object_obs)."""
    c1 = env.scene[cube_1_cfg.name].data
    c2 = env.scene[cube_2_cfg.name].data
    c3 = env.scene[cube_3_cfg.name].data
    ee_pos = env.scene[ee_frame_cfg.name].data.target_pos_w[:, 0, :]
    origins = env.scene.env_origins
    return jnp.concatenate(
        [
            c1.root_pos_w - origins,
            c1.root_quat_w,
            c2.root_pos_w - origins,
            c2.root_quat_w,
            c3.root_pos_w - origins,
            c3.root_quat_w,
            c1.root_pos_w - ee_pos,
            c2.root_pos_w - ee_pos,
            c3.root_pos_w - ee_pos,
            c1.root_pos_w - c2.root_pos_w,
            c2.root_pos_w - c3.root_pos_w,
            c1.root_pos_w - c3.root_pos_w,
        ],
        axis=1,
    )


def ee_frame_pos(env, ee_frame_cfg: SceneEntityCfg = SceneEntityCfg("ee_frame")):
    """End-effector position, env-local (reference observations.py:ee_frame_pos)."""
    ee = env.scene[ee_frame_cfg.name].data
    return ee.target_pos_w[:, 0, :] - env.scene.env_origins


def ee_frame_quat(env, ee_frame_cfg: SceneEntityCfg = SceneEntityCfg("ee_frame")):
    """Reference observations.py:ee_frame_quat."""
    return env.scene[ee_frame_cfg.name].data.target_quat_w[:, 0, :]


def gripper_pos(env, robot_cfg: SceneEntityCfg = _ROBOT):
    """Two signed finger joint positions (reference observations.py:gripper_pos)."""
    jp = env.scene[robot_cfg.name].data.joint_pos
    return jnp.stack([jp[:, -1], -jp[:, -2]], axis=-1)


def object_grasped(
    env,
    robot_cfg: SceneEntityCfg,
    ee_frame_cfg: SceneEntityCfg,
    object_cfg: SceneEntityCfg,
    diff_threshold: float = 0.06,
    gripper_open_val: float = 0.04,
    gripper_threshold: float = 0.005,
):
    """EE near the object AND both fingers off the open position
    (reference observations.py:object_grasped)."""
    jp = env.scene[robot_cfg.name].data.joint_pos
    obj_pos = env.scene[object_cfg.name].data.root_pos_w
    ee_pos = env.scene[ee_frame_cfg.name].data.target_pos_w[:, 0, :]
    near = jnp.linalg.norm(obj_pos - ee_pos, axis=1) < diff_threshold
    closed = (jnp.abs(jp[:, -1] - gripper_open_val) > gripper_threshold) & (
        jnp.abs(jp[:, -2] - gripper_open_val) > gripper_threshold
    )
    return (near & closed).astype(jnp.float32)[:, None]


def object_stacked(
    env,
    robot_cfg: SceneEntityCfg,
    upper_object_cfg: SceneEntityCfg,
    lower_object_cfg: SceneEntityCfg,
    xy_threshold: float = 0.05,
    height_threshold: float = 0.005,
    height_diff: float = 0.0468,
    gripper_open_val: float = 0.04,
):
    """Upper cube resting on lower cube with the gripper released
    (reference observations.py:object_stacked)."""
    jp = env.scene[robot_cfg.name].data.joint_pos
    diff = (
        env.scene[upper_object_cfg.name].data.root_pos_w
        - env.scene[lower_object_cfg.name].data.root_pos_w
    )
    xy_ok = jnp.linalg.norm(diff[:, :2], axis=1) < xy_threshold
    h_ok = (jnp.abs(diff[:, 2]) - height_diff) < height_threshold
    released = jnp.isclose(jp[:, -1], gripper_open_val, atol=1e-4, rtol=1e-4) & (
        jnp.isclose(jp[:, -2], gripper_open_val, atol=1e-4, rtol=1e-4)
    )
    return (xy_ok & h_ok & released).astype(jnp.float32)[:, None]


# ---------------------------------------------------------------------------
# Terminations (reference stack/mdp/terminations.py)
# ---------------------------------------------------------------------------


def cubes_stacked(
    env,
    robot_cfg: SceneEntityCfg = _ROBOT,
    cube_1_cfg: SceneEntityCfg = SceneEntityCfg("cube_1"),
    cube_2_cfg: SceneEntityCfg = SceneEntityCfg("cube_2"),
    cube_3_cfg: SceneEntityCfg = SceneEntityCfg("cube_3"),
    xy_threshold: float = 0.05,
    height_threshold: float = 0.005,
    height_diff: float = 0.0468,
    gripper_open_val: float = 0.04,
    atol: float = 0.0001,
    rtol: float = 0.0001,
):
    """Success: cube_2 on cube_1 and cube_3 on cube_2, gripper open
    (reference terminations.py:cubes_stacked)."""
    jp = env.scene[robot_cfg.name].data.joint_pos
    c1 = env.scene[cube_1_cfg.name].data.root_pos_w
    c2 = env.scene[cube_2_cfg.name].data.root_pos_w
    c3 = env.scene[cube_3_cfg.name].data.root_pos_w
    d12, d23 = c1 - c2, c2 - c3
    ok = (jnp.linalg.norm(d12[:, :2], axis=1) < xy_threshold) & (
        jnp.linalg.norm(d23[:, :2], axis=1) < xy_threshold
    )
    ok &= (jnp.abs(d12[:, 2]) - height_diff) < height_threshold
    ok &= (jnp.abs(d23[:, 2]) - height_diff) < height_threshold
    ok &= jnp.isclose(jp[:, -1], gripper_open_val, atol=atol, rtol=rtol)
    ok &= jnp.isclose(jp[:, -2], gripper_open_val, atol=atol, rtol=rtol)
    return ok


# ---------------------------------------------------------------------------
# Events (reference stack/mdp/franka_stack_events.py)
# ---------------------------------------------------------------------------


def set_default_joint_pose(
    env,
    scene_state,
    key,
    mask,
    default_pose,
    asset_cfg: SceneEntityCfg = _ROBOT,
):
    """Startup event: overwrite the articulation's default joint positions
    (reference franka_stack_events.py:set_default_joint_pose)."""
    est = scene_state.entities[asset_cfg.name]
    E = est.default_joint_pos.shape[0]
    pose = jnp.tile(jnp.asarray(default_pose, dtype=jnp.float32), (E, 1))
    ents = dict(scene_state.entities)
    ents[asset_cfg.name] = est._replace(default_joint_pos=pose)
    return scene_state._replace(entities=ents)


def randomize_joint_by_gaussian_offset(
    env,
    scene_state,
    key,
    mask,
    mean: float,
    std: float,
    asset_cfg: SceneEntityCfg = _ROBOT,
):
    """Default joint pose + clamped gaussian noise, fingers left exact
    (reference franka_stack_events.py:randomize_joint_by_gaussian_offset)."""
    entity = env.scene[asset_cfg.name]
    est = scene_state.entities[asset_cfg.name]
    pos = est.default_joint_pos + (
        mean + std * jax.random.normal(key, est.default_joint_pos.shape)
    )
    sl = entity.slice
    lo = jnp.asarray(entity.world_model.dof_limit_lower[sl.dof_start : sl.dof_start + sl.dof_count])
    hi = jnp.asarray(entity.world_model.dof_limit_upper[sl.dof_start : sl.dof_start + sl.dof_count])
    pos = jnp.clip(pos, lo, hi)
    # keep the gripper at its default opening (reference :52)
    pos = pos.at[:, -2:].set(est.default_joint_pos[:, -2:])
    vel = est.default_joint_vel
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


def randomize_object_pose(
    env,
    scene_state,
    key,
    mask,
    asset_cfgs: list,
    min_separation: float = 0.0,
    pose_range: dict = None,
    max_sample_tries: int = 8,
):
    """Uniform per-object poses with pairwise xy-separation. The reference
    rejection-samples per env in Python (franka_stack_events.py:79-137); here
    each object draws ``max_sample_tries`` candidates and the first candidate
    far enough from all previously placed objects is selected via a static
    argmax — no data-dependent control flow, whole event jits.
    """
    pose_range = pose_range or {}
    E = env.num_envs
    K = max_sample_tries
    names = ["x", "y", "z", "roll", "pitch", "yaw"]
    chosen = []  # list of (E, 3) positions already placed
    for i, asset_cfg in enumerate(asset_cfgs):
        key, k = jax.random.split(key)
        ks = jax.random.split(k, 6)
        samp = {
            n: jax.random.uniform(
                ks[j], (E, K),
                minval=pose_range.get(n, (0.0, 0.0))[0],
                maxval=pose_range.get(n, (0.0, 0.0))[1],
            )
            for j, n in enumerate(names)
        }
        cand_xyz = jnp.stack([samp["x"], samp["y"], samp["z"]], axis=-1)  # (E,K,3)
        if chosen and min_separation > 0.0:
            prev = jnp.stack(chosen, axis=1)  # (E, P, 3)
            dist = jnp.linalg.norm(
                cand_xyz[:, :, None, :] - prev[:, None, :, :], axis=-1
            )  # (E, K, P)
            valid = jnp.all(dist > min_separation, axis=-1)  # (E, K)
            # first valid candidate; falls back to candidate 0 when none valid
            # (mirrors the reference's accept-on-last-try behavior)
            idx = jnp.argmax(valid, axis=-1)
        else:
            idx = jnp.zeros((E,), dtype=jnp.int32)
        take = lambda a: jnp.take_along_axis(a, idx[:, None], axis=1)[:, 0]
        pos_local = jnp.stack([take(samp["x"]), take(samp["y"]), take(samp["z"])], -1)
        chosen.append(pos_local)
        quat = math_utils.quat_from_euler_xyz(
            take(samp["roll"]), take(samp["pitch"]), take(samp["yaw"])
        )
        pos = pos_local + env.scene.env_origins
        entity = env.scene[asset_cfg.name]
        q = entity.write_root_pose_to_sim(
            scene_state.phys.q, jnp.concatenate([pos, quat], -1), mask
        )
        qd = entity.write_root_velocity_to_sim(
            q, scene_state.phys.qd, jnp.zeros((E, 6)), mask
        )
        scene_state = scene_state._replace(
            phys=scene_state.phys._replace(q=q, qd=qd)
        )
    return scene_state


# ---------------------------------------------------------------------------
# Instance-randomization variants (reference stack/mdp observations +
# franka_stack_events.py:randomize_rigid_objects_in_focus). Each cube slot is
# a RigidObjectCollection of visual/physical variants; one variant per env is
# "in focus", the rest are parked out of the workspace. The focus index lives
# in the collection's entity state (jit-carried), not on the env object.
# ---------------------------------------------------------------------------


def _focus_pose(env, cfg):
    data = env.scene[cfg.name].data
    idx = data.in_focus  # (E,)
    take = lambda a: jnp.take_along_axis(
        a, idx[:, None, None], axis=1
    )[:, 0]
    return take(data.object_pos_w), take(data.object_quat_w)


def instance_randomize_cube_positions_in_world_frame(
    env,
    cube_1_cfg: SceneEntityCfg = SceneEntityCfg("cube_1"),
    cube_2_cfg: SceneEntityCfg = SceneEntityCfg("cube_2"),
    cube_3_cfg: SceneEntityCfg = SceneEntityCfg("cube_3"),
):
    return jnp.concatenate(
        [_focus_pose(env, c)[0] for c in (cube_1_cfg, cube_2_cfg, cube_3_cfg)],
        axis=1,
    )


def instance_randomize_cube_orientations_in_world_frame(
    env,
    cube_1_cfg: SceneEntityCfg = SceneEntityCfg("cube_1"),
    cube_2_cfg: SceneEntityCfg = SceneEntityCfg("cube_2"),
    cube_3_cfg: SceneEntityCfg = SceneEntityCfg("cube_3"),
):
    return jnp.concatenate(
        [_focus_pose(env, c)[1] for c in (cube_1_cfg, cube_2_cfg, cube_3_cfg)],
        axis=1,
    )


def instance_randomize_object_obs(
    env,
    cube_1_cfg: SceneEntityCfg = SceneEntityCfg("cube_1"),
    cube_2_cfg: SceneEntityCfg = SceneEntityCfg("cube_2"),
    cube_3_cfg: SceneEntityCfg = SceneEntityCfg("cube_3"),
    ee_frame_cfg: SceneEntityCfg = SceneEntityCfg("ee_frame"),
):
    (p1, q1), (p2, q2), (p3, q3) = (
        _focus_pose(env, c) for c in (cube_1_cfg, cube_2_cfg, cube_3_cfg)
    )
    ee_pos = env.scene[ee_frame_cfg.name].data.target_pos_w[:, 0, :]
    origins = env.scene.env_origins
    return jnp.concatenate(
        [
            p1 - origins, q1, p2 - origins, q2, p3 - origins, q3,
            p1 - ee_pos, p2 - ee_pos, p3 - ee_pos,
            p1 - p2, p2 - p3, p1 - p3,
        ],
        axis=1,
    )


def randomize_rigid_objects_in_focus(
    env,
    scene_state,
    key,
    mask,
    asset_cfgs: list,
    out_focus_state,
    min_separation: float = 0.0,
    pose_range: dict = None,
    max_sample_tries: int = 8,
):
    """Per slot: pick a random variant as in-focus, give it a pose sampled
    with pairwise separation; park the others. Parking deviates from the
    reference (which piles every out-of-focus object at one point and lets
    PhysX depenetrate): each variant gets a distinct parking offset so
    parked bodies never interpenetrate."""
    pose_range = pose_range or {}
    E = env.num_envs
    K = max_sample_tries
    out13 = jnp.asarray(out_focus_state, dtype=jnp.float32)
    names = ["x", "y", "z", "roll", "pitch", "yaw"]
    chosen = []
    ents = dict(scene_state.entities)
    for slot, asset_cfg in enumerate(asset_cfgs):
        entity = env.scene[asset_cfg.name]
        est = scene_state.entities[asset_cfg.name]
        N = entity.num_objects
        key, kf, k = jax.random.split(key, 3)
        focus = jax.random.randint(kf, (E,), 0, N)
        ks = jax.random.split(k, 6)
        samp = {
            n: jax.random.uniform(
                ks[j], (E, K),
                minval=pose_range.get(n, (0.0, 0.0))[0],
                maxval=pose_range.get(n, (0.0, 0.0))[1],
            )
            for j, n in enumerate(names)
        }
        cand_xyz = jnp.stack([samp["x"], samp["y"], samp["z"]], axis=-1)
        if chosen and min_separation > 0.0:
            prev = jnp.stack(chosen, axis=1)
            dist = jnp.linalg.norm(
                cand_xyz[:, :, None, :] - prev[:, None, :, :], axis=-1
            )
            idx = jnp.argmax(jnp.all(dist > min_separation, axis=-1), axis=-1)
        else:
            idx = jnp.zeros((E,), dtype=jnp.int32)
        take = lambda a: jnp.take_along_axis(a, idx[:, None], axis=1)[:, 0]
        pos_local = jnp.stack([take(samp["x"]), take(samp["y"]), take(samp["z"])], -1)
        chosen.append(pos_local)
        quat = math_utils.quat_from_euler_xyz(
            take(samp["roll"]), take(samp["pitch"]), take(samp["yaw"])
        )
        focus_pose = jnp.concatenate(
            [pos_local + env.scene.env_origins, quat], axis=-1
        )  # (E, 7)
        # parked poses: distinct offsets per (slot, variant)
        park = jnp.tile(out13[None, None, 0:7], (E, N, 1))
        park_off = jnp.stack(
            [
                jnp.full((N,), slot * 2.0),
                jnp.arange(N, dtype=jnp.float32) * 2.0,
                jnp.zeros((N,)),
            ],
            axis=-1,
        )
        park = park.at[:, :, 0:3].add(park_off[None])
        onehot = jax.nn.one_hot(focus, N, dtype=bool)  # (E, N)
        poses = jnp.where(onehot[..., None], focus_pose[:, None, :], park)
        q = entity.write_object_pose_to_sim(scene_state.phys.q, poses, mask)
        qd = entity.write_object_velocity_to_sim(
            q, scene_state.phys.qd, jnp.zeros((E, N, 6)), mask
        )
        ents[asset_cfg.name] = est._replace(
            in_focus=jnp.where(mask, focus, est.in_focus)
        )
        scene_state = scene_state._replace(
            phys=scene_state.phys._replace(q=q, qd=qd), entities=ents
        )
    return scene_state
