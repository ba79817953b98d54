"""Event terms (reference ``envs/mdp/events.py:38-1327``).

Event contract: ``f(env, scene_state, key, mask, **params) -> scene_state`` —
pure masked state transforms (the reference's in-place randomizations recast
as ``where`` updates; SURVEY.md §2.8 TPU note).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...managers import SceneEntityCfg
from ...utils import math as math_utils

_DEFAULT = SceneEntityCfg("robot")


def _u(key, shape, rng: tuple):
    return jax.random.uniform(key, shape, minval=rng[0], maxval=rng[1])


def _entity(env, cfg):
    return env.scene[cfg.name]


def _op(current, new, operation):
    if operation == "add":
        return current + new
    if operation == "scale":
        return current * new
    if operation == "abs":
        return new
    raise ValueError(operation)


def _sample(key, shape, params: tuple, distribution: str = "uniform"):
    """Reference events.py:_randomize_prop_by_op distribution switch."""
    if distribution == "uniform":
        return jax.random.uniform(key, shape, minval=params[0], maxval=params[1])
    if distribution == "log_uniform":
        lo, hi = jnp.log(params[0]), jnp.log(params[1])
        return jnp.exp(jax.random.uniform(key, shape, minval=lo, maxval=hi))
    if distribution == "gaussian":
        return params[0] + params[1] * jax.random.normal(key, shape)
    raise ValueError(distribution)


# -----------------------------------------------------------------------------
# Reset-mode state resets (reference events.py:700-1000)
# -----------------------------------------------------------------------------


def reset_scene_to_default(env, scene_state, key, mask):
    """Reference events.py:reset_scene_to_default."""
    return env._env.scene.reset_state(scene_state, mask, key=key)


def reset_root_state_uniform(env, scene_state, key, mask,
                             pose_range: dict = None, velocity_range: dict = None,
                             asset_cfg: SceneEntityCfg = _DEFAULT):
    """Uniform-random root pose/velocity around the default state
    (reference events.py:reset_root_state_uniform)."""
    entity = _entity(env, asset_cfg)
    est = scene_state.entities[asset_cfg.name]
    E = env.num_envs
    pose_range = pose_range or {}
    velocity_range = velocity_range or {}
    keys = jax.random.split(key, 12)
    rng = lambda i, name: _u(keys[i], (E,), pose_range.get(name, (0.0, 0.0)))
    vrng = lambda i, name: _u(keys[i], (E,), velocity_range.get(name, (0.0, 0.0)))

    default = est.default_root_state
    pos = default[:, 0:3] + jnp.stack(
        [rng(0, "x"), rng(1, "y"), rng(2, "z")], axis=-1
    )
    d_rpy = jnp.stack([rng(3, "roll"), rng(4, "pitch"), rng(5, "yaw")], -1)
    dq = math_utils.quat_from_euler_xyz(d_rpy[:, 0], d_rpy[:, 1], d_rpy[:, 2])
    quat = math_utils.quat_mul(dq, default[:, 3:7])
    vel = default[:, 7:13] + jnp.stack(
        [vrng(6, "x"), vrng(7, "y"), vrng(8, "z"),
         vrng(9, "roll"), vrng(10, "pitch"), vrng(11, "yaw")], axis=-1,
    )
    q = entity.write_root_pose_to_sim(
        scene_state.phys.q, jnp.concatenate([pos, quat], -1), mask
    )
    qd = entity.write_root_velocity_to_sim(q, scene_state.phys.qd, vel, mask)
    return scene_state._replace(phys=scene_state.phys._replace(q=q, qd=qd))


def reset_root_state_from_terrain(env, scene_state, key, mask,
                                  pose_range: dict = None,
                                  velocity_range: dict = None,
                                  asset_cfg: SceneEntityCfg = _DEFAULT):
    """Spawn on the terrain surface under the env's cell
    (reference events.py:reset_root_state_from_terrain:920)."""
    entity = _entity(env, asset_cfg)
    est = scene_state.entities[asset_cfg.name]
    E = env.num_envs
    pose_range = pose_range or {}
    velocity_range = velocity_range or {}
    keys = jax.random.split(key, 10)
    default = est.default_root_state
    dx = _u(keys[0], (E,), pose_range.get("x", (0.0, 0.0)))
    dy = _u(keys[1], (E,), pose_range.get("y", (0.0, 0.0)))
    yaw = _u(keys[2], (E,), pose_range.get("yaw", (0.0, 0.0)))
    xy = default[:, 0:2] + jnp.stack([dx, dy], -1)
    terrain = env.scene.terrain
    if terrain is not None and terrain.height_field is not None:
        offs = (
            scene_state.terrain_offsets
            if getattr(scene_state, "terrain_offsets", None) is not None
            else env._env.scene.terrain_offsets()
        )
        h = jax.vmap(lambda p, o: terrain.sample_height(p, o))(xy, offs)
    else:
        h = jnp.zeros(E)
    z = h + default[:, 2]
    quat = math_utils.quat_from_euler_xyz(jnp.zeros(E), jnp.zeros(E), yaw)
    pose = jnp.concatenate([xy, z[:, None], quat], axis=-1)
    vel = default[:, 7:13]
    q = entity.write_root_pose_to_sim(scene_state.phys.q, pose, mask)
    qd = entity.write_root_velocity_to_sim(q, scene_state.phys.qd, vel, mask)
    return scene_state._replace(phys=scene_state.phys._replace(q=q, qd=qd))


def reset_joints_by_scale(env, scene_state, key, mask,
                          position_range: tuple = (1.0, 1.0),
                          velocity_range: tuple = (0.0, 0.0),
                          asset_cfg: SceneEntityCfg = _DEFAULT):
    """Default joint state scaled by uniform factors
    (reference events.py:reset_joints_by_scale)."""
    entity = _entity(env, asset_cfg)
    est = scene_state.entities[asset_cfg.name]
    k1, k2 = jax.random.split(key)
    shape = est.default_joint_pos.shape
    pos = est.default_joint_pos * _u(k1, shape, position_range)
    vel = est.default_joint_vel + _u(k2, shape, velocity_range)
    lim_lo = entity.world_model.dof_limit_lower[
        entity.slice.dof_start : entity.slice.dof_start + entity.slice.dof_count
    ]
    lim_hi = entity.world_model.dof_limit_upper[
        entity.slice.dof_start : entity.slice.dof_start + entity.slice.dof_count
    ]
    pos = jnp.clip(pos, jnp.asarray(lim_lo), jnp.asarray(lim_hi))
    q, qd = entity.write_joint_state_to_sim(
        scene_state.phys.q, scene_state.phys.qd, pos, vel, mask
    )
    # targets follow the reset positions for masked envs
    m = mask[:, None]
    est = est._replace(
        joint_pos_target=jnp.where(m, pos, est.joint_pos_target),
    )
    ents = dict(scene_state.entities)
    ents[asset_cfg.name] = est
    return scene_state._replace(
        phys=scene_state.phys._replace(q=q, qd=qd), entities=ents
    )


def reset_joints_by_offset(env, scene_state, key, mask,
                           position_range: tuple = (0.0, 0.0),
                           velocity_range: tuple = (0.0, 0.0),
                           asset_cfg: SceneEntityCfg = _DEFAULT):
    """Default joint state plus uniform offsets
    (reference events.py:reset_joints_by_offset)."""
    entity = _entity(env, asset_cfg)
    est = scene_state.entities[asset_cfg.name]
    k1, k2 = jax.random.split(key)
    shape = est.default_joint_pos.shape
    pos = est.default_joint_pos + _u(k1, shape, position_range)
    vel = est.default_joint_vel + _u(k2, shape, velocity_range)
    q, qd = entity.write_joint_state_to_sim(
        scene_state.phys.q, scene_state.phys.qd, pos, vel, mask
    )
    m = mask[:, None]
    est = est._replace(joint_pos_target=jnp.where(m, pos, est.joint_pos_target))
    ents = dict(scene_state.entities)
    ents[asset_cfg.name] = est
    return scene_state._replace(
        phys=scene_state.phys._replace(q=q, qd=qd), entities=ents
    )


# -----------------------------------------------------------------------------
# Physical-parameter randomization (reference events.py:38-700)
# -----------------------------------------------------------------------------


def randomize_rigid_body_mass(env, scene_state, key, mask,
                              mass_distribution_params: tuple = (1.0, 1.0),
                              operation: str = "scale",
                              asset_cfg: SceneEntityCfg = _DEFAULT,
                              recompute_inertia: bool = True):
    """Reference events.py:randomize_rigid_body_mass."""
    entity = _entity(env, asset_cfg)
    s = entity.slice
    ids = (
        jnp.arange(s.body_start, s.body_start + s.body_count)
        if isinstance(asset_cfg.body_ids, slice)
        else jnp.asarray(asset_cfg.body_ids) + s.body_start
    )
    params = scene_state.body_params
    E = env.num_envs
    sample = _u(key, (E, ids.shape[0]), mass_distribution_params)
    default = jnp.asarray(entity.world_model.mass)[ids]
    new_mass = _op(default[None], sample, operation)
    mass = params.mass.at[:, ids].set(
        jnp.where(mask[:, None], new_mass, params.mass[:, ids])
    )
    new_params = params._replace(mass=mass)
    if recompute_inertia:
        ratio = mass[:, ids] / jnp.maximum(default[None], 1e-9)
        inertia = params.inertia.at[:, ids].set(
            jnp.where(
                mask[:, None, None, None],
                jnp.asarray(entity.world_model.inertia)[ids][None]
                * ratio[..., None, None],
                params.inertia[:, ids],
            )
        )
        new_params = new_params._replace(inertia=inertia)
    return scene_state._replace(body_params=new_params)


def randomize_rigid_body_com(env, scene_state, key, mask,
                             com_range: dict = None,
                             asset_cfg: SceneEntityCfg = _DEFAULT):
    """Offset the centre of mass of selected bodies by a uniform sample from
    ``com_range`` ({"x": (lo, hi), ...}) (reference
    events.py:randomize_rigid_body_com)."""
    entity = _entity(env, asset_cfg)
    s = entity.slice
    ids = (
        jnp.arange(s.body_start, s.body_start + s.body_count)
        if isinstance(asset_cfg.body_ids, slice)
        else jnp.asarray(asset_cfg.body_ids) + s.body_start
    )
    params = scene_state.body_params
    E = env.num_envs
    com_range = com_range or {}
    ks = jax.random.split(key, 3)
    offs = []
    for i, ax in enumerate(("x", "y", "z")):
        rng = com_range.get(ax, (0.0, 0.0))
        offs.append(_u(ks[i], (E, ids.shape[0]), rng))
    offset = jnp.stack(offs, axis=-1)  # (E, n, 3)
    default = jnp.asarray(entity.world_model.com)[ids]  # (n, 3)
    new_com = default[None] + offset
    com = params.com.at[:, ids].set(
        jnp.where(mask[:, None, None], new_com, params.com[:, ids])
    )
    return scene_state._replace(body_params=params._replace(com=com))


def randomize_physics_scene_gravity(env, scene_state, key, mask,
                                    gravity_distribution_params: tuple = None,
                                    operation: str = "add",
                                    distribution: str = "uniform"):
    """Randomize world gravity (reference
    events.py:randomize_physics_scene_gravity). The reference mutates one
    global PhysX gravity; here gravity lives in the per-env ``BodyParams``,
    so randomization is per-env (strictly stronger) and masked like any
    other reset event."""
    params = scene_state.body_params
    E = env.num_envs
    lo, hi = gravity_distribution_params or ((0.0,) * 3, (0.0,) * 3)
    sample = jax.random.uniform(
        key, (E, 3), minval=jnp.asarray(lo), maxval=jnp.asarray(hi)
    ) if distribution == "uniform" else (
        jnp.asarray(lo)[None]
        + jnp.asarray(hi)[None] * jax.random.normal(key, (E, 3))
    )
    default = jnp.asarray(env._env.scene.sim_cfg.gravity)[None]
    new_g = _op(default, sample, operation)
    grav = jnp.where(mask[:, None], new_g, params.gravity)
    return scene_state._replace(body_params=params._replace(gravity=grav))


def randomize_rigid_body_material(env, scene_state, key, mask,
                                  static_friction_range: tuple = (1.0, 1.0),
                                  dynamic_friction_range: tuple = (1.0, 1.0),
                                  restitution_range: tuple = (0.0, 0.0),
                                  num_buckets: int = 64,
                                  asset_cfg: SceneEntityCfg = _DEFAULT):
    """Friction randomization (reference events.py:randomize_rigid_body_material).
    The engine has one friction scale per env; sample it from the static
    friction range (dominant term for locomotion)."""
    params = scene_state.body_params
    E = env.num_envs
    sample = _u(key, (E,), static_friction_range)
    fric = jnp.where(mask, sample, params.friction_scale)
    return scene_state._replace(body_params=params._replace(friction_scale=fric))


def randomize_actuator_gains(env, scene_state, key, mask,
                             stiffness_distribution_params: tuple = None,
                             damping_distribution_params: tuple = None,
                             operation: str = "scale",
                             distribution: str = "uniform",
                             asset_cfg: SceneEntityCfg = _DEFAULT):
    """Reference events.py:randomize_actuator_gains."""
    est = scene_state.entities[asset_cfg.name]
    entity = _entity(env, asset_cfg)
    ids = (
        jnp.arange(entity.num_joints)
        if isinstance(asset_cfg.joint_ids, slice)
        else jnp.asarray(asset_cfg.joint_ids)
    )
    k1, k2 = jax.random.split(key)
    E = env.num_envs
    new = {}
    if stiffness_distribution_params is not None:
        sample = _u(k1, (E, ids.shape[0]), stiffness_distribution_params)
        base = est.stiffness[:, ids]
        stiff = est.stiffness.at[:, ids].set(
            jnp.where(mask[:, None], _op(base, sample, operation), base)
        )
        new["stiffness"] = stiff
    if damping_distribution_params is not None:
        sample = _u(k2, (E, ids.shape[0]), damping_distribution_params)
        base = est.damping[:, ids]
        damp = est.damping.at[:, ids].set(
            jnp.where(mask[:, None], _op(base, sample, operation), base)
        )
        new["damping"] = damp
    ents = dict(scene_state.entities)
    ents[asset_cfg.name] = est._replace(**new)
    return scene_state._replace(entities=ents)


def randomize_joint_parameters(env, scene_state, key, mask,
                               friction_distribution_params: tuple = None,
                               armature_distribution_params: tuple = None,
                               lower_limit_distribution_params: tuple = None,
                               upper_limit_distribution_params: tuple = None,
                               operation: str = "scale",
                               asset_cfg: SceneEntityCfg = _DEFAULT):
    """Reference events.py:randomize_joint_parameters."""
    entity = _entity(env, asset_cfg)
    params = scene_state.body_params
    s = entity.slice
    ids = (
        jnp.arange(s.dof_start, s.dof_start + s.dof_count)
        if isinstance(asset_cfg.joint_ids, slice)
        else jnp.asarray(asset_cfg.joint_ids) + s.dof_start
    )
    E = env.num_envs
    keys = jax.random.split(key, 4)
    if armature_distribution_params is not None:
        sample = _u(keys[0], (E, ids.shape[0]), armature_distribution_params)
        base = jnp.asarray(entity.world_model.dof_armature)[ids][None]
        arm = params.armature.at[:, ids].set(
            jnp.where(mask[:, None], _op(base, sample, operation), params.armature[:, ids])
        )
        params = params._replace(armature=arm)
    if lower_limit_distribution_params is not None:
        sample = _u(keys[2], (E, ids.shape[0]), lower_limit_distribution_params)
        base = jnp.asarray(entity.world_model.dof_limit_lower)[ids][None]
        lo = params.limit_lower.at[:, ids].set(
            jnp.where(mask[:, None], _op(base, sample, operation),
                      params.limit_lower[:, ids])
        )
        params = params._replace(limit_lower=lo)
    if upper_limit_distribution_params is not None:
        sample = _u(keys[3], (E, ids.shape[0]), upper_limit_distribution_params)
        base = jnp.asarray(entity.world_model.dof_limit_upper)[ids][None]
        hi = params.limit_upper.at[:, ids].set(
            jnp.where(mask[:, None], _op(base, sample, operation),
                      params.limit_upper[:, ids])
        )
        params = params._replace(limit_upper=hi)
    return scene_state._replace(body_params=params)


def randomize_fixed_tendon_parameters(env, scene_state, key, mask,
                                      stiffness_distribution_params: tuple = None,
                                      damping_distribution_params: tuple = None,
                                      limit_stiffness_distribution_params: tuple = None,
                                      lower_limit_distribution_params: tuple = None,
                                      upper_limit_distribution_params: tuple = None,
                                      rest_length_distribution_params: tuple = None,
                                      offset_distribution_params: tuple = None,
                                      operation: str = "scale",
                                      distribution: str = "uniform",
                                      asset_cfg: SceneEntityCfg = _DEFAULT):
    """Reference events.py:629 randomize_fixed_tendon_parameters: per-env
    randomization of the engine's fixed-tendon properties (BodyParams
    tendon_* fields)."""
    entity = _entity(env, asset_cfg)
    params = scene_state.body_params
    s = entity.slice
    ids = (
        jnp.arange(s.tendon_start, s.tendon_start + s.tendon_count)
        if isinstance(asset_cfg.fixed_tendon_ids, slice)
        else jnp.asarray(asset_cfg.fixed_tendon_ids) + s.tendon_start
    )
    E = env.num_envs
    wm = entity.world_model
    specs = [
        ("tendon_stiffness", wm.tendon_stiffness, stiffness_distribution_params),
        ("tendon_damping", wm.tendon_damping, damping_distribution_params),
        ("tendon_limit_stiffness", wm.tendon_limit_stiffness,
         limit_stiffness_distribution_params),
        ("tendon_limit_lower", wm.tendon_limit_lower,
         lower_limit_distribution_params),
        ("tendon_limit_upper", wm.tendon_limit_upper,
         upper_limit_distribution_params),
        ("tendon_rest_length", wm.tendon_rest_length,
         rest_length_distribution_params),
        ("tendon_offset", wm.tendon_offset, offset_distribution_params),
    ]
    keys = jax.random.split(key, len(specs))
    for k, (field, default, dist_params) in zip(keys, specs):
        if dist_params is None:
            continue
        sample = _sample(k, (E, ids.shape[0]), dist_params, distribution)
        base = jnp.asarray(default)[ids][None]
        cur = getattr(params, field)
        new = cur.at[:, ids].set(
            jnp.where(mask[:, None], _op(base, sample, operation), cur[:, ids])
        )
        params = params._replace(**{field: new})
    return scene_state._replace(body_params=params)


# -----------------------------------------------------------------------------
# Interval-mode perturbations
# -----------------------------------------------------------------------------


def push_by_setting_velocity(env, scene_state, key, mask,
                             velocity_range: dict = None,
                             asset_cfg: SceneEntityCfg = _DEFAULT):
    """Overwrite root velocity with a random push
    (reference events.py:push_by_setting_velocity)."""
    entity = _entity(env, asset_cfg)
    velocity_range = velocity_range or {}
    E = env.num_envs
    keys = jax.random.split(key, 6)
    names = ["x", "y", "z", "roll", "pitch", "yaw"]
    dv = jnp.stack(
        [_u(keys[i], (E,), velocity_range.get(n, (0.0, 0.0))) for i, n in enumerate(names)],
        axis=-1,
    )
    s = entity.slice
    vs = s.v_start
    qd = scene_state.phys.qd
    cur_vel = jnp.concatenate(
        [qd[:, vs + 3 : vs + 6], qd[:, vs : vs + 3]], axis=-1
    )  # (lin, ang) world
    new_vel = cur_vel + dv
    qd = entity.write_root_velocity_to_sim(scene_state.phys.q, qd, new_vel, mask)
    return scene_state._replace(phys=scene_state.phys._replace(qd=qd))


def apply_external_force_torque(env, scene_state, key, mask,
                                force_range: tuple = (0.0, 0.0),
                                torque_range: tuple = (0.0, 0.0),
                                asset_cfg: SceneEntityCfg = _DEFAULT):
    """Set persistent external wrenches on bodies
    (reference events.py:apply_external_force_torque)."""
    entity = _entity(env, asset_cfg)
    s = entity.slice
    ids = (
        jnp.arange(s.body_start, s.body_start + s.body_count)
        if isinstance(asset_cfg.body_ids, slice)
        else jnp.asarray(asset_cfg.body_ids) + s.body_start
    )
    E = env.num_envs
    k1, k2 = jax.random.split(key)
    f = _u(k1, (E, ids.shape[0], 3), force_range)
    t = _u(k2, (E, ids.shape[0], 3), torque_range)
    wrench = jnp.concatenate([t, f], axis=-1)
    f_ext = scene_state.phys.f_ext_w.at[:, ids].set(
        jnp.where(mask[:, None, None], wrench, scene_state.phys.f_ext_w[:, ids])
    )
    return scene_state._replace(phys=scene_state.phys._replace(f_ext_w=f_ext))


def reset_nodal_state_uniform(env, scene_state, key, mask,
                              position_range: dict = None,
                              velocity_range: dict = None,
                              asset_cfg: SceneEntityCfg = None):
    """Deformable-body reset: default nodal state plus a uniform rigid offset
    (reference events.py:reset_nodal_state_uniform)."""
    name = asset_cfg.name if asset_cfg is not None else "object"
    soft = env._env.scene.deformable_objects[name]
    est = scene_state.entities[name]
    E = est.pos.shape[0]
    position_range = position_range or {}
    velocity_range = velocity_range or {}
    keys = jax.random.split(key, 6)
    off = jnp.stack(
        [_u(keys[i], (E,), position_range.get(n, (0.0, 0.0)))
         for i, n in enumerate(("x", "y", "z"))], axis=-1,
    )
    voff = jnp.stack(
        [_u(keys[3 + i], (E,), velocity_range.get(n, (0.0, 0.0)))
         for i, n in enumerate(("x", "y", "z"))], axis=-1,
    )
    fresh = soft.init_entity_state(E, env.scene.env_origins)
    pos = fresh.pos + off[:, None, :]
    vel = fresh.vel + voff[:, None, :]
    est = soft.write_nodal_state_to_sim(
        est, jnp.concatenate([pos, vel], axis=-1), mask
    )
    ents = dict(scene_state.entities)
    ents[name] = est
    return scene_state._replace(entities=ents)
