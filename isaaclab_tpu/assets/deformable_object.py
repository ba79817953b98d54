"""Deformable object asset (reference ``assets/deformable_object/``:
``DeformableObject`` over ``physx.SoftBodyView`` — nodal positions/velocities
and kinematic targets). Backed by the in-repo XPBD particle engine
(physics/soft_body.py)."""

from __future__ import annotations

from dataclasses import MISSING

import jax.numpy as jnp

from ..physics.soft_body import (
    SoftBodyModel,
    SoftBodyState,
    init_soft_state,
    step_soft_body,
)
from ..utils.configclass import configclass
from .asset_base import AssetBaseCfg


@configclass
class DeformableObjectCfg(AssetBaseCfg):
    """Reference ``DeformableObjectCfg``."""

    model: object = MISSING  # SoftBodyModel or () -> SoftBodyModel
    # entity names whose collision geoms the particles collide against
    # (one-way rigid->soft coupling; e.g. ["robot"] lets a gripper squeeze
    # and carry the soft body). Empty = terrain contact only.
    collide_with: list = []

    @configclass
    class InitStateCfg:
        pos: tuple = (0.0, 0.0, 0.0)

    init_state: InitStateCfg = InitStateCfg()


class DeformableObject:
    """Reference ``DeformableObject`` API: nodal state read/write, kinematic
    targets, mean-pose root view."""

    def __init__(self, cfg: DeformableObjectCfg):
        self.cfg = cfg
        model = cfg.model() if callable(cfg.model) else cfg.model
        self.model: SoftBodyModel = model
        self.num_particles = model.rest_pos.shape[0]

    # scene-entity contract -------------------------------------------------
    def init_entity_state(self, num_envs: int, env_origins,
                          nbody: int = 0) -> SoftBodyState:
        origin = jnp.asarray(self.cfg.init_state.pos)
        state = init_soft_state(self.model, num_envs, origin, nbody=nbody)
        return state._replace(pos=state.pos + env_origins[:, None, :])

    def step(self, est: SoftBodyState, dt: float, colliders=None,
             nbody: int = 0) -> SoftBodyState:
        return step_soft_body(self.model, est, dt, colliders=colliders,
                              nbody=nbody)

    def reset_to_default(self, est: SoftBodyState, num_envs, env_origins,
                         env_mask=None) -> SoftBodyState:
        nbody = est.reaction_wrench.shape[1] if (
            est.reaction_wrench is not None) else 0
        fresh = self.init_entity_state(num_envs, env_origins, nbody=nbody)
        if env_mask is None:
            return fresh
        m = env_mask[:, None, None]
        return SoftBodyState(
            pos=jnp.where(m, fresh.pos, est.pos),
            vel=jnp.where(m, fresh.vel, est.vel),
            kinematic_target=jnp.where(
                m, fresh.kinematic_target, est.kinematic_target
            ),
            reaction_wrench=jnp.where(
                m, fresh.reaction_wrench, est.reaction_wrench
            ) if est.reaction_wrench is not None else None,
        )

    # write API (reference deformable_object.py) ----------------------------
    def write_nodal_state_to_sim(self, est: SoftBodyState, nodal_state,
                                 env_mask=None) -> SoftBodyState:
        """nodal_state: (E, P, 6) [pos, vel]."""
        m = (
            jnp.ones(est.pos.shape[0], dtype=bool)
            if env_mask is None
            else env_mask
        )[:, None, None]
        return est._replace(
            pos=jnp.where(m, nodal_state[..., 0:3], est.pos),
            vel=jnp.where(m, nodal_state[..., 3:6], est.vel),
        )

    def write_nodal_pos_to_sim(self, est, pos, env_mask=None):
        m = (
            jnp.ones(est.pos.shape[0], dtype=bool)
            if env_mask is None
            else env_mask
        )[:, None, None]
        return est._replace(pos=jnp.where(m, pos, est.pos))

    def write_nodal_velocity_to_sim(self, est, vel, env_mask=None):
        m = (
            jnp.ones(est.pos.shape[0], dtype=bool)
            if env_mask is None
            else env_mask
        )[:, None, None]
        return est._replace(vel=jnp.where(m, vel, est.vel))

    def write_nodal_kinematic_target_to_sim(self, est, targets,
                                            env_mask=None):
        """targets: (E, P, 4) [xyz, enabled] (reference kinematic targets)."""
        m = (
            jnp.ones(est.pos.shape[0], dtype=bool)
            if env_mask is None
            else env_mask
        )[:, None, None]
        return est._replace(
            kinematic_target=jnp.where(m, targets, est.kinematic_target)
        )

    def data(self, est: SoftBodyState) -> "DeformableObjectData":
        return DeformableObjectData(est)


class DeformableObjectData:
    """Reference ``DeformableObjectData``: nodal buffers + mean-root views."""

    def __init__(self, est: SoftBodyState):
        self._est = est

    @property
    def nodal_pos_w(self):
        return self._est.pos

    @property
    def nodal_vel_w(self):
        return self._est.vel

    @property
    def nodal_state_w(self):
        return jnp.concatenate([self._est.pos, self._est.vel], axis=-1)

    @property
    def nodal_kinematic_target(self):
        return self._est.kinematic_target

    @property
    def root_pos_w(self):
        return jnp.mean(self._est.pos, axis=1)

    @property
    def root_vel_w(self):
        return jnp.mean(self._est.vel, axis=1)
