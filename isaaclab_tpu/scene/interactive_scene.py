"""Interactive scene: entity registry + batched world assembly.

TPU-native counterpart of the reference ``InteractiveScene``
(``scene/interactive_scene.py:34``). Where the reference spawns a template env
and clones it N times via ``GridCloner`` (interactive_scene.py:126-164), here
cloning *is the batch axis*: entity models merge into one world forest
(:func:`~isaaclab_tpu.physics.model.merge_models`) and every state array gains
a leading ``(num_envs,)`` dimension under ``vmap``.

Env separation: every env's world is independent (separate vmapped instance),
so all envs sit at the world origin — no grid spacing needed for physics.
Terrain-based tasks place each env on its terrain cell via a per-env *terrain
offset* applied inside height-field queries instead of moving the robot
(float32-friendly: coordinates stay small). ``env_origins`` therefore returns
the terrain-relative spawn origins (zeros for flat ground), matching how tasks
consume it.
"""

from __future__ import annotations

from dataclasses import MISSING
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..assets import (
    Articulation,
    ArticulationCfg,
    AssetBaseCfg,
    RigidObject,
    RigidObjectCfg,
)
from ..physics import engine as eng
from ..physics.collision import CollisionPlan
from ..physics.kinematics import forward_kinematics
from ..physics.model import merge_models
from ..sim.simulation_cfg import SimulationCfg
from ..utils.configclass import configclass, is_configclass


@configclass
class InteractiveSceneCfg:
    """Reference ``InteractiveSceneCfg`` (scene/interactive_scene_cfg.py).

    Entity cfgs are *attributes* of subclasses, exactly like the reference:

        @configclass
        class MySceneCfg(InteractiveSceneCfg):
            robot = ArticulationCfg(...)
            height_scanner = RayCasterCfg(...)
    """

    num_envs: int = MISSING
    env_spacing: float = 2.0
    replicate_physics: bool = True  # parity only; batching always replicates
    filter_collisions: bool = True  # parity only; envs never interact
    lazy_sensor_update: bool = True
    # inter-entity collision-pair EXCLUSIONS (replaces PhysX collision
    # filtering/groups the reference sets via USD, e.g. held-asset vs robot
    # arm in factory): entries are (entity_a, geom_regex_a, entity_b,
    # geom_regex_b); a candidate pair matching an entry in either order is
    # dropped from the collision plan.
    collision_filters: list = []


class SceneState(NamedTuple):
    """All per-env dynamic state of the scene (one pytree)."""

    phys: eng.PhysicsState  # batched world physics state
    body_params: eng.BodyParams  # batched randomizable physical params
    entities: dict  # name -> entity state pytree (articulations, objects)
    sensors: dict  # name -> sensor state pytree
    # (E, 3) per-env terrain-cell offsets — DYNAMIC state so the terrain
    # curriculum can move envs between difficulty rows (reference
    # terrain_importer env-origin updates); None = static importer offsets
    terrain_offsets: object = None


class InteractiveScene:
    """Host-side scene: builds the merged world, owns entity facades."""

    def __init__(self, cfg: InteractiveSceneCfg, sim_cfg: SimulationCfg | None = None):
        self.cfg = cfg
        self.sim_cfg = sim_cfg or SimulationCfg()
        self.num_envs = int(cfg.num_envs)
        self.articulations: dict[str, Articulation] = {}
        self.rigid_objects: dict[str, RigidObject] = {}
        self.rigid_object_collections: dict = {}
        self.deformable_objects: dict = {}
        self.sensors: dict = {}
        self.extras: dict = {}
        self.terrain = None  # TerrainImporter, set if cfg has one

        # --- collect entity cfgs from subclass attributes (reference
        # InteractiveScene parses cfg attrs the same way) ---
        from ..sensors.sensor_base import SensorBaseCfg
        from ..terrains.terrain_importer import TerrainImporter, TerrainImporterCfg

        entity_cfgs = {}
        sensor_cfgs = {}
        terrain_cfg = None
        import dataclasses as _dc

        from ..assets.deformable_object import (
            DeformableObject,
            DeformableObjectCfg,
        )
        from ..assets.rigid_object_collection import (
            RigidObjectCollection,
            RigidObjectCollectionCfg,
        )

        # declared fields + attributes added dynamically in __post_init__
        # (the reference supports `self.scene.wrist_cam = CameraCfg(...)`;
        # configclass instances keep those only in __dict__)
        seen = {f.name: getattr(cfg, f.name) for f in _dc.fields(cfg)}
        for name, value in vars(cfg).items():
            seen.setdefault(name, value)
        for name, value in seen.items():
            if isinstance(value, DeformableObjectCfg):
                # deformables live in the XPBD particle engine, not the rigid
                # world forest
                self.deformable_objects[name] = DeformableObject(value)
            elif isinstance(
                value, (ArticulationCfg, RigidObjectCfg, RigidObjectCollectionCfg)
            ):
                entity_cfgs[name] = value
            elif isinstance(value, SensorBaseCfg):
                sensor_cfgs[name] = value
            elif isinstance(value, TerrainImporterCfg):
                terrain_cfg = (name, value)

        # --- terrain first (env origins may come from it) ---
        if terrain_cfg is not None:
            self.terrain = TerrainImporter(terrain_cfg[1], self.num_envs)

        # --- build entity models ---
        from ..sim.spawners import MultiAssetCfg, build_union_model, choose_variants

        models, names, facades = [], [], []
        self._multi_asset: dict = {}  # entity name -> (geom_variant_of, choices, variants)
        for name, ecfg in entity_cfgs.items():
            if (not isinstance(ecfg, RigidObjectCollectionCfg)
                    and isinstance(ecfg.model, MultiAssetCfg)):
                # multi-asset random spawn: union model + static per-env
                # variant choice (sim/spawners.py)
                model, _geom_variant, variants = build_union_model(ecfg.model)
                choices = choose_variants(ecfg.model, self.num_envs)
                self._multi_asset[name] = (choices, variants)
            else:
                model = (
                    _resolve_model(ecfg.model)
                    if not isinstance(ecfg, RigidObjectCollectionCfg)
                    else None
                )
            if isinstance(ecfg, ArticulationCfg) and not model.floating_base:
                # fixed-base world placement: bake cfg.init_state pose into
                # the root joint frame (floating bases get it via q instead)
                _apply_fixed_base_pose(model, ecfg.init_state)
            if isinstance(ecfg, ArticulationCfg):
                facade = Articulation(ecfg, model)
                self.articulations[name] = facade
            elif isinstance(ecfg, RigidObjectCollectionCfg):
                facade = model  # RigidObjectCollection built below
                facade = RigidObjectCollection.build(ecfg)
                model = facade.model
                self.rigid_object_collections[name] = facade
            else:
                facade = RigidObject(ecfg, model)
                self.rigid_objects[name] = facade
            models.append(model)
            names.append(name)
            facades.append(facade)

        self.world_model, self.slices = merge_models(models, names)
        for facade, name in zip(facades, names):
            facade.bind(self.world_model, self.slices[name])

        # --- collision plan: ground contacts + inter-entity pairs ---
        # (replaces PhysX broadphase: the candidate pair list is static —
        # all geom pairs between DIFFERENT entities; self-collision off,
        # matching the reference default. Box-box pairs use the 16-candidate
        # corner narrowphase in physics/collision.py.)
        import re as _re

        filters = [
            (ea, _re.compile(ra), eb, _re.compile(rb))
            for ea, ra, eb, rb in getattr(cfg, "collision_filters", [])
        ]

        def _filtered(ni, ga, nj, gb):
            for ea, ra, eb, rb in filters:
                if (
                    ea == ni and ra.search(ga.name or "")
                    and eb == nj and rb.search(gb.name or "")
                ) or (
                    ea == nj and ra.search(gb.name or "")
                    and eb == ni and rb.search(ga.name or "")
                ):
                    return True
            return False

        pairs = []
        for i, ni in enumerate(names):
            for nj in names[i + 1 :]:
                si, sj = self.slices[ni], self.slices[nj]
                geoms_i = self.world_model.geoms[
                    si.geom_start : si.geom_start + si.geom_count
                ]
                geoms_j = self.world_model.geoms[
                    sj.geom_start : sj.geom_start + sj.geom_count
                ]
                for ga in geoms_i:
                    for gb in geoms_j:
                        if not _filtered(ni, ga, nj, gb):
                            pairs.append((ga, gb))
        # flat-plane scenes (terrain None -> plane at z=0) can statically
        # prune ground candidates for fixed-base subtrees that can never
        # reach the ground (collision.py geom_min_z_bound); terrain scenes
        # keep everything (heights vary per cell)
        self.collision_plan = CollisionPlan(
            self.world_model,
            pairs=pairs,
            with_ground=self.terrain is not None or _any_ground_geoms(models),
            ground_z_max=0.0 if self.terrain is None else None,
            # overhang terrains (floating-ring slab layer) add underside/top
            # contact rows for every ground probe
            with_overhang=(
                self.terrain is not None
                and self.terrain.height_field is not None
                and self.terrain.height_field.slab is not None
            ),
        )
        from ..physics.solver import num_limit_rows

        self.n_lim_rows = num_limit_rows(self.world_model)

        # multi-asset per-env candidate activation (spawn-time static)
        self._cand_env_mask = None
        if self._multi_asset:
            from ..sim.spawners import candidate_mask

            slc = [
                ((self.slices[n].body_start, self.slices[n].body_count), ch)
                for n, (ch, _v) in self._multi_asset.items()
            ]
            self._cand_env_mask = candidate_mask(self.collision_plan, slc)

        # --- sensors ---
        for name, scfg in sensor_cfgs.items():
            self.sensors[name] = scfg.class_type(scfg, self)

        self._entity_names = names

    # ------------------------------------------------------------------
    @property
    def env_origins(self):
        """(E, 3) spawn origins. Terrain-relative (zeros on flat ground)."""
        if self.terrain is not None:
            return self.terrain.env_origins
        import numpy as np

        return np.zeros((self.num_envs, 3), dtype=np.float32)

    def terrain_offsets(self):
        """(E, 3) per-env terrain cell offsets for height-field queries."""
        if self.terrain is not None:
            return self.terrain.env_offsets
        import numpy as np

        return np.zeros((self.num_envs, 3), dtype=np.float32)

    @property
    def height_field(self):
        return self.terrain.height_field if self.terrain is not None else None

    def __getitem__(self, key: str):
        """Reference dict-style access (interactive_scene.py:589)."""
        for registry in (
            self.articulations, self.rigid_objects,
            self.rigid_object_collections, self.deformable_objects,
            self.sensors, self.extras,
        ):
            if key in registry:
                return registry[key]
        raise KeyError(
            f"Scene entity '{key}' not found. Available: {self.keys()}"
        )

    def keys(self):
        return (
            list(self.articulations) + list(self.rigid_objects)
            + list(self.rigid_object_collections)
            + list(self.deformable_objects) + list(self.sensors)
        )

    # ------------------------------------------------------------------
    # State lifecycle
    # ------------------------------------------------------------------
    def init_state(self) -> SceneState:
        E = self.num_envs
        wm = self.world_model
        ncon = self.collision_plan.ncon
        single = eng.PhysicsState.create(wm, ncon, self.n_lim_rows)
        phys = jax.tree.map(lambda x: jnp.tile(x, (E,) + (1,) * x.ndim), single)
        params = eng.BodyParams.from_model(
            wm, gravity=tuple(self.sim_cfg.gravity)
        )
        params = jax.tree.map(lambda x: jnp.tile(x, (E,) + (1,) * x.ndim), params)
        # multi-asset spawn: per-env candidate activation + chosen-variant
        # body params (sim/spawners.py)
        if self._cand_env_mask is not None:
            params = params._replace(
                cand_active=jnp.asarray(self._cand_env_mask)
            )
        for name, (choices, variants) in self._multi_asset.items():
            from ..sim.spawners import variant_body_params

            b0 = self.slices[name].body_start
            mass_v, inertia_v, com_v = variant_body_params(variants, choices)
            params = params._replace(
                mass=params.mass.at[:, b0].set(jnp.asarray(mass_v)),
                inertia=params.inertia.at[:, b0].set(jnp.asarray(inertia_v)),
                com=params.com.at[:, b0].set(jnp.asarray(com_v)),
            )

        entities = {}
        origins = self.env_origins
        for name in self._entity_names:
            facade = (
                self.articulations.get(name)
                or self.rigid_objects.get(name)
                or self.rigid_object_collections.get(name)
            )
            est = facade.init_entity_state(E, origins)
            entities[name] = est

        for name, soft in self.deformable_objects.items():
            # colliding soft bodies carry an (E, nbody, 6) reaction-wrench
            # buffer for two-way coupling (constant pytree shape for scan)
            nb = wm.nbody if getattr(soft.cfg, "collide_with", None) else 0
            entities[name] = soft.init_entity_state(E, origins, nbody=nb)

        state = SceneState(
            phys=phys, body_params=params, entities=entities, sensors={},
            terrain_offsets=jnp.asarray(
                self.terrain_offsets(), dtype=jnp.float32
            ),
        )
        # write default root/joint states into q/qd
        state = self.reset_state(state, env_mask=None)
        # sensors may need a valid q to initialize
        sensors = {
            name: s.init_state(E) for name, s in self.sensors.items()
        }
        return state._replace(sensors=sensors)

    def reset_state(self, state: SceneState, env_mask, key=None) -> SceneState:
        """Reset masked envs to entity default states (reference
        ``InteractiveScene.reset`` + per-asset reset, interactive_scene.py:370).
        ``key`` (optional) feeds per-sensor reset randomness (raycaster drift)."""
        q, qd = state.phys.q, state.phys.qd
        for name in self._entity_names:
            est = state.entities[name]
            art = self.articulations.get(name)
            if art is not None:
                drs = est.default_root_state
                q = art.write_root_pose_to_sim(q, drs[:, 0:7], env_mask)
                qd = art.write_root_velocity_to_sim(q, qd, drs[:, 7:13], env_mask)
                q, qd = art.write_joint_state_to_sim(
                    q, qd, est.default_joint_pos, est.default_joint_vel, env_mask
                )
                # reset targets to default positions for masked envs
                m = (
                    jnp.ones(q.shape[0], dtype=bool)
                    if env_mask is None
                    else env_mask
                )[:, None]
                state.entities[name] = est._replace(
                    joint_pos_target=jnp.where(
                        m, est.default_joint_pos, est.joint_pos_target
                    ),
                    joint_vel_target=jnp.where(m, 0.0, est.joint_vel_target),
                    joint_effort_target=jnp.where(m, 0.0, est.joint_effort_target),
                )
            elif name in self.rigid_object_collections:
                col = self.rigid_object_collections[name]
                q, qd = col.reset_to_default(q, qd, est, env_mask)
            else:
                obj = self.rigid_objects[name]
                drs = est.default_root_state
                q = obj.write_root_pose_to_sim(q, drs[:, 0:7], env_mask)
                qd = obj.write_root_velocity_to_sim(q, qd, drs[:, 7:13], env_mask)
        for name, soft in self.deformable_objects.items():
            state.entities[name] = soft.reset_to_default(
                state.entities[name], q.shape[0], self.env_origins, env_mask
            )
        mask = (
            jnp.ones(q.shape[0], dtype=bool) if env_mask is None else env_mask
        )
        phys = state.phys._replace(
            q=q,
            qd=qd,
            qd_prev=jnp.where(mask[:, None], qd, state.phys.qd_prev),
            f_ext_w=jnp.where(
                mask[:, None, None], 0.0, state.phys.f_ext_w
            ),
            warm_lambda=jnp.where(mask[:, None], 0.0, state.phys.warm_lambda),
        )
        new_sensors = {}
        for name, s in self.sensors.items():
            if name in state.sensors:
                sub = None
                if key is not None:
                    key, sub = jax.random.split(key)
                new_sensors[name] = s.reset(state.sensors[name], mask, key=sub)
        return state._replace(phys=phys, sensors={**state.sensors, **new_sensors})

    # ------------------------------------------------------------------
    # Physics stepping (one sim substep over the whole batch)
    # ------------------------------------------------------------------
    def step_physics(self, state: SceneState, dt: float) -> SceneState:
        """Actuators -> world drive -> engine step, batched. The reference's
        ``write_data_to_sim`` + ``sim.step`` fused (manager_based_env.py:398)."""
        wm = self.world_model
        E = self.num_envs
        nu = wm.nu

        kp = jnp.zeros((E, nu))
        kd = jnp.zeros((E, nu))
        pos_t = jnp.zeros((E, nu))
        vel_t = jnp.zeros((E, nu))
        eff = jnp.zeros((E, nu))
        new_entities = dict(state.entities)
        for name, art in self.articulations.items():
            if art.num_joints == 0:
                continue
            est = state.entities[name]
            est, (a_kp, a_kd, a_pt, a_vt, a_ef) = art.compute_drive(
                est, state.phys.q, state.phys.qd
            )
            s = art.slice
            sl = slice(s.dof_start, s.dof_start + s.dof_count)
            kp = kp.at[:, sl].set(a_kp)
            kd = kd.at[:, sl].set(a_kd)
            pos_t = pos_t.at[:, sl].set(a_pt)
            vel_t = vel_t.at[:, sl].set(a_vt)
            eff = eff.at[:, sl].set(a_ef)
            new_entities[name] = est

        drive = eng.JointDrive(kp=kp, kd=kd, pos_target=pos_t, vel_target=vel_t, effort=eff)
        cfg = eng.EngineCfg(
            dt=dt,
            gravity=tuple(self.sim_cfg.gravity),
            solver=self.sim_cfg.solver_cfg(),
        )
        terrain = self.height_field
        offsets = (
            state.terrain_offsets
            if state.terrain_offsets is not None
            else self.terrain_offsets()
        )

        # two-way soft coupling: reaction wrenches the particles exerted on
        # rigid bodies LAST substep enter this substep's external forces
        # (explicit weak coupling; physics/soft_body.py)
        soft_react = None
        for name, soft in self.deformable_objects.items():
            rw = getattr(state.entities[name], "reaction_wrench", None)
            if rw is not None and rw.ndim == 3 and rw.shape[1] == wm.nbody:
                soft_react = rw if soft_react is None else soft_react + rw
        phys_in = (
            state.phys._replace(f_ext_w=state.phys.f_ext_w + soft_react)
            if soft_react is not None else state.phys
        )

        if wm.nbody > 0:
            if eng.use_fused_path():
                # batch-last fused path: ~10x the vmap(step) throughput on
                # TPU (physics/fused.py); equivalence in
                # tests/test_fused_dynamics.py
                new_phys, _, _ = eng.step_batch(
                    wm, self.collision_plan, phys_in, drive,
                    state.body_params, cfg, terrain=terrain,
                    terrain_offset=offsets,
                )
            else:
                # CPU (tests/dev): the fused unroll compiles ~10x slower
                # under XLA:CPU with no runtime win — use the per-env path
                def one_env(phys, drv, params, offset):
                    new_phys, _, _ = eng.step(
                        wm, self.collision_plan, phys, drv, params, cfg,
                        terrain=terrain, terrain_offset=offset,
                    )
                    return new_phys

                new_phys = jax.vmap(one_env)(
                    phys_in, drive, state.body_params, offsets
                )
            if soft_react is not None:
                # restore the user-facing external-wrench buffer (the soft
                # reaction is transient, not an accumulating user write)
                new_phys = new_phys._replace(f_ext_w=state.phys.f_ext_w)
        else:  # soft-only scene: nothing rigid to solve
            new_phys = state.phys
        # XPBD soft bodies step alongside the rigid solve. One-way
        # rigid->soft coupling: particles collide against the listed
        # entities' geoms with collider-relative friction, so a gripper can
        # squeeze and carry them (physics/soft_body.py round-3 note)
        soft_colliders = {
            name: soft for name, soft in self.deformable_objects.items()
            if getattr(soft.cfg, "collide_with", None)
        }
        if soft_colliders:
            kin_old = jax.vmap(
                lambda q: forward_kinematics(self.world_model, q)
            )(state.phys.q)
            kin_new = jax.vmap(
                lambda q: forward_kinematics(self.world_model, q)
            )(new_phys.q)
        for name, soft in self.deformable_objects.items():
            colliders = None
            if name in soft_colliders:
                colliders = self._soft_collider_list(
                    soft.cfg.collide_with, kin_old, kin_new
                )
            new_entities[name] = soft.step(
                new_entities[name], dt, colliders=colliders,
                nbody=wm.nbody if colliders else 0,
            )
        return state._replace(phys=new_phys, entities=new_entities)

    def _soft_collider_list(self, entity_names, kin_old, kin_new):
        """Batched (gtype, size, pos/quat old+new) tuples for the listed
        entities' collidable geoms (input to
        physics/soft_body.collide_particles_with_geoms)."""
        from ..utils import math as mu

        out = []
        for ename in entity_names:
            ent = self[ename]
            sl = ent.slice
            wm = self.world_model
            for g in wm.geoms[sl.geom_start : sl.geom_start + sl.geom_count]:
                if not g.collidable:
                    continue
                gp = jnp.asarray(g.pos)
                gq = jnp.asarray(g.quat)

                def world(kin):
                    p, q = mu.combine_frame_transforms(
                        kin.body_pos_w[:, g.body], kin.body_quat_w[:, g.body],
                        gp[None], gq[None],
                    )
                    return p, q

                p0, q0 = world(kin_old)
                p1, q1 = world(kin_new)
                out.append(
                    (g.gtype, np.asarray(g.size, dtype=np.float32),
                     p0, q0, p1, q1,
                     # body info for two-way coupling reactions
                     int(g.body), kin_new.body_pos_w[:, g.body])
                )
        return out


    def apply_terrain_levels(self, state: SceneState, levels, mask):
        """Move masked envs to the terrain cell for their curriculum level
        (reference terrain_importer.update_env_origins): offsets come from
        the generator's static (rows, cols, 3) cell-origin table."""
        t = self.terrain
        if t is None or getattr(t, "_cell_origins", None) is None:
            return state
        table = jnp.asarray(t._cell_origins, dtype=jnp.float32)  # (R, C, 3)
        types = jnp.asarray(t.terrain_types)
        lvl = jnp.clip(levels.astype(jnp.int32), 0, table.shape[0] - 1)
        new_off = table[lvl, types]
        cur = (
            state.terrain_offsets
            if state.terrain_offsets is not None
            else jnp.asarray(self.terrain_offsets(), dtype=jnp.float32)
        )
        out = jnp.where(mask[:, None], new_off, cur)
        return state._replace(terrain_offsets=out)

    # ------------------------------------------------------------------
    def kinematics(self, state: SceneState):
        """Batched world FK for the current q (shared by data views/sensors)."""
        return jax.vmap(lambda q: forward_kinematics(self.world_model, q))(
            state.phys.q
        )

    def data_views(self, state: SceneState, dt: float):
        """dict name -> entity data view for manager term functions."""
        kin = self.kinematics(state)
        views = {}
        for name in self._entity_names:
            facade = (
                self.articulations.get(name)
                or self.rigid_objects.get(name)
                or self.rigid_object_collections.get(name)
            )
            views[name] = facade.data(
                kin, state.phys.q, state.phys.qd, state.phys.qd_prev,
                state.entities[name], dt,
            )
        return views, kin

    # ------------------------------------------------------------------
    def get_state(self, state: SceneState, is_relative: bool = False) -> dict:
        """Entity-keyed scene state in the reference's recorder format
        (reference ``InteractiveScene.get_state``, interactive_scene.py:484):
        ``{"articulation": {name: {"root_pose", "root_velocity",
        "joint_position", "joint_velocity"}}, "rigid_object": {...},
        "deformable_object": {...}}``. Pure; jittable."""
        q, qd = state.phys.q, state.phys.qd
        E = q.shape[0]
        origins = jnp.asarray(self.env_origins)
        out: dict = {"articulation": {}, "rigid_object": {}, "deformable_object": {}}

        def _root_pose_vel(facade):
            s = facade.slice
            if getattr(facade, "is_fixed_base", False):
                wm = self.world_model
                pose1 = jnp.concatenate(
                    [
                        jnp.asarray(wm.jnt_pos[s.body_start], dtype=q.dtype),
                        jnp.asarray(wm.jnt_quat[s.body_start], dtype=q.dtype),
                    ]
                )
                pose = jnp.tile(pose1, (E, 1))
                vel = jnp.zeros((E, 6), dtype=q.dtype)
            else:
                pose = q[:, s.q_start : s.q_start + 7]
                v = qd[:, s.v_start : s.v_start + 6]  # engine order (ang, lin)
                vel = jnp.concatenate([v[:, 3:6], v[:, 0:3]], axis=-1)
            if is_relative:
                pose = pose.at[:, 0:3].add(-origins)
            return pose, vel

        for name, art in self.articulations.items():
            pose, vel = _root_pose_vel(art)
            out["articulation"][name] = {
                "root_pose": pose,
                "root_velocity": vel,
                "joint_position": art.joint_pos_from_world(q),
                "joint_velocity": art.joint_vel_from_world(qd),
            }
        for name, obj in self.rigid_objects.items():
            pose, vel = _root_pose_vel(obj)
            out["rigid_object"][name] = {
                "root_pose": pose,
                "root_velocity": vel,
            }
        for name in self.deformable_objects:
            est = state.entities[name]
            out["deformable_object"][name] = {
                "nodal_position": est.pos,
                "nodal_velocity": est.vel,
            }
        return out

    def reset_to(
        self,
        state: SceneState,
        target: dict,
        env_mask=None,
        is_relative: bool = False,
    ) -> SceneState:
        """Restore a recorded scene state for masked envs (reference
        ``InteractiveScene.reset_to``, interactive_scene.py:425): the backbone
        of demo replay and mimic data generation. ``target`` is the dict
        produced by :meth:`get_state` (arrays may be (E, ...) batched or a
        single recorded env broadcast to all masked envs). Pure; jittable."""
        q, qd = state.phys.q, state.phys.qd
        E = q.shape[0]
        origins = jnp.asarray(self.env_origins)
        new_entities = dict(state.entities)

        def _batched(x, batched_ndim=2):
            """Broadcast a single recorded env to the (E, ...) batch."""
            x = jnp.asarray(x)
            if x.ndim == batched_ndim - 1:
                x = jnp.broadcast_to(x, (E,) + x.shape)
            return x

        for name, art in self.articulations.items():
            if name not in target.get("articulation", {}):
                continue
            t = target["articulation"][name]
            pose = _batched(t["root_pose"])
            if is_relative:
                pose = pose.at[:, 0:3].add(origins)
            vel = _batched(t["root_velocity"])
            q = art.write_root_pose_to_sim(q, pose, env_mask)
            qd = art.write_root_velocity_to_sim(q, qd, vel, env_mask)
            q, qd = art.write_joint_state_to_sim(
                q, qd, _batched(t["joint_position"]),
                _batched(t["joint_velocity"]), env_mask,
            )
            # command targets follow the restored joint state (the reference
            # re-targets on reset so implicit PD doesn't yank the robot back)
            est = state.entities[name]
            m = (
                jnp.ones(E, dtype=bool) if env_mask is None else env_mask
            )[:, None]
            jp = _batched(t["joint_position"])
            new_entities[name] = est._replace(
                joint_pos_target=jnp.where(m, jp, est.joint_pos_target),
                joint_vel_target=jnp.where(m, 0.0, est.joint_vel_target),
                joint_effort_target=jnp.where(m, 0.0, est.joint_effort_target),
            )
        for name, obj in self.rigid_objects.items():
            if name not in target.get("rigid_object", {}):
                continue
            t = target["rigid_object"][name]
            pose = _batched(t["root_pose"])
            if is_relative:
                pose = pose.at[:, 0:3].add(origins)
            q = obj.write_root_pose_to_sim(q, pose, env_mask)
            qd = obj.write_root_velocity_to_sim(
                q, qd, _batched(t["root_velocity"]), env_mask
            )
        for name, soft in self.deformable_objects.items():
            if name not in target.get("deformable_object", {}):
                continue
            t = target["deformable_object"][name]
            est = state.entities[name]
            est = soft.write_nodal_pos_to_sim(
                est, _batched(t["nodal_position"], batched_ndim=3), env_mask
            )
            est = soft.write_nodal_velocity_to_sim(
                est, _batched(t["nodal_velocity"], batched_ndim=3), env_mask
            )
            new_entities[name] = est

        mask = (
            jnp.ones(E, dtype=bool) if env_mask is None else env_mask
        )
        phys = state.phys._replace(
            q=q,
            qd=qd,
            qd_prev=jnp.where(mask[:, None], qd, state.phys.qd_prev),
            f_ext_w=jnp.where(mask[:, None, None], 0.0, state.phys.f_ext_w),
            warm_lambda=jnp.where(mask[:, None], 0.0, state.phys.warm_lambda),
        )
        new_sensors = {}
        for name, s in self.sensors.items():
            if name in state.sensors:
                new_sensors[name] = s.reset(state.sensors[name], mask)
        return state._replace(
            phys=phys,
            entities=new_entities,
            sensors={**state.sensors, **new_sensors},
        )


def _resolve_model(source):
    """ArticulationCfg.model: RobotModel | callable | urdf/mjcf path."""
    from ..physics.model import RobotModel

    if isinstance(source, RobotModel):
        return source
    if callable(source):
        return source()
    if isinstance(source, str):
        from ..sim.converters import load_model_file

        return load_model_file(source)
    raise TypeError(f"Cannot resolve robot model from {type(source)}")


def _any_ground_geoms(models) -> bool:
    return any(any(g.collidable for g in m.geoms) for m in models)


def _apply_fixed_base_pose(model, init_state) -> None:
    """Compose an init pose into a fixed-base model's root joint frame."""
    import numpy as np

    from ..sim.converters import _quat_apply_np, _quat_mul_np

    pos = np.asarray(init_state.pos, dtype=np.float64)
    rot = np.asarray(init_state.rot, dtype=np.float64)
    model.jnt_pos[0] = pos + _quat_apply_np(rot, model.jnt_pos[0])
    model.jnt_quat[0] = _quat_mul_np(rot, model.jnt_quat[0])
