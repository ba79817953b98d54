"""Contact sensor (reference ``sensors/contact_sensor/``).

Reads per-body net contact forces straight out of the engine's solver products
(``PhysicsState.contact_force_w`` — already computed, no extra narrowphase;
SURVEY.md §2.6 TPU note), with force history and air-time/contact-time
tracking (reference contact_sensor.py:176-212).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..utils.configclass import configclass
from .sensor_base import SensorBase, SensorBaseCfg, parse_entity_from_prim_path


@configclass
class ContactSensorCfg(SensorBaseCfg):
    """Reference ``ContactSensorCfg``."""

    class_type: type = None
    track_air_time: bool = False
    track_pose: bool = False
    force_threshold: float = 1.0
    filter_prim_paths_expr: list = []

    def __post_init__(self):
        if self.class_type is None:
            self.class_type = ContactSensor


class ContactSensorState(NamedTuple):
    net_forces_w: jnp.ndarray  # (E, B, 3)
    net_forces_w_history: jnp.ndarray  # (E, H, B, 3)
    current_air_time: jnp.ndarray  # (E, B)
    last_air_time: jnp.ndarray  # (E, B)
    current_contact_time: jnp.ndarray  # (E, B)
    last_contact_time: jnp.ndarray  # (E, B)
    force_matrix_w: jnp.ndarray  # (E, B, M, 3) per-filtered-pair forces


class ContactSensorData:
    """Reference ``ContactSensorData`` fields (contact_sensor_data.py:17-95)."""

    def __init__(self, sensor, state: ContactSensorState):
        self._sensor = sensor
        self.net_forces_w = state.net_forces_w
        self.net_forces_w_history = state.net_forces_w_history
        self.current_air_time = state.current_air_time
        self.last_air_time = state.last_air_time
        self.current_contact_time = state.current_contact_time
        self.last_contact_time = state.last_contact_time
        self.force_matrix_w = state.force_matrix_w


class ContactSensor(SensorBase):
    def __init__(self, cfg: ContactSensorCfg, scene):
        super().__init__(cfg, scene)
        entity_name, body_regex = parse_entity_from_prim_path(cfg.prim_path, scene)
        self.entity = scene[entity_name]
        ids, names = self.entity.find_bodies(body_regex)
        self.body_ids = np.asarray(ids, dtype=np.int32)
        self.body_names = names
        self.num_bodies = len(ids)
        # static map: contact rows of the collision plan touching our bodies
        self._plan = scene.collision_plan
        self._world_body_ids = self.body_ids + self.entity.slice.body_start
        # per-pair filter bodies (reference cfg.filter_prim_paths_expr →
        # force_matrix_w); resolved to world body indices at build time
        self._filter_world_ids = []
        self.filter_body_names = []
        for expr in self.cfg.filter_prim_paths_expr:
            f_entity, f_regex = parse_entity_from_prim_path(expr, scene)
            fe = scene[f_entity]
            f_ids, f_names = fe.find_bodies(f_regex)
            for i, n in zip(f_ids, f_names):
                self._filter_world_ids.append(int(i) + fe.slice.body_start)
                self.filter_body_names.append(f"{f_entity}/{n}")
        self.num_filter_bodies = len(self._filter_world_ids)

    def find_bodies(self, name_keys, preserve_order=False):
        from ..utils import string as su

        return su.resolve_matching_names(name_keys, self.body_names, preserve_order)

    def init_state(self, num_envs: int) -> ContactSensorState:
        B = self.num_bodies
        H = max(1, self.cfg.history_length)
        z = jnp.zeros((num_envs, B))
        return ContactSensorState(
            net_forces_w=jnp.zeros((num_envs, B, 3)),
            net_forces_w_history=jnp.zeros((num_envs, H, B, 3)),
            current_air_time=z,
            last_air_time=z,
            current_contact_time=z,
            last_contact_time=z,
            force_matrix_w=jnp.zeros((num_envs, B, self.num_filter_bodies, 3)),
        )

    def update(self, state, scene_state, dt: float) -> ContactSensorState:
        """Aggregate solver contact forces onto sensed bodies; track air time
        (reference contact_sensor.py:320 _update_buffers_impl)."""
        if state is None:
            state = self.init_state(scene_state.phys.q.shape[0])
        forces = scene_state.phys.contact_force_w  # (E, ncon, 3)
        plan = self._plan
        E = forces.shape[0]
        B = self.num_bodies
        net = jnp.zeros((E, B, 3))
        matrix = jnp.zeros((E, B, self.num_filter_bodies, 3))
        if plan.ncon:
            # static scatter: accumulate rows whose body_a matches
            contacts_body = self._contact_body_rows()
            for row, local_b, sign in contacts_body:
                net = net.at[:, local_b].add(sign * forces[:, row])
            if self.num_filter_bodies:
                for row, local_b, f_idx, sign in self._force_matrix_rows():
                    matrix = matrix.at[:, local_b, f_idx].add(
                        sign * forces[:, row]
                    )
        hist = jnp.concatenate(
            [net[:, None], state.net_forces_w_history[:, :-1]], axis=1
        )
        in_contact = jnp.linalg.norm(net, axis=-1) > self.cfg.force_threshold
        # air-time bookkeeping
        new_air = jnp.where(in_contact, 0.0, state.current_air_time + dt)
        last_air = jnp.where(
            in_contact & (state.current_air_time > 0.0),
            state.current_air_time + 0.0,
            state.last_air_time,
        )
        new_contact = jnp.where(in_contact, state.current_contact_time + dt, 0.0)
        last_contact = jnp.where(
            (~in_contact) & (state.current_contact_time > 0.0),
            state.current_contact_time,
            state.last_contact_time,
        )
        return ContactSensorState(
            net_forces_w=net,
            net_forces_w_history=hist,
            current_air_time=new_air,
            last_air_time=last_air,
            current_contact_time=new_contact,
            last_contact_time=last_contact,
            force_matrix_w=matrix,
        )

    def _iter_plan_rows(self):
        """Yield (row_index, body_a, body_b) in detect()'s emission order."""
        from ..physics.collision import num_ground_candidates, num_pair_contacts

        plan = self._plan
        idx = 0
        for g in plan.ground_geoms:
            for _ in range(num_ground_candidates(g)):
                yield idx, int(g.body), -1
                idx += 1
        for ga, gb in plan.pairs:
            # pairs emit num_pair_contacts rows (box-box is a manifold)
            for _ in range(num_pair_contacts(ga, gb)):
                yield idx, int(ga.body), int(gb.body)
                idx += 1

    def _contact_body_rows(self):
        """Static list of (contact_row, local_body_index, sign)."""
        rows = []
        wb = {int(w): i for i, w in enumerate(self._world_body_ids)}
        for idx, ba, bb in self._iter_plan_rows():
            if ba in wb:
                rows.append((idx, wb[ba], 1.0))
            if bb in wb:
                rows.append((idx, wb[bb], -1.0))
        return rows

    def _force_matrix_rows(self):
        """Static (contact_row, local_body, filter_idx, sign) quadruples for
        ``force_matrix_w`` (reference contact_sensor_data.py force_matrix_w:
        per-pair forces against cfg.filter_prim_paths_expr bodies)."""
        rows = []
        wb = {int(w): i for i, w in enumerate(self._world_body_ids)}
        fb = {int(w): i for i, w in enumerate(self._filter_world_ids)}
        for idx, ba, bb in self._iter_plan_rows():
            if ba in wb and bb in fb:
                rows.append((idx, wb[ba], fb[bb], 1.0))
            if bb in wb and ba in fb:
                rows.append((idx, wb[bb], fb[ba], -1.0))
        return rows

    def reset(self, state, env_mask, key=None):
        if state is None:
            return state
        m1 = env_mask[:, None]
        return ContactSensorState(
            net_forces_w=jnp.where(m1[..., None], 0.0, state.net_forces_w),
            net_forces_w_history=jnp.where(
                env_mask[:, None, None, None], 0.0, state.net_forces_w_history
            ),
            current_air_time=jnp.where(m1, 0.0, state.current_air_time),
            last_air_time=jnp.where(m1, 0.0, state.last_air_time),
            current_contact_time=jnp.where(m1, 0.0, state.current_contact_time),
            last_contact_time=jnp.where(m1, 0.0, state.last_contact_time),
            force_matrix_w=jnp.where(
                env_mask[:, None, None, None], 0.0, state.force_matrix_w
            ),
        )

    def data_view(self, state):
        return ContactSensorData(self, state)

    # reference contact_sensor.py:176-212
    def compute_first_contact(self, state, dt: float):
        """Bodies that made contact within the last ``dt`` seconds."""
        return (state.current_contact_time > 0.0) & (
            state.current_contact_time <= dt + 1e-6
        )

    def compute_first_air(self, state, dt: float):
        return (state.current_air_time > 0.0) & (
            state.current_air_time <= dt + 1e-6
        )


ContactSensorCfg.class_type = ContactSensor
