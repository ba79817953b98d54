"""Static articulation model description.

The TPU-native replacement for the reference's USD-stage + PhysX-view model
representation (reference ``sim/spawners`` + ``physx.ArticulationView``,
SURVEY.md §2.10): a host-built, trace-time-static kinematic tree. Every jitted
step function is specialized to one ``RobotModel`` (topology unrolled at trace
time), which is how heterogeneous per-robot topologies stay MXU-friendly
(SURVEY.md §7 hard part 2).

Conventions: bodies are indexed in topological order (parent < child); body 0's
parent is -1 (the world). Each body is connected to its parent by exactly one
joint. Quaternions are (w, x, y, z).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field

import numpy as np

# Joint types
JOINT_FREE = 0
JOINT_REVOLUTE = 1
JOINT_PRISMATIC = 2
JOINT_FIXED = 3
JOINT_SPHERICAL = 4  # reserved

# Geometry types
GEOM_SPHERE = 0
GEOM_CAPSULE = 1
GEOM_BOX = 2
GEOM_PLANE = 3
GEOM_CYLINDER = 4
GEOM_MESH = 5  # triangle mesh with precomputed SDF (physics/sdf.py)

# Monotonic per-instance token for trace-time caches. ``id(model)`` is NOT a
# valid cache key: CPython reuses addresses after GC, so a long-lived process
# (test sweeps, multi-task training) can silently read another topology's
# cached masks. Every RobotModel gets a process-unique uid instead.
import itertools as _itertools

_MODEL_UID = _itertools.count()


@dataclass
class Geom:
    """One collision primitive attached to a body.

    ``size`` meaning: sphere (radius,), capsule (radius, half_length),
    box (hx, hy, hz) half-extents, cylinder (radius, half_length).
    Capsules/cylinders are aligned with their local z axis.
    """

    body: int
    gtype: int
    size: tuple
    pos: np.ndarray = field(default_factory=lambda: np.zeros(3))
    quat: np.ndarray = field(default_factory=lambda: np.array([1.0, 0, 0, 0]))
    friction: float = 1.0
    restitution: float = 0.0
    name: str = ""
    # display color for the batch renderer (sensors/tiled_camera.py);
    # None -> palette color assigned by body index at render time
    rgba: tuple = None
    # visual-only geoms (collidable=False) are rendered/raycast but excluded
    # from the contact pipeline — keeps contact-free tasks (e.g. cartpole)
    # contact-free when they gain display shapes for the camera sensors
    collidable: bool = True
    # GEOM_MESH attachment: physics/sdf.MeshData (vertices/faces + SDF grid
    # + surface sample points) — the factory-task mesh-collision carrier
    mesh: object = None


@dataclass
class RobotModel:
    """Host-side static description of one articulated robot.

    All arrays are numpy (trace-time constants). Batched per-env copies of the
    *varying* physical parameters (masses, gains, limits — for domain
    randomization) live in ``PhysicsState``-side parameter pytrees, initialized
    from these defaults.
    """

    # --- topology ---
    nbody: int = 0
    body_names: list = field(default_factory=list)
    parent: np.ndarray = field(default_factory=lambda: np.zeros(0, dtype=np.int32))
    # --- joints (one per body, connecting it to parent) ---
    jnt_type: np.ndarray = field(default_factory=lambda: np.zeros(0, dtype=np.int32))
    jnt_axis: np.ndarray = field(default_factory=lambda: np.zeros((0, 3)))
    # joint frame in parent body coordinates
    jnt_pos: np.ndarray = field(default_factory=lambda: np.zeros((0, 3)))
    jnt_quat: np.ndarray = field(default_factory=lambda: np.zeros((0, 4)))
    # child body frame offset from joint frame (URDF: identity; MJCF may not be)
    body_pos: np.ndarray = field(default_factory=lambda: np.zeros((0, 3)))
    body_quat: np.ndarray = field(default_factory=lambda: np.zeros((0, 4)))
    jnt_names: list = field(default_factory=list)
    # --- inertial (body frame) ---
    mass: np.ndarray = field(default_factory=lambda: np.zeros(0))
    com: np.ndarray = field(default_factory=lambda: np.zeros((0, 3)))
    inertia: np.ndarray = field(default_factory=lambda: np.zeros((0, 3, 3)))
    # --- per-DOF (articulated dofs only, i.e. excluding free-joint dofs) ---
    dof_names: list = field(default_factory=list)
    dof_body: np.ndarray = field(default_factory=lambda: np.zeros(0, dtype=np.int32))
    dof_limit_lower: np.ndarray = field(default_factory=lambda: np.zeros(0))
    dof_limit_upper: np.ndarray = field(default_factory=lambda: np.zeros(0))
    dof_armature: np.ndarray = field(default_factory=lambda: np.zeros(0))
    dof_damping: np.ndarray = field(default_factory=lambda: np.zeros(0))
    dof_friction: np.ndarray = field(default_factory=lambda: np.zeros(0))
    dof_effort_limit: np.ndarray = field(default_factory=lambda: np.zeros(0))
    dof_velocity_limit: np.ndarray = field(default_factory=lambda: np.zeros(0))
    # --- fixed tendons (PhysX fixed tendons: linear couplings over joint
    # positions; reference articulation.py:958-1145, schemas.py fixed-tendon
    # properties). ``tendon_coef`` is dense (ntendon, nu): tendon length
    # L = offset + coef @ q_arts; joint torque tau = coef^T * F(L, Ldot). ---
    tendon_names: list = field(default_factory=list)
    tendon_coef: np.ndarray = field(default_factory=lambda: np.zeros((0, 0)))
    tendon_stiffness: np.ndarray = field(default_factory=lambda: np.zeros(0))
    tendon_damping: np.ndarray = field(default_factory=lambda: np.zeros(0))
    tendon_limit_stiffness: np.ndarray = field(default_factory=lambda: np.zeros(0))
    tendon_limit_lower: np.ndarray = field(default_factory=lambda: np.zeros(0))
    tendon_limit_upper: np.ndarray = field(default_factory=lambda: np.zeros(0))
    tendon_rest_length: np.ndarray = field(default_factory=lambda: np.zeros(0))
    tendon_offset: np.ndarray = field(default_factory=lambda: np.zeros(0))
    # --- collision ---
    geoms: list = field(default_factory=list)
    # --- misc ---
    name: str = "robot"
    floating_base: bool = False
    uid: int = field(default_factory=lambda: next(_MODEL_UID))

    # ------------------------------------------------------------------
    # Derived layout (computed by finalize())
    # ------------------------------------------------------------------
    nq: int = 0
    nv: int = 0
    nu: int = 0  # actuated dof count == len(dof_names)
    q_start: np.ndarray = None  # (nbody,) start index into q per body's joint
    v_start: np.ndarray = None  # (nbody,) start index into qd
    q_dim: np.ndarray = None
    v_dim: np.ndarray = None
    # per-articulated-dof index into the v vector
    dof_v_index: np.ndarray = None

    def finalize(self) -> "RobotModel":
        """Compute q/v layout. q: free joint contributes 7 (pos3 + quat4 wxyz),
        revolute/prismatic 1, fixed 0. v: free 6 (ang3+lin3 body frame), 1, 0."""
        qd, vd = [], []
        for j in self.jnt_type:
            if j == JOINT_FREE:
                qd.append(7)
                vd.append(6)
            elif j in (JOINT_REVOLUTE, JOINT_PRISMATIC):
                qd.append(1)
                vd.append(1)
            elif j == JOINT_FIXED:
                qd.append(0)
                vd.append(0)
            else:
                raise NotImplementedError(f"joint type {j}")
        self.q_dim = np.array(qd, dtype=np.int32)
        self.v_dim = np.array(vd, dtype=np.int32)
        self.q_start = np.concatenate([[0], np.cumsum(qd)[:-1]]).astype(np.int32)
        self.v_start = np.concatenate([[0], np.cumsum(vd)[:-1]]).astype(np.int32)
        self.nq = int(np.sum(qd))
        self.nv = int(np.sum(vd))
        self.nu = len(self.dof_names)
        # map articulated dofs to v indices
        dvi = []
        for b in self.dof_body:
            dvi.append(int(self.v_start[b]))
        self.dof_v_index = np.array(dvi, dtype=np.int32)
        self.floating_base = bool(
            self.nbody > 0 and self.jnt_type[0] == JOINT_FREE
        )
        self.tendon_coef = np.asarray(self.tendon_coef, dtype=np.float64).reshape(
            len(self.tendon_names), self.nu
        )
        return self

    @property
    def ntendon(self) -> int:
        return len(self.tendon_names)

    # ------------------------------------------------------------------
    @property
    def num_joints(self) -> int:
        return self.nu

    @property
    def num_bodies(self) -> int:
        return self.nbody

    def default_qpos(self) -> np.ndarray:
        """Neutral generalized position (identity root pose, zero joints)."""
        q = np.zeros(self.nq)
        for b in range(self.nbody):
            if self.jnt_type[b] == JOINT_FREE:
                q[self.q_start[b] + 3] = 1.0  # quat w
        return q


@dataclass
class EntitySlice:
    """Index ranges of one entity inside a merged world model."""

    name: str
    body_start: int
    body_count: int
    q_start: int
    q_count: int
    v_start: int
    v_count: int
    dof_start: int  # articulated-dof (nu) range
    dof_count: int
    geom_start: int
    geom_count: int
    tendon_start: int = 0
    tendon_count: int = 0


def merge_models(models: list, names: list) -> tuple:
    """Merge entity models into one world forest (multi-root tree).

    The TPU replacement for the reference's per-entity PhysX views living in
    one scene (``InteractiveScene`` registries, scene/interactive_scene.py:315):
    a single Featherstone forest lets one constraint solve couple contacts
    between entities (robot-object grasping) with block-diagonal mass matrices.
    Returns ``(world_model, {name: EntitySlice})``.
    """
    out = RobotModel(name="world")
    slices = {}
    body_off = q_off = v_off = dof_off = geom_off = tendon_off = 0
    parts: dict = {k: [] for k in (
        "body_names", "parent", "jnt_type", "jnt_axis", "jnt_pos", "jnt_quat",
        "body_pos", "body_quat", "jnt_names", "mass", "com", "inertia",
        "dof_names", "dof_body", "dof_limit_lower", "dof_limit_upper",
        "dof_armature", "dof_damping", "dof_friction", "dof_effort_limit",
        "dof_velocity_limit", "geoms",
    )}
    for m, name in zip(models, names):
        slices[name] = EntitySlice(
            name=name,
            body_start=body_off, body_count=m.nbody,
            q_start=q_off, q_count=m.nq,
            v_start=v_off, v_count=m.nv,
            dof_start=dof_off, dof_count=m.nu,
            geom_start=geom_off, geom_count=len(m.geoms),
            tendon_start=tendon_off, tendon_count=m.ntendon,
        )
        parts["body_names"] += [f"{name}/{n}" for n in m.body_names]
        parts["parent"].append(
            np.where(m.parent < 0, m.parent, m.parent + body_off)
        )
        for k in ("jnt_type", "jnt_axis", "jnt_pos", "jnt_quat", "body_pos",
                  "body_quat", "mass", "com", "inertia", "dof_limit_lower",
                  "dof_limit_upper", "dof_armature", "dof_damping",
                  "dof_friction", "dof_effort_limit", "dof_velocity_limit"):
            parts[k].append(getattr(m, k))
        parts["jnt_names"] += [f"{name}/{n}" for n in m.jnt_names]
        parts["dof_names"] += list(m.dof_names)
        parts["dof_body"].append(m.dof_body + body_off)
        for g in m.geoms:
            g2 = dataclasses.replace(g, body=g.body + body_off)
            parts["geoms"].append(g2)
        body_off += m.nbody
        q_off += m.nq
        v_off += m.nv
        dof_off += m.nu
        geom_off += len(m.geoms)
        tendon_off += m.ntendon

    def cat(key, shape_tail=()):
        arrs = parts[key]
        if not arrs:
            return np.zeros((0,) + shape_tail)
        return np.concatenate([np.asarray(a).reshape((-1,) + shape_tail) for a in arrs])

    out.nbody = body_off
    out.body_names = parts["body_names"]
    out.parent = cat("parent").astype(np.int32)
    out.jnt_type = cat("jnt_type").astype(np.int32)
    out.jnt_axis = cat("jnt_axis", (3,))
    out.jnt_pos = cat("jnt_pos", (3,))
    out.jnt_quat = cat("jnt_quat", (4,))
    out.body_pos = cat("body_pos", (3,))
    out.body_quat = cat("body_quat", (4,))
    out.jnt_names = parts["jnt_names"]
    out.mass = cat("mass")
    out.com = cat("com", (3,))
    out.inertia = cat("inertia", (3, 3))
    out.dof_names = parts["dof_names"]
    out.dof_body = cat("dof_body").astype(np.int32)
    out.dof_limit_lower = cat("dof_limit_lower")
    out.dof_limit_upper = cat("dof_limit_upper")
    out.dof_armature = cat("dof_armature")
    out.dof_damping = cat("dof_damping")
    out.dof_friction = cat("dof_friction")
    out.dof_effort_limit = cat("dof_effort_limit")
    out.dof_velocity_limit = cat("dof_velocity_limit")
    out.geoms = parts["geoms"]
    # fixed tendons: block-place each entity's (nt, nu_e) coef matrix into the
    # world (ntendon, nu_world) coupling matrix
    nt_total = sum(m.ntendon for m in models)
    coef = np.zeros((nt_total, dof_off))
    t_names: list = []
    t_params = {k: [] for k in (
        "tendon_stiffness", "tendon_damping", "tendon_limit_stiffness",
        "tendon_limit_lower", "tendon_limit_upper", "tendon_rest_length",
        "tendon_offset",
    )}
    t_row = 0
    for m, name in zip(models, names):
        if m.ntendon:
            s = slices[name]
            coef[t_row : t_row + m.ntendon,
                 s.dof_start : s.dof_start + s.dof_count] = m.tendon_coef
            t_names += list(m.tendon_names)
            for k in t_params:
                t_params[k].append(getattr(m, k))
            t_row += m.ntendon
    out.tendon_names = t_names
    out.tendon_coef = coef
    for k, arrs in t_params.items():
        setattr(out, k, np.concatenate(arrs) if arrs else np.zeros(0))
    return out.finalize(), slices


class ModelBuilder:
    """Programmatic articulation builder (tests, simple tasks).

    Mirrors what the reference achieves through USD spawner + schema authoring
    (reference ``sim/spawners``, ``sim/schemas/schemas.py:30-756``) but builds
    plain arrays.
    """

    def __init__(self, name: str = "robot"):
        self.name = name
        self.body_names: list = []
        self.parent: list = []
        self.jnt_type: list = []
        self.jnt_axis: list = []
        self.jnt_pos: list = []
        self.jnt_quat: list = []
        self.body_pos: list = []
        self.body_quat: list = []
        self.jnt_names: list = []
        self.mass: list = []
        self.com: list = []
        self.inertia: list = []
        self.dof_names: list = []
        self.dof_body: list = []
        self.dof_limits: list = []
        self.dof_armature: list = []
        self.dof_damping: list = []
        self.dof_friction: list = []
        self.dof_effort_limit: list = []
        self.dof_velocity_limit: list = []
        self.geoms: list = []
        self.tendons: list = []  # (name, {joint_name: coef}, params dict)

    def add_body(
        self,
        name: str,
        parent: int,
        jnt_type: int,
        jnt_axis=(0, 0, 1),
        jnt_pos=(0, 0, 0),
        jnt_quat=(1, 0, 0, 0),
        body_pos=(0, 0, 0),
        body_quat=(1, 0, 0, 0),
        mass: float = 1.0,
        com=(0, 0, 0),
        inertia=None,
        jnt_name: str | None = None,
        limits=(-1e9, 1e9),
        armature: float = 0.0,
        damping: float = 0.0,
        friction: float = 0.0,
        effort_limit: float = 1e9,
        velocity_limit: float = 1e9,
    ) -> int:
        """Append a body; returns its index."""
        idx = len(self.body_names)
        if parent >= idx:
            raise ValueError("bodies must be added in topological order")
        self.body_names.append(name)
        self.parent.append(parent)
        self.jnt_type.append(jnt_type)
        self.jnt_axis.append(np.asarray(jnt_axis, dtype=np.float64))
        self.jnt_pos.append(np.asarray(jnt_pos, dtype=np.float64))
        self.jnt_quat.append(np.asarray(jnt_quat, dtype=np.float64))
        self.body_pos.append(np.asarray(body_pos, dtype=np.float64))
        self.body_quat.append(np.asarray(body_quat, dtype=np.float64))
        self.mass.append(mass)
        self.com.append(np.asarray(com, dtype=np.float64))
        if inertia is None:
            inertia = np.eye(3) * 0.01
        inertia = np.asarray(inertia, dtype=np.float64)
        if inertia.ndim == 1:
            inertia = np.diag(inertia)
        self.inertia.append(inertia)
        if jnt_type in (JOINT_REVOLUTE, JOINT_PRISMATIC):
            self.dof_names.append(jnt_name or f"{name}_joint")
            self.jnt_names.append(jnt_name or f"{name}_joint")
            self.dof_body.append(idx)
            self.dof_limits.append(limits)
            self.dof_armature.append(armature)
            self.dof_damping.append(damping)
            self.dof_friction.append(friction)
            self.dof_effort_limit.append(effort_limit)
            self.dof_velocity_limit.append(velocity_limit)
        else:
            self.jnt_names.append(jnt_name or f"{name}_{'free' if jnt_type == JOINT_FREE else 'fixed'}")
        return idx

    def add_geom(self, body: int, gtype: int, size, pos=(0, 0, 0), quat=(1, 0, 0, 0), friction=1.0, restitution=0.0, name="", rgba=None, collidable=True, mesh=None):
        self.geoms.append(
            Geom(
                body=body,
                gtype=gtype,
                size=tuple(size),
                pos=np.asarray(pos, dtype=np.float64),
                quat=np.asarray(quat, dtype=np.float64),
                friction=friction,
                restitution=restitution,
                name=name or f"geom_{len(self.geoms)}",
                rgba=rgba,
                collidable=collidable,
                mesh=mesh,
            )
        )

    def add_tendon(
        self,
        name: str,
        joints: dict,
        stiffness: float = 0.0,
        damping: float = 0.0,
        limit_stiffness: float = 0.0,
        limits=(-1e9, 1e9),
        rest_length: float = 0.0,
        offset: float = 0.0,
    ):
        """Add a fixed tendon: linear coupling ``L = offset + sum c_i q_i``
        over the named 1-dof joints (PhysX fixed tendon; reference
        sim/schemas ``FixedTendonPropertiesCfg``). Spring pulls L toward
        ``rest_length``; ``limit_stiffness`` activates outside ``limits``."""
        self.tendons.append((
            name, dict(joints),
            dict(stiffness=stiffness, damping=damping,
                 limit_stiffness=limit_stiffness, limit_lower=limits[0],
                 limit_upper=limits[1], rest_length=rest_length,
                 offset=offset),
        ))

    def build(self) -> RobotModel:
        n = len(self.body_names)
        limits = np.asarray(self.dof_limits) if self.dof_limits else np.zeros((0, 2))
        model = RobotModel(
            nbody=n,
            body_names=list(self.body_names),
            parent=np.asarray(self.parent, dtype=np.int32),
            jnt_type=np.asarray(self.jnt_type, dtype=np.int32),
            jnt_axis=np.asarray(self.jnt_axis).reshape(n, 3),
            jnt_pos=np.asarray(self.jnt_pos).reshape(n, 3),
            jnt_quat=np.asarray(self.jnt_quat).reshape(n, 4),
            body_pos=np.asarray(self.body_pos).reshape(n, 3),
            body_quat=np.asarray(self.body_quat).reshape(n, 4),
            jnt_names=list(self.jnt_names),
            mass=np.asarray(self.mass),
            com=np.asarray(self.com).reshape(n, 3),
            inertia=np.asarray(self.inertia).reshape(n, 3, 3),
            dof_names=list(self.dof_names),
            dof_body=np.asarray(self.dof_body, dtype=np.int32),
            dof_limit_lower=limits[:, 0].copy(),
            dof_limit_upper=limits[:, 1].copy(),
            dof_armature=np.asarray(self.dof_armature),
            dof_damping=np.asarray(self.dof_damping),
            dof_friction=np.asarray(self.dof_friction),
            dof_effort_limit=np.asarray(self.dof_effort_limit),
            dof_velocity_limit=np.asarray(self.dof_velocity_limit),
            geoms=list(self.geoms),
            name=self.name,
        )
        if self.tendons:
            nt, nu = len(self.tendons), len(self.dof_names)
            coef = np.zeros((nt, nu))
            pk = ("stiffness", "damping", "limit_stiffness", "limit_lower",
                  "limit_upper", "rest_length", "offset")
            pvals = {k: np.zeros(nt) for k in pk}
            model.tendon_names = []
            for t, (tname, joints, params) in enumerate(self.tendons):
                model.tendon_names.append(tname)
                for jname, c in joints.items():
                    coef[t, self.dof_names.index(jname)] = c
                for k in pk:
                    pvals[k][t] = params[k]
            model.tendon_coef = coef
            model.tendon_stiffness = pvals["stiffness"]
            model.tendon_damping = pvals["damping"]
            model.tendon_limit_stiffness = pvals["limit_stiffness"]
            model.tendon_limit_lower = pvals["limit_lower"]
            model.tendon_limit_upper = pvals["limit_upper"]
            model.tendon_rest_length = pvals["rest_length"]
            model.tendon_offset = pvals["offset"]
        return model.finalize()
