"""Model-description converters: URDF / MJCF -> RobotModel.

TPU-native counterpart of the reference converters
(``sim/converters/urdf_converter.py``, ``mjcf_converter.py``) — but instead of
producing USD for an external engine, they parse robot descriptions directly
into the static :class:`RobotModel` arrays the in-repo engine consumes
(SURVEY.md §2.10 row 2). Host-side, build-time only.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np

from ..physics.model import (
    GEOM_BOX,
    GEOM_CAPSULE,
    GEOM_CYLINDER,
    GEOM_SPHERE,
    JOINT_FIXED,
    JOINT_FREE,
    JOINT_PRISMATIC,
    JOINT_REVOLUTE,
    ModelBuilder,
    RobotModel,
)
from ..utils import math as math_utils


def _floats(s, default=None):
    if s is None:
        return default
    return np.array([float(x) for x in s.split()])


def _rpy_to_quat(rpy):
    import math

    r, p, y = rpy
    cy, sy = math.cos(y * 0.5), math.sin(y * 0.5)
    cp, sp = math.cos(p * 0.5), math.sin(p * 0.5)
    cr, sr = math.cos(r * 0.5), math.sin(r * 0.5)
    return np.array(
        [
            cy * cr * cp + sy * sr * sp,
            cy * sr * cp - sy * cr * sp,
            cy * cr * sp + sy * sr * cp,
            sy * cr * cp - cy * sr * sp,
        ]
    )


def load_urdf(path_or_string: str, floating_base: bool = False,
              merge_fixed: bool = True, name: str = None) -> RobotModel:
    """Parse a URDF file/string into a RobotModel.

    ``merge_fixed``: lump fixed-joint children into their parent (mass/inertia
    composition), keeping the dof count minimal — the equivalent of the
    reference converter's ``merge_fixed_joints`` (urdf_converter_cfg.py).
    """
    if os.path.exists(path_or_string):
        tree = ET.parse(path_or_string)
        root = tree.getroot()
        name = name or os.path.splitext(os.path.basename(path_or_string))[0]
    else:
        root = ET.fromstring(path_or_string)
        name = name or root.get("name", "robot")

    links = {}
    for link in root.findall("link"):
        lname = link.get("name")
        inertial = link.find("inertial")
        mass, com, inertia = 0.0, np.zeros(3), np.zeros((3, 3))
        if inertial is not None:
            mass_el = inertial.find("mass")
            mass = float(mass_el.get("value")) if mass_el is not None else 0.0
            origin = inertial.find("origin")
            if origin is not None:
                com = _floats(origin.get("xyz"), np.zeros(3))
            in_el = inertial.find("inertia")
            if in_el is not None:
                ixx = float(in_el.get("ixx", 0))
                iyy = float(in_el.get("iyy", 0))
                izz = float(in_el.get("izz", 0))
                ixy = float(in_el.get("ixy", 0))
                ixz = float(in_el.get("ixz", 0))
                iyz = float(in_el.get("iyz", 0))
                inertia = np.array(
                    [[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]]
                )
        geoms = []
        for col in link.findall("collision"):
            g = _parse_urdf_geom(col)
            if g is not None:
                geoms.append(g)
        links[lname] = dict(mass=mass, com=com, inertia=inertia, geoms=geoms)

    joints = []
    child_links = set()
    for joint in root.findall("joint"):
        jtype = joint.get("type")
        parent = joint.find("parent").get("link")
        child = joint.find("child").get("link")
        child_links.add(child)
        origin = joint.find("origin")
        xyz = _floats(origin.get("xyz"), np.zeros(3)) if origin is not None else np.zeros(3)
        rpy = _floats(origin.get("rpy"), np.zeros(3)) if origin is not None else np.zeros(3)
        axis_el = joint.find("axis")
        axis = _floats(axis_el.get("xyz"), np.array([0, 0, 1.0])) if axis_el is not None else np.array([0, 0, 1.0])
        limit = joint.find("limit")
        lo, hi, effort, vel = -1e9, 1e9, 1e9, 1e9
        if limit is not None:
            lo = float(limit.get("lower", -1e9))
            hi = float(limit.get("upper", 1e9))
            effort = float(limit.get("effort", 1e9))
            vel = float(limit.get("velocity", 1e9))
        dynamics = joint.find("dynamics")
        damping = float(dynamics.get("damping", 0)) if dynamics is not None else 0.0
        friction = float(dynamics.get("friction", 0)) if dynamics is not None else 0.0
        joints.append(
            dict(name=joint.get("name"), type=jtype, parent=parent, child=child,
                 xyz=xyz, quat=_rpy_to_quat(rpy), axis=axis, lower=lo, upper=hi,
                 effort=effort, velocity=vel, damping=damping, friction=friction)
        )

    root_links = [l for l in links if l not in child_links]
    if len(root_links) != 1:
        raise ValueError(f"URDF must have exactly one root link, got {root_links}")

    b = ModelBuilder(name)
    link_to_idx = {}

    def add_link(lname, parent_idx, jnt):
        ld = links[lname]
        if jnt is None:
            jtype = JOINT_FREE if floating_base else JOINT_FIXED
            idx = b.add_body(
                lname, parent_idx, jtype, mass=ld["mass"], com=ld["com"],
                inertia=ld["inertia"],
            )
        else:
            tmap = {
                "revolute": JOINT_REVOLUTE,
                "continuous": JOINT_REVOLUTE,
                "prismatic": JOINT_PRISMATIC,
                "fixed": JOINT_FIXED,
            }
            if jnt["type"] not in tmap:
                raise NotImplementedError(f"URDF joint type {jnt['type']}")
            jtype = tmap[jnt["type"]]
            limits = (jnt["lower"], jnt["upper"])
            if jnt["type"] == "continuous":
                limits = (-1e9, 1e9)
            idx = b.add_body(
                lname, parent_idx, jtype,
                jnt_axis=jnt["axis"], jnt_pos=jnt["xyz"], jnt_quat=jnt["quat"],
                mass=ld["mass"], com=ld["com"], inertia=ld["inertia"],
                jnt_name=jnt["name"], limits=limits, damping=jnt["damping"],
                friction=jnt["friction"], effort_limit=jnt["effort"],
                velocity_limit=jnt["velocity"],
            )
        link_to_idx[lname] = idx
        for g in ld["geoms"]:
            kw = {"name": g[4]} if len(g) > 4 and g[4] else {}
            b.add_geom(idx, g[0], g[1], pos=g[2], quat=g[3], **kw)
        for j in joints:
            if j["parent"] == lname:
                add_link(j["child"], idx, j)

    add_link(root_links[0], -1, None)
    model = b.build()
    if merge_fixed:
        model = merge_fixed_joints(model)
    return model


def _parse_urdf_geom(col_el):
    geom_el = col_el.find("geometry")
    if geom_el is None:
        return None
    # URDF <collision name="..."> names flow to the geom so regex-based
    # collision filters / contact sensors can address them
    gname = col_el.get("name")
    origin = col_el.find("origin")
    pos = _floats(origin.get("xyz"), np.zeros(3)) if origin is not None else np.zeros(3)
    rpy = _floats(origin.get("rpy"), np.zeros(3)) if origin is not None else np.zeros(3)
    quat = _rpy_to_quat(rpy)
    sphere = geom_el.find("sphere")
    if sphere is not None:
        return (GEOM_SPHERE, (float(sphere.get("radius")),), pos, quat, gname)
    box = geom_el.find("box")
    if box is not None:
        size = _floats(box.get("size"))
        return (GEOM_BOX, tuple(size / 2.0), pos, quat, gname)
    cyl = geom_el.find("cylinder")
    if cyl is not None:
        return (
            GEOM_CYLINDER,
            (float(cyl.get("radius")), float(cyl.get("length")) / 2.0),
            pos,
            quat,
            gname,
        )
    capsule = geom_el.find("capsule")
    if capsule is not None:
        return (
            GEOM_CAPSULE,
            (float(capsule.get("radius")), float(capsule.get("length")) / 2.0),
            pos,
            quat,
        )
    return None  # meshes: skipped (no convex decomposition on TPU path yet)


def merge_fixed_joints(model: RobotModel) -> RobotModel:
    """Lump fixed-joint bodies into their parents (mass composition with
    parallel-axis inertia transport); keeps body_names of kept bodies."""
    import numpy as np

    keep = [
        i for i in range(model.nbody)
        if model.jnt_type[i] != JOINT_FIXED or model.parent[i] < 0
    ]
    if len(keep) == model.nbody:
        return model
    # map merged bodies to nearest kept ancestor, accumulating transforms
    b = ModelBuilder(model.name)
    old_to_new = {}
    # transform of body i in its kept ancestor's frame
    anc = {}

    def kept_ancestor(i):
        j = i
        pos = np.zeros(3)
        quat = np.array([1.0, 0, 0, 0])
        while j not in keep:
            p = int(model.parent[j])
            # pose of j in p: fixed joint -> static
            jp, jq = _fixed_local_pose(model, j)
            pos = jp + _quat_apply_np(jq, pos)
            quat = _quat_mul_np(jq, quat)
            j = p
        return j, pos, quat

    for i in keep:
        p = int(model.parent[i])
        if p < 0:
            new_p = -1
            jp_off = np.zeros(3)
            jq_off = np.array([1.0, 0, 0, 0])
        else:
            ka, off_p, off_q = kept_ancestor(p)
            new_p = old_to_new[ka]
            jp_off, jq_off = off_p, off_q
        # joint frame offset: original jnt pose composed with ancestor offset
        jnt_pos = jp_off + _quat_apply_np(jq_off, model.jnt_pos[i])
        jnt_quat = _quat_mul_np(jq_off, model.jnt_quat[i])
        is_dof = model.jnt_type[i] in (JOINT_REVOLUTE, JOINT_PRISMATIC)
        kw = {}
        if is_dof:
            di = list(model.dof_body).index(i)
            kw = dict(
                jnt_name=model.dof_names[di],
                limits=(model.dof_limit_lower[di], model.dof_limit_upper[di]),
                armature=model.dof_armature[di],
                damping=model.dof_damping[di],
                friction=model.dof_friction[di],
                effort_limit=model.dof_effort_limit[di],
                velocity_limit=model.dof_velocity_limit[di],
            )
        idx = b.add_body(
            model.body_names[i], new_p, int(model.jnt_type[i]),
            jnt_axis=model.jnt_axis[i], jnt_pos=jnt_pos, jnt_quat=jnt_quat,
            body_pos=model.body_pos[i], body_quat=model.body_quat[i],
            mass=float(model.mass[i]), com=model.com[i], inertia=model.inertia[i],
            **kw,
        )
        old_to_new[i] = idx

    # fold merged bodies' inertia into kept ancestors and reattach geoms
    for i in range(model.nbody):
        if i in keep:
            tgt = old_to_new[i]
            for g in model.geoms:
                if g.body == i:
                    b.add_geom(tgt, g.gtype, g.size, g.pos, g.quat, g.friction,
                               g.restitution, g.name)
            continue
        ka, off_p, off_q = kept_ancestor(i)
        tgt = old_to_new[ka]
        m_add = float(model.mass[i])
        com_in_anc = off_p + _quat_apply_np(off_q, model.com[i])
        m0 = b.mass[tgt]
        com0 = b.com[tgt]
        m_tot = m0 + m_add
        if m_tot > 0:
            new_com = (m0 * com0 + m_add * com_in_anc) / m_tot
        else:
            new_com = com0
        R = _quat_to_mat_np(off_q)
        I_add = R @ model.inertia[i] @ R.T
        # parallel axis both inertias to the new COM
        def shift(I, m, c_from, c_to):
            d = c_from - c_to
            return I + m * (np.dot(d, d) * np.eye(3) - np.outer(d, d))

        I_new = shift(b.inertia[tgt], m0, com0, new_com) + shift(
            I_add, m_add, com_in_anc, new_com
        )
        b.mass[tgt] = m_tot
        b.com[tgt] = new_com
        b.inertia[tgt] = I_new
        for g in model.geoms:
            if g.body == i:
                gp = off_p + _quat_apply_np(off_q, g.pos)
                gq = _quat_mul_np(off_q, g.quat)
                b.add_geom(tgt, g.gtype, g.size, gp, gq, g.friction,
                           g.restitution, g.name)
    return b.build()


def _fixed_local_pose(model, i):
    # fixed joint: body pose in parent = jnt pose composed with body offset
    jp, jq = model.jnt_pos[i], model.jnt_quat[i]
    bp, bq = model.body_pos[i], model.body_quat[i]
    return jp + _quat_apply_np(jq, bp), _quat_mul_np(jq, bq)


def _quat_mul_np(q1, q2):
    w1, x1, y1, z1 = q1
    w2, x2, y2, z2 = q2
    return np.array(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ]
    )


def _quat_apply_np(q, v):
    xyz = q[1:4]
    t = 2.0 * np.cross(xyz, v)
    return v + q[0] * t + np.cross(xyz, t)


def _quat_to_mat_np(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


def load_mjcf(path_or_string: str, name: str = None) -> RobotModel:
    """Parse a (simple) MJCF file/string into a RobotModel
    (reference MjcfConverter equivalent; supports body/joint/geom/inertial)."""
    if os.path.exists(path_or_string):
        tree = ET.parse(path_or_string)
        root = tree.getroot()
        name = name or os.path.splitext(os.path.basename(path_or_string))[0]
    else:
        root = ET.fromstring(path_or_string)
        name = name or root.get("model", "robot")

    worldbody = root.find("worldbody")
    if worldbody is None:
        raise ValueError("MJCF missing <worldbody>")
    b = ModelBuilder(name)

    def parse_body(el, parent_idx):
        bname = el.get("name", f"body{len(b.body_names)}")
        pos = _floats(el.get("pos"), np.zeros(3))
        quat = _floats(el.get("quat"), np.array([1.0, 0, 0, 0]))
        joint = el.find("joint")
        free = el.find("freejoint")
        inertial = el.find("inertial")
        mass, com, inertia = 1e-6, np.zeros(3), np.eye(3) * 1e-9
        if inertial is not None:
            mass = float(inertial.get("mass", 0))
            com = _floats(inertial.get("pos"), np.zeros(3))
            diag = _floats(inertial.get("diaginertia"), None)
            if diag is not None:
                inertia = np.diag(diag)
            else:
                full = _floats(inertial.get("fullinertia"), None)
                if full is not None:
                    ixx, iyy, izz, ixy, ixz, iyz = full
                    inertia = np.array(
                        [[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]]
                    )
        if free is not None:
            idx = b.add_body(bname, parent_idx, JOINT_FREE, mass=mass, com=com,
                             inertia=inertia)
        elif joint is not None:
            jtype_s = joint.get("type", "hinge")
            tmap = {"hinge": JOINT_REVOLUTE, "slide": JOINT_PRISMATIC}
            jtype = tmap.get(jtype_s)
            if jtype is None:
                raise NotImplementedError(f"MJCF joint type {jtype_s}")
            axis = _floats(joint.get("axis"), np.array([0, 0, 1.0]))
            jpos = _floats(joint.get("pos"), np.zeros(3))
            rng = _floats(joint.get("range"), np.array([-1e9, 1e9]))
            # MJCF: joint sits inside the child body at (body pos + joint pos)
            idx = b.add_body(
                bname, parent_idx, jtype, jnt_axis=axis,
                jnt_pos=pos + jpos, jnt_quat=quat, body_pos=-jpos,
                mass=mass, com=com, inertia=inertia,
                jnt_name=joint.get("name", f"{bname}_joint"),
                limits=(rng[0], rng[1]),
                damping=float(joint.get("damping", 0)),
                armature=float(joint.get("armature", 0)),
            )
        else:
            idx = b.add_body(bname, parent_idx, JOINT_FIXED, jnt_pos=pos,
                             jnt_quat=quat, mass=mass, com=com, inertia=inertia)
        for geom_el in el.findall("geom"):
            g = _parse_mjcf_geom(geom_el)
            if g is not None:
                b.add_geom(idx, g[0], g[1], pos=g[2], quat=g[3])
        for child in el.findall("body"):
            parse_body(child, idx)
        return idx

    for body_el in worldbody.findall("body"):
        parse_body(body_el, -1)
    return b.build()


def _parse_mjcf_geom(el):
    gtype = el.get("type", "sphere")
    pos = _floats(el.get("pos"), np.zeros(3))
    quat = _floats(el.get("quat"), np.array([1.0, 0, 0, 0]))
    size = _floats(el.get("size"), np.array([0.05]))
    if gtype == "sphere":
        return (GEOM_SPHERE, (float(size[0]),), pos, quat)
    if gtype == "box":
        return (GEOM_BOX, tuple(size[:3]), pos, quat)
    if gtype == "capsule":
        fromto = _floats(el.get("fromto"), None)
        if fromto is not None:
            a, bb = fromto[:3], fromto[3:]
            mid = (a + bb) / 2
            d = bb - a
            hl = np.linalg.norm(d) / 2
            # rotation aligning z to d
            z = np.array([0, 0, 1.0])
            dn = d / (np.linalg.norm(d) + 1e-12)
            v = np.cross(z, dn)
            s = np.linalg.norm(v)
            c = float(np.dot(z, dn))
            if s < 1e-9:
                quat_c = np.array([1.0, 0, 0, 0]) if c > 0 else np.array([0.0, 1, 0, 0])
            else:
                axis = v / s
                ang = np.arctan2(s, c)
                quat_c = np.concatenate([[np.cos(ang / 2)], axis * np.sin(ang / 2)])
            return (GEOM_CAPSULE, (float(size[0]), float(hl)), mid, quat_c)
        return (GEOM_CAPSULE, (float(size[0]), float(size[1])), pos, quat)
    if gtype == "cylinder":
        return (GEOM_CYLINDER, (float(size[0]), float(size[1])), pos, quat)
    if gtype == "plane":
        return None
    return None


def load_model_file(path: str, **kwargs) -> RobotModel:
    """Dispatch by extension (reference converter selection)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".urdf":
        return load_urdf(path, **kwargs)
    if ext in (".xml", ".mjcf"):
        return load_mjcf(path, **kwargs)
    raise ValueError(f"Unsupported model file: {path}")


def load_obj_mesh(path: str):
    """Minimal OBJ loader -> (verts (V,3) float32, tris (T,3) int32).

    The reference's MeshConverter turns OBJ/STL into USD for PhysX
    (sim/converters/mesh_converter.py); here meshes feed the native
    height-field rasterizer (isaaclab_tpu/native)."""
    import numpy as np

    verts, tris = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("f "):
                idx = [int(tok.split("/")[0]) - 1 for tok in line.split()[1:]]
                for k in range(1, len(idx) - 1):  # fan-triangulate
                    tris.append([idx[0], idx[k], idx[k + 1]])
    return (
        np.asarray(verts, dtype=np.float32),
        np.asarray(tris, dtype=np.int32),
    )


class MeshConverter:
    """API-parity shim over :func:`load_obj_mesh` + the native rasterizer
    (reference sim/converters/mesh_converter.py)."""

    def __init__(self, cfg=None):
        self.cfg = cfg

    @staticmethod
    def to_heightfield(path: str, resolution: float = 0.1):
        import numpy as np

        from ..native import rasterize_mesh_to_heightfield

        verts, tris = load_obj_mesh(path)
        min_xy = verts[:, :2].min(axis=0)
        max_xy = verts[:, :2].max(axis=0)
        rows = max(int(np.ceil((max_xy[0] - min_xy[0]) / resolution)), 2)
        cols = max(int(np.ceil((max_xy[1] - min_xy[1]) / resolution)), 2)
        return rasterize_mesh_to_heightfield(
            verts, tris, rows, cols, resolution,
            float(min_xy[0]), float(min_xy[1]), fill=float(verts[:, 2].min()),
        )
