"""Mesh-SDF narrowphase (physics/sdf.py + collision.py GEOM_MESH paths) —
the TPU recast of the reference factory tasks' PhysX SDF mesh collision
(reference ``direct/factory/factory_env.py`` + ``factory_tasks_cfg.py``
SDF-collided nut/bolt/peg USD meshes).

Analytic ground truth: SDF grids of procedural meshes are compared against
closed-form primitive SDFs; contact depths/normals against hand-computed
configurations.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from isaaclab_tpu.physics.sdf import (  # noqa: E402
    MeshData,
    annular_plate_mesh,
    bore_surface_points,
    box_mesh,
    build_mesh_sdf,
    cylinder_mesh,
    gear_with_bore_mesh,
    hex_nut_mesh,
    merge_meshes,
    primitive_surface_points,
    surface_points_from_mesh,
    threaded_shaft_mesh,
)


def _analytic_box_sdf(p, h):
    q = np.abs(p) - h
    outside = np.linalg.norm(np.maximum(q, 0), axis=-1)
    inside = np.minimum(np.max(q, axis=-1), 0)
    return outside + inside


def test_box_mesh_sdf_matches_analytic():
    h = np.array([0.1, 0.08, 0.06])
    V, F = box_mesh(h)
    sdf = build_mesh_sdf(V, F, spacing=0.01)
    # compare at grid nodes (no interpolation error there)
    nx, ny, nz, _ = sdf.packed.shape
    gx = sdf.origin[0] + sdf.spacing * np.arange(nx)
    gy = sdf.origin[1] + sdf.spacing * np.arange(ny)
    gz = sdf.origin[2] + sdf.spacing * np.arange(nz)
    P = np.stack(np.meshgrid(gx, gy, gz, indexing="ij"), -1)
    ref = _analytic_box_sdf(P, h)
    err = np.abs(sdf.packed[..., 0] - ref)
    assert err.max() < 1e-5


def test_sample_interpolated_distance_and_gradient():
    h = np.array([0.1, 0.1, 0.1])
    V, F = box_mesh(h)
    sdf = build_mesh_sdf(V, F, spacing=0.005)
    pts = jnp.array(
        [
            [0.0, 0.0, 0.0],      # center: dist ~ -0.1
            [0.0, 0.0, 0.0975],   # just inside top face
            [0.0, 0.0, 0.11],     # outside top face
        ]
    )
    d, g = jax.jit(sdf.sample)(pts)
    assert abs(float(d[0]) + 0.1) < 5e-3
    assert abs(float(d[1]) + 0.0025) < 1e-3
    assert abs(float(d[2]) - 0.01) < 1e-3
    # gradients point +z near the top face
    assert float(g[1][2]) > 0.95 and float(g[2][2]) > 0.95


def test_sample_outside_grid_clamps_exactly():
    V, F = box_mesh([0.05, 0.05, 0.05])
    sdf = build_mesh_sdf(V, F, spacing=0.01)
    # far outside the padded grid: clamp + offset keeps distance sane
    d, g = sdf.sample(jnp.array([[0.5, 0.0, 0.0]]))
    assert float(d[0]) > 0.3
    assert float(g[0][0]) > 0.9


def test_watertight_parity_on_axis_aligned_columns():
    """Regression: grid columns exactly on mesh edges used to flip
    inside/outside (the parity ray is now jittered)."""
    V, F = annular_plate_mesh(
        hole_radius=0.0095, outer_half=0.03, thickness=0.02, n=32
    )
    sdf = build_mesh_sdf(V, F, spacing=0.00075)
    d, _ = sdf.sample(
        jnp.array([[0.0, 0.0, 0.01], [0.02, 0.0, 0.01], [0.02, 0.02, 0.01]])
    )
    assert float(d[0]) > 0.009  # hole center: outside, ~hole radius
    assert float(d[1]) < -0.005  # solid annulus: inside
    assert float(d[2]) < -0.005


def test_peg_in_chamfered_socket_contacts():
    """Capsule peg vs socket-mesh SDF through the CollisionPlan: centered
    peg is contact-free at 1.5 mm clearance; 4 mm lateral offset gives
    2.5 mm penetration with a radial normal."""
    from isaaclab_tpu.physics.collision import CollisionPlan
    from isaaclab_tpu.physics.kinematics import forward_kinematics
    from isaaclab_tpu.physics.model import (
        GEOM_CAPSULE,
        GEOM_MESH,
        JOINT_FIXED,
        JOINT_FREE,
        ModelBuilder,
    )

    V, F = annular_plate_mesh(
        hole_radius=0.0095, outer_half=0.04, thickness=0.03, n=32
    )
    md = MeshData(V, F, sdf=build_mesh_sdf(V, F, spacing=0.00075))
    b = ModelBuilder("scene")
    peg = b.add_body("peg", -1, JOINT_FREE, mass=0.06, inertia=np.eye(3) * 1e-5)
    b.add_geom(peg, GEOM_CAPSULE, (0.008, 0.05), name="peg")
    sock = b.add_body("sock", -1, JOINT_FIXED, mass=1.0, inertia=np.eye(3) * 0.01)
    b.add_geom(sock, GEOM_MESH, (0.04, 0.04, 0.015), mesh=md, name="socket")
    m = b.build()
    plan = CollisionPlan(m, pairs=[(m.geoms[0], m.geoms[1])], with_ground=False)
    assert plan.ncon == primitive_surface_points(m.geoms[0]).shape[0]

    @jax.jit
    def depths(q):
        return plan.detect(forward_kinematics(m, q))

    def q_at(x_off):
        q = np.zeros(m.nq)
        q[0:3] = [x_off, 0.0, 0.07]
        q[3] = 1.0
        return jnp.asarray(q)

    con = depths(q_at(0.0))
    assert float(con.depth.max()) < 1e-4
    con = depths(q_at(0.004))
    i = int(np.argmax(con.depth))
    assert abs(float(con.depth[i]) - 0.0025) < 5e-4
    n = np.asarray(con.normal[i])
    assert n[0] < -0.95  # pushes the peg back toward the hole axis


def test_mesh_points_vs_primitive_box():
    """SDF-less mesh (hex nut) resting on a primitive box plate."""
    from isaaclab_tpu.physics.collision import CollisionPlan
    from isaaclab_tpu.physics.kinematics import forward_kinematics
    from isaaclab_tpu.physics.model import (
        GEOM_BOX,
        GEOM_MESH,
        JOINT_FIXED,
        JOINT_FREE,
        ModelBuilder,
    )

    V, F = hex_nut_mesh(flat_radius=0.012, hole_radius=0.009, thickness=0.008)
    md = MeshData(V, F)
    b = ModelBuilder("scene")
    nut = b.add_body("nut", -1, JOINT_FREE, mass=0.03, inertia=np.eye(3) * 1e-5)
    b.add_geom(nut, GEOM_MESH, (0.012, 0.012, 0.004), mesh=md, name="nut")
    plate = b.add_body("plate", -1, JOINT_FIXED, mass=1.0, inertia=np.eye(3) * 0.01)
    b.add_geom(plate, GEOM_BOX, (0.1, 0.1, 0.01), name="plate")
    m = b.build()
    plan = CollisionPlan(m, pairs=[(m.geoms[0], m.geoms[1])], with_ground=False)
    q = np.zeros(m.nq)
    q[0:3] = [0.0, 0.0, 0.013]  # nut bottom (z-0.004) 1mm into plate top (0.01)
    q[3] = 1.0
    con = jax.jit(lambda qq: plan.detect(forward_kinematics(m, qq)))(
        jnp.asarray(q)
    )
    d = float(con.depth.max())
    assert abs(d - 0.001) < 3e-4
    i = int(np.argmax(con.depth))
    assert float(con.normal[i][2]) > 0.95  # plate pushes the nut up


def test_nut_bore_rides_threaded_shaft():
    """Nut bore points vs ridged-bolt SDF: centered nut clears the crests;
    2 mm lateral offset penetrates crest-deep."""
    from isaaclab_tpu.physics.collision import CollisionPlan
    from isaaclab_tpu.physics.kinematics import forward_kinematics
    from isaaclab_tpu.physics.model import (
        GEOM_MESH,
        JOINT_FIXED,
        JOINT_FREE,
        ModelBuilder,
    )

    Vb, Fb = threaded_shaft_mesh(
        radius=0.008, half_length=0.0175, thread_depth=0.0012, pitch=0.002
    )
    bolt_md = MeshData(Vb, Fb, sdf=build_mesh_sdf(Vb, Fb, spacing=0.0005))
    Vn, Fn = hex_nut_mesh(flat_radius=0.012, hole_radius=0.0092, thickness=0.008)
    nut_md = MeshData(
        Vn, Fn, surface_points=bore_surface_points(0.0092, 0.004, n_ang=12)
    )
    b = ModelBuilder("scene")
    nut = b.add_body("nut", -1, JOINT_FREE, mass=0.03, inertia=np.eye(3) * 1e-5)
    b.add_geom(nut, GEOM_MESH, (0.012, 0.012, 0.004), mesh=nut_md, name="nut")
    bolt = b.add_body("bolt", -1, JOINT_FIXED, mass=1.0, inertia=np.eye(3) * 0.01)
    b.add_geom(bolt, GEOM_MESH, (0.008, 0.008, 0.0175), mesh=bolt_md, name="bolt")
    m = b.build()
    plan = CollisionPlan(m, pairs=[(m.geoms[0], m.geoms[1])], with_ground=False)
    assert plan.ncon == nut_md.surface_points.shape[0]

    @jax.jit
    def detect_q(q):
        return plan.detect(forward_kinematics(m, q))

    def detect_at(x):
        q = np.zeros(m.nq)
        q[0] = x
        q[3] = 1.0
        return detect_q(jnp.asarray(q))

    con = detect_at(0.0)
    assert float(con.depth.max()) < 1e-4  # 1.2mm crest clearance
    # 3.5 mm lateral: the bore wall is past the crests INTO the root
    # cylinder (0.0092-0.0035 < 0.0068) — solid penetration even after the
    # 0.5 mm voxel grid blurs the sharp crest rings
    con = detect_at(0.0035)
    assert float(con.depth.max()) > 7e-4


def test_surface_point_generators():
    V, F = gear_with_bore_mesh(0.01, 0.028, 0.035, teeth=16, thickness=0.016)
    pts = surface_points_from_mesh(V, F, n=32)
    assert pts.shape == (32, 3)
    r = np.linalg.norm(pts[:, :2], axis=1)
    assert r.max() > 0.03  # teeth sampled
    md = MeshData(V, F)
    assert md.bound_radius > 0.034
    ring = bore_surface_points(0.01, 0.004, n_ang=8)
    assert ring.shape == (24, 3)
    assert np.allclose(np.linalg.norm(ring[:, :2], axis=1), 0.01, atol=1e-6)


def test_merged_mesh_components_sign():
    """Disjoint watertight solids in one soup keep per-component signs."""
    V, F = merge_meshes([
        cylinder_mesh(0.01, 0.02) + ((0.0, 0.0, 0.0),),
        cylinder_mesh(0.01, 0.02) + ((0.05, 0.0, 0.0),),
    ])
    sdf = build_mesh_sdf(V, F, spacing=0.002)
    d, _ = sdf.sample(
        jnp.array([[0.0, 0.0, 0.0], [0.05, 0.0, 0.0], [0.025, 0.0, 0.0]])
    )
    assert float(d[0]) < -0.008
    assert float(d[1]) < -0.008
    assert float(d[2]) > 0.01


def test_mesh_ground_candidates_and_vmap():
    """Mesh geoms get ground probes; detect vmaps over a batch."""
    from isaaclab_tpu.physics.collision import CollisionPlan, num_ground_candidates
    from isaaclab_tpu.physics.kinematics import forward_kinematics
    from isaaclab_tpu.physics.model import GEOM_MESH, JOINT_FREE, ModelBuilder

    V, F = hex_nut_mesh(flat_radius=0.012, hole_radius=0.009, thickness=0.008)
    md = MeshData(V, F)
    b = ModelBuilder("scene")
    nut = b.add_body("nut", -1, JOINT_FREE, mass=0.03, inertia=np.eye(3) * 1e-5)
    b.add_geom(nut, GEOM_MESH, (0.012, 0.012, 0.004), mesh=md, name="nut")
    m = b.build()
    assert num_ground_candidates(m.geoms[0]) == 12
    plan = CollisionPlan(m, with_ground=True)
    q = np.tile(m.default_qpos(), (4, 1))
    q[:, 2] = [0.05, 0.003, 0.05, 0.001]
    con = jax.jit(
        jax.vmap(lambda qq: plan.detect(forward_kinematics(m, qq)))
    )(jnp.asarray(q))
    assert con.depth.shape == (4, plan.ncon)
    touching = np.asarray(con.depth.max(axis=1)) > 0
    assert list(touching) == [False, True, False, True]
