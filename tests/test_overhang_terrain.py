"""Overhang (slab-layer) terrain — reference trimesh floating_ring_terrain
(``terrains/trimesh/mesh_terrains.py``), the geometry a plain height field
cannot represent. Covers: generator slab composition, raycast (vertical +
oblique march), and underside/top contact through the CollisionPlan."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from isaaclab_tpu.physics.collision import CollisionPlan, HeightField  # noqa: E402
from isaaclab_tpu.physics.kinematics import forward_kinematics  # noqa: E402
from isaaclab_tpu.physics.model import (  # noqa: E402
    GEOM_SPHERE,
    JOINT_FREE,
    ModelBuilder,
)
from isaaclab_tpu.sensors.ray_caster import raycast_height_field  # noqa: E402
from isaaclab_tpu.terrains.mesh_terrains import (  # noqa: E402
    MeshFloatingRingTerrainCfg,
    SLAB_EMPTY_HI,
    SLAB_EMPTY_LO,
    mesh_floating_ring_terrain,
)


def _ring_height_field():
    cfg = MeshFloatingRingTerrainCfg(
        size=(8.0, 8.0), horizontal_scale=0.1, vertical_scale=0.005,
        platform_width=2.0, ring_height_range=(0.6, 0.6),
        ring_width_range=(0.8, 0.8), ring_thickness=0.4,
    )
    h, slab = mesh_floating_ring_terrain(0.5, cfg)
    return HeightField(
        heights=jnp.asarray(h, jnp.float32),
        horizontal_scale=0.1,
        origin=jnp.zeros(2),
        slab=jnp.asarray(slab),
    )


def test_floating_ring_returns_slab():
    cfg = MeshFloatingRingTerrainCfg(
        size=(8.0, 8.0), horizontal_scale=0.1, vertical_scale=0.005,
        platform_width=2.0, ring_height_range=(0.6, 0.6),
        ring_width_range=(0.8, 0.8), ring_thickness=0.4,
    )
    h, slab = mesh_floating_ring_terrain(0.5, cfg)
    assert np.all(h == 0.0)  # ground stays flat — no phantom wall
    ring_cells = slab[..., 1] > slab[..., 0]
    assert ring_cells.any()
    assert np.allclose(slab[ring_cells][:, 0], 0.6)
    assert np.allclose(slab[ring_cells][:, 1], 1.0)
    assert np.all(slab[~ring_cells][:, 0] == SLAB_EMPTY_LO)
    assert np.all(slab[~ring_cells][:, 1] == SLAB_EMPTY_HI)


def test_generator_composes_slab_layer():
    from isaaclab_tpu.terrains.terrain_generator import (
        TerrainGenerator,
        TerrainGeneratorCfg,
    )
    from isaaclab_tpu.terrains.mesh_terrains import MeshPlaneTerrainCfg

    cfg = TerrainGeneratorCfg(
        size=(4.0, 4.0), num_rows=1, num_cols=2, horizontal_scale=0.1,
        vertical_scale=0.005, seed=1,
        sub_terrains={
            "ring": MeshFloatingRingTerrainCfg(
                proportion=0.5, platform_width=1.0,
                ring_height_range=(0.5, 0.5), ring_width_range=(0.5, 0.5),
                ring_thickness=0.3,
            ),
            "flat": MeshPlaneTerrainCfg(proportion=0.5),
        },
        curriculum=True,
    )
    gen = TerrainGenerator(cfg)
    assert gen.slabs is not None
    assert gen.slabs.shape == gen.heights.shape + (2,)
    assert (gen.slabs[..., 1] > gen.slabs[..., 0]).any()


def test_vertical_raycast_hits_ring_top_and_ground_through_gap():
    hf = _ring_height_field()
    # ring occupies max(|x-4|,|y-4|) in (1.5, 2.3) around the cell center —
    # the HeightField here uses absolute grid coords with origin (0,0), so
    # the ring in cell coords sits around (4, 4)
    starts = jnp.array([
        [4.0, 4.0, 3.0],   # above platform center -> ground (z=0)
        [4.0 + 1.9, 4.0, 3.0],  # above the ring -> ring top (z=1.0)
    ])
    dirs = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (2, 1))
    hits = raycast_height_field(
        starts, dirs, hf, jnp.zeros(3), max_distance=10.0,
        assume_vertical=True,
    )
    assert abs(float(hits[0, 2]) - 0.0) < 1e-3
    assert abs(float(hits[1, 2]) - 1.0) < 1e-3


def test_oblique_march_hits_ring_side():
    hf = _ring_height_field()
    # from the platform center, aim upward-outward through the ring band
    start = jnp.array([[4.0, 4.0, 0.3]])
    to = jnp.array([4.0 + 1.9, 4.0, 0.8])  # inside the ring slab
    d = to - start[0]
    d = d / jnp.linalg.norm(d)
    hits = raycast_height_field(
        start, d[None], hf, jnp.zeros(3), max_distance=10.0, num_steps=96,
    )
    # the hit lands on the ring's inner face region (between inner edge and
    # the target), not at max_distance
    assert float(jnp.linalg.norm(hits[0] - start[0])) < 3.0
    assert 0.55 < float(hits[0, 2]) < 1.05


def test_slab_contacts_underside_and_top():
    b = ModelBuilder("ball")
    body = b.add_body("ball", -1, JOINT_FREE, mass=1.0, inertia=np.eye(3) * 0.01)
    b.add_geom(body, GEOM_SPHERE, (0.1,), name="ball")
    m = b.build()
    plan = CollisionPlan(m, with_ground=True, with_overhang=True)
    assert plan.ncon == 2  # base probe + slab probe
    hf = _ring_height_field()

    @jax.jit
    def detect(q):
        return plan.detect(forward_kinematics(m, q), hf, jnp.zeros(3))

    ring_xy = 4.0 + 1.9

    def q_at(x, z):
        q = np.zeros(m.nq)
        q[0:3] = [x, 4.0, z]
        q[3] = 1.0
        return jnp.asarray(q)

    # jumping into the ring underside (slab z_lo=0.6): ball at z=0.55,
    # r=0.1 -> top at 0.65 penetrates 0.05
    con = detect(q_at(ring_xy, 0.55))
    i = int(np.argmax(con.depth))
    assert abs(float(con.depth[i]) - 0.05) < 1e-3
    assert float(con.normal[i][2]) < -0.95  # pushed DOWN off the underside
    # standing on the ring top (z_hi=1.0): ball at z=1.05 penetrates 0.05
    con = detect(q_at(ring_xy, 1.05))
    i = int(np.argmax(con.depth))
    assert abs(float(con.depth[i]) - 0.05) < 1e-3
    assert float(con.normal[i][2]) > 0.95
    # under the gap center: only the base-ground row is near
    con = detect(q_at(4.0, 0.05))
    i = int(np.argmax(con.depth))
    assert abs(float(con.depth[i]) - 0.05) < 1e-3
    assert float(con.normal[i][2]) > 0.95  # ground, not slab
