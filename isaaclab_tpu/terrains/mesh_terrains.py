"""Trimesh terrain family (reference ``terrains/trimesh/mesh_terrains.py:23-721``).

The reference emits triangle meshes; the TPU runtime representation is a
height field (SURVEY.md §2.7 TPU note), so each generator rasterizes the same
shape directly onto the grid. True overhangs (round 4) ride an OVERHANG SLAB
layer: a generator may return ``(heights, slab)`` where slab is
(rows, cols, 2) [z_lo, z_hi] of solid suspended above the base surface —
the floating ring is the reference case (its underside and top are both
real surfaces for raycast and contact; collision.HeightField.slab).

All functions share the height-field convention:
``f(difficulty, cfg, rng) -> (rows, cols) float heights [m]`` or
``-> (heights, slab)``.
"""

from __future__ import annotations

from dataclasses import MISSING

import numpy as np

from ..utils.configclass import configclass
from .height_field_terrains import (
    HfPyramidStairsTerrainCfg,
    SubTerrainCfg,
    _grid_shape,
    pyramid_stairs_terrain,
)


# empty-slab sentinels: nothing ever hits [+BIG, -BIG]
SLAB_EMPTY_LO = 1e6
SLAB_EMPTY_HI = -1e6


def _xy_grids(cfg):
    rows, cols = _grid_shape(cfg)
    x = (np.arange(rows) + 0.5) * cfg.horizontal_scale - cfg.size[0] / 2
    y = (np.arange(cols) + 0.5) * cfg.horizontal_scale - cfg.size[1] / 2
    return rows, cols, x[:, None], y[None, :]


# ---------------------------------------------------------------------------


@configclass
class MeshPlaneTerrainCfg(SubTerrainCfg):
    """Reference mesh_terrains.py:flat_terrain."""

    function: object = None

    def __post_init__(self):
        self.function = mesh_plane_terrain


def mesh_plane_terrain(difficulty, cfg, rng=None):
    rows, cols = _grid_shape(cfg)
    return np.zeros((rows, cols))


@configclass
class MeshPyramidStairsTerrainCfg(HfPyramidStairsTerrainCfg):
    """Reference mesh_terrains.py:pyramid_stairs_terrain (+inverted):
    identical surface as the height-field variant here."""

    border_width: float = 0.0
    holes: bool = False


@configclass
class MeshRandomGridTerrainCfg(SubTerrainCfg):
    """Reference mesh_terrains.py:random_grid_terrain."""

    function: object = None
    grid_width: float = 0.45
    grid_height_range: tuple = (0.05, 0.2)
    holes: bool = False

    def __post_init__(self):
        self.function = mesh_random_grid_terrain


def mesh_random_grid_terrain(difficulty, cfg, rng=None):
    rng = rng or np.random.default_rng(0)
    rows, cols = _grid_shape(cfg)
    gh = cfg.grid_height_range[0] + difficulty * (
        cfg.grid_height_range[1] - cfg.grid_height_range[0]
    )
    cell = max(int(cfg.grid_width / cfg.horizontal_scale), 1)
    nr, nc = rows // cell + 1, cols // cell + 1
    cells = rng.uniform(-gh, gh, size=(nr, nc))
    h = np.repeat(np.repeat(cells, cell, axis=0), cell, axis=1)[:rows, :cols]
    # flat spawn platform in the center
    _, _, x, y = _xy_grids(cfg)
    mask = np.maximum(np.abs(x), np.abs(y)) < cfg.platform_width / 2
    return np.where(mask, 0.0, h)


@configclass
class MeshRailsTerrainCfg(SubTerrainCfg):
    """Reference mesh_terrains.py:rails_terrain: two concentric rail rings."""

    function: object = None
    rail_thickness_range: tuple = (0.05, 0.1)
    rail_height_range: tuple = (0.05, 0.3)

    def __post_init__(self):
        self.function = mesh_rails_terrain


def mesh_rails_terrain(difficulty, cfg, rng=None):
    _, _, x, y = _xy_grids(cfg)
    t = cfg.rail_thickness_range[0] + difficulty * (
        cfg.rail_thickness_range[1] - cfg.rail_thickness_range[0]
    )
    hh = cfg.rail_height_range[0] + difficulty * (
        cfg.rail_height_range[1] - cfg.rail_height_range[0]
    )
    d = np.maximum(np.abs(x), np.abs(y))
    r1 = cfg.platform_width / 2 + 0.5
    r2 = r1 + 1.0
    ring1 = (d > r1) & (d < r1 + t)
    ring2 = (d > r2) & (d < r2 + t)
    return np.where(ring1 | ring2, hh, 0.0)


@configclass
class MeshPitTerrainCfg(SubTerrainCfg):
    """Reference mesh_terrains.py:pit_terrain (+double pit)."""

    function: object = None
    pit_depth_range: tuple = (0.05, 0.3)
    double_pit: bool = False

    def __post_init__(self):
        self.function = mesh_pit_terrain


def mesh_pit_terrain(difficulty, cfg, rng=None):
    _, _, x, y = _xy_grids(cfg)
    depth = cfg.pit_depth_range[0] + difficulty * (
        cfg.pit_depth_range[1] - cfg.pit_depth_range[0]
    )
    d = np.maximum(np.abs(x), np.abs(y))
    h = np.zeros_like(d)
    pit_r = cfg.size[0] / 2 - 1.0
    h = np.where(d < pit_r, -depth, h)
    if cfg.double_pit:
        h = np.where(d < pit_r / 2, -2.0 * depth, h)
    # spawn platform at pit depth center
    h = np.where(d < cfg.platform_width / 2, -depth * (2.0 if cfg.double_pit else 1.0), h)
    return h


@configclass
class MeshBoxTerrainCfg(SubTerrainCfg):
    """Reference mesh_terrains.py:box_terrain (+double box)."""

    function: object = None
    box_height_range: tuple = (0.05, 0.3)
    double_box: bool = False

    def __post_init__(self):
        self.function = mesh_box_terrain


def mesh_box_terrain(difficulty, cfg, rng=None):
    _, _, x, y = _xy_grids(cfg)
    hh = cfg.box_height_range[0] + difficulty * (
        cfg.box_height_range[1] - cfg.box_height_range[0]
    )
    d = np.maximum(np.abs(x), np.abs(y))
    h = np.zeros_like(d)
    box_r = cfg.size[0] / 4
    h = np.where(d < box_r, hh, h)
    if cfg.double_box:
        h = np.where(d < box_r / 2, 2.0 * hh, h)
    return h


@configclass
class MeshGapTerrainCfg(SubTerrainCfg):
    """Reference mesh_terrains.py:gap_terrain: a deep ring gap around the
    spawn platform."""

    function: object = None
    gap_width_range: tuple = (0.05, 1.1)

    def __post_init__(self):
        self.function = mesh_gap_terrain


def mesh_gap_terrain(difficulty, cfg, rng=None):
    _, _, x, y = _xy_grids(cfg)
    gw = cfg.gap_width_range[0] + difficulty * (
        cfg.gap_width_range[1] - cfg.gap_width_range[0]
    )
    d = np.maximum(np.abs(x), np.abs(y))
    r = cfg.platform_width / 2
    gap = (d > r) & (d < r + gw)
    return np.where(gap, -2.0, 0.0)


@configclass
class MeshFloatingRingTerrainCfg(SubTerrainCfg):
    """Reference mesh_terrains.py:floating_ring_terrain — a ring SUSPENDED
    above flat ground (true overhang). Represented as flat base heights plus
    an overhang slab layer (HeightField.slab [z_lo, z_hi]); the robot walks
    UNDER the ring, the height scanner sees ground through the gap, and the
    ring underside/top are real contact surfaces (collision.py
    with_overhang)."""

    function: object = None
    ring_width_range: tuple = (0.5, 1.0)
    ring_height_range: tuple = (0.4, 1.0)
    ring_thickness: float = 0.5

    def __post_init__(self):
        self.function = mesh_floating_ring_terrain


def mesh_floating_ring_terrain(difficulty, cfg, rng=None):
    _, _, x, y = _xy_grids(cfg)
    w = cfg.ring_width_range[0] + difficulty * (
        cfg.ring_width_range[1] - cfg.ring_width_range[0]
    )
    hh = cfg.ring_height_range[0] + difficulty * (
        cfg.ring_height_range[1] - cfg.ring_height_range[0]
    )
    d = np.maximum(np.abs(x), np.abs(y))
    r = cfg.platform_width / 2 + 0.5
    ring = (d > r) & (d < r + w)
    shape = np.broadcast_shapes(x.shape, y.shape)
    heights = np.zeros(shape)
    slab = np.empty(shape + (2,), dtype=np.float32)
    slab[..., 0] = np.where(ring, hh, SLAB_EMPTY_LO)
    slab[..., 1] = np.where(ring, hh + cfg.ring_thickness, SLAB_EMPTY_HI)
    return heights, slab


@configclass
class MeshStarTerrainCfg(SubTerrainCfg):
    """Reference mesh_terrains.py:star_terrain: N raised bars through center."""

    function: object = None
    num_bars: int = 6
    bar_width_range: tuple = (0.1, 0.5)
    bar_height_range: tuple = (0.05, 0.3)

    def __post_init__(self):
        self.function = mesh_star_terrain


def mesh_star_terrain(difficulty, cfg, rng=None):
    _, _, x, y = _xy_grids(cfg)
    bw = cfg.bar_width_range[0] + difficulty * (
        cfg.bar_width_range[1] - cfg.bar_width_range[0]
    )
    bh = cfg.bar_height_range[0] + difficulty * (
        cfg.bar_height_range[1] - cfg.bar_height_range[0]
    )
    h = np.zeros(np.broadcast_shapes(x.shape, y.shape))
    for i in range(cfg.num_bars):
        ang = np.pi * i / cfg.num_bars
        # distance from line through origin with direction (cos, sin)
        dist = np.abs(-np.sin(ang) * x + np.cos(ang) * y)
        h = np.where(dist < bw / 2, bh, h)
    d = np.maximum(np.abs(x), np.abs(y))
    return np.where(d < cfg.platform_width / 2, bh, h)


@configclass
class MeshRepeatedObjectsTerrainCfg(SubTerrainCfg):
    """Reference mesh_terrains.py:repeated_objects_terrain family
    (pyramids / boxes / cylinders scattered over the cell)."""

    function: object = None
    object_type: str = "box"  # box | pyramid | cylinder
    num_objects: tuple = (4, 8)  # (min at difficulty 0, max at 1)
    height_range: tuple = (0.05, 0.3)
    width_range: tuple = (0.4, 1.0)

    def __post_init__(self):
        self.function = mesh_repeated_objects_terrain


def mesh_repeated_objects_terrain(difficulty, cfg, rng=None):
    rng = rng or np.random.default_rng(0)
    rows, cols, x, y = _xy_grids(cfg)
    n = int(round(cfg.num_objects[0] + difficulty * (
        cfg.num_objects[1] - cfg.num_objects[0]
    )))
    oh = cfg.height_range[0] + difficulty * (
        cfg.height_range[1] - cfg.height_range[0]
    )
    h = np.zeros((rows, cols))
    half = cfg.size[0] / 2 - 1.0
    for _ in range(n):
        cx, cy = rng.uniform(-half, half, size=2)
        w = rng.uniform(*cfg.width_range) / 2
        if cfg.object_type == "box":
            mask_h = np.where(
                (np.abs(x - cx) < w) & (np.abs(y - cy) < w), oh, 0.0
            )
        elif cfg.object_type == "pyramid":
            d = np.maximum(np.abs(x - cx), np.abs(y - cy))
            mask_h = np.clip(oh * (1 - d / w), 0.0, None)
        else:  # cylinder
            d = np.sqrt((x - cx) ** 2 + (y - cy) ** 2)
            mask_h = np.where(d < w, oh, 0.0)
        h = np.maximum(h, mask_h)
    d = np.maximum(np.abs(x), np.abs(y))
    return np.where(d < cfg.platform_width / 2, 0.0, h)


@configclass
class MeshRepeatedPyramidsTerrainCfg(MeshRepeatedObjectsTerrainCfg):
    object_type: str = "pyramid"


@configclass
class MeshRepeatedBoxesTerrainCfg(MeshRepeatedObjectsTerrainCfg):
    object_type: str = "box"


@configclass
class MeshRepeatedCylindersTerrainCfg(MeshRepeatedObjectsTerrainCfg):
    object_type: str = "cylinder"
