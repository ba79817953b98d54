"""Height-field sub-terrain generators.

TPU-native counterpart of the reference height-field terrains
(``terrains/height_field/hf_terrains.py:21-544``): same families
(random_uniform, pyramid_sloped, pyramid_stairs, discrete_obstacles, wave,
stepping_stones + the fork's wall variants) generated host-side with numpy;
runtime representation stays a height array (no trimesh conversion needed —
the engine consumes height fields directly, SURVEY.md §2.7).

Each function takes ``(difficulty in [0,1], cfg)`` and returns an (rows, cols)
float height array in meters.
"""

from __future__ import annotations

from dataclasses import MISSING

import numpy as np

from ..utils.configclass import configclass


@configclass
class FlatPatchSamplingCfg:
    """Flat-patch sampling knobs (reference terrain_generator_cfg.py:27
    ``FlatPatchSamplingCfg``): where robots/targets may spawn on a
    sub-terrain. Patches are found on the generated height field directly
    (reference ray-casts a warp mesh, ``terrains/utils.py:find_flat_patches``)."""

    num_patches: int = MISSING
    patch_radius: float = MISSING  # meters (single radius; list unsupported)
    x_range: tuple = (-1e6, 1e6)  # relative to sub-terrain center
    y_range: tuple = (-1e6, 1e6)
    z_range: tuple = (-1e6, 1e6)
    max_height_diff: float = MISSING


@configclass
class SubTerrainCfg:
    """Common sub-terrain knobs (reference hf_terrains_cfg.py)."""

    function: object = MISSING
    proportion: float = 1.0
    size: tuple = (8.0, 8.0)  # meters
    horizontal_scale: float = 0.1
    vertical_scale: float = 0.005
    slope_threshold: float = None
    platform_width: float = 1.0
    # name -> FlatPatchSamplingCfg (reference SubTerrainBaseCfg.flat_patch_sampling)
    flat_patch_sampling: dict = None


def _grid_shape(cfg):
    return (
        int(cfg.size[0] / cfg.horizontal_scale),
        int(cfg.size[1] / cfg.horizontal_scale),
    )


@configclass
class HfRandomUniformTerrainCfg(SubTerrainCfg):
    function: object = None
    noise_range: tuple = (-0.05, 0.05)
    noise_step: float = 0.005
    downsampled_scale: float = None

    def __post_init__(self):
        self.function = random_uniform_terrain


def random_uniform_terrain(difficulty, cfg, rng=None):
    """Reference hf_terrains.py:random_uniform_terrain."""
    rng = rng or np.random.default_rng(0)
    rows, cols = _grid_shape(cfg)
    ds = cfg.downsampled_scale or cfg.horizontal_scale
    dr = max(int(cfg.size[0] / ds), 2)
    dc = max(int(cfg.size[1] / ds), 2)
    lo, hi = cfg.noise_range
    steps = np.arange(lo, hi + 1e-9, cfg.noise_step)
    coarse = rng.choice(steps, size=(dr, dc))
    # bilinear upsample
    ri = np.linspace(0, dr - 1, rows)
    ci = np.linspace(0, dc - 1, cols)
    r0 = np.clip(ri.astype(int), 0, dr - 2)
    c0 = np.clip(ci.astype(int), 0, dc - 2)
    fr = (ri - r0)[:, None]
    fc = (ci - c0)[None, :]
    h = (
        coarse[r0][:, c0] * (1 - fr) * (1 - fc)
        + coarse[r0 + 1][:, c0] * fr * (1 - fc)
        + coarse[r0][:, c0 + 1] * (1 - fr) * fc
        + coarse[r0 + 1][:, c0 + 1] * fr * fc
    )
    return h * difficulty if difficulty is not None else h


@configclass
class HfPyramidSlopedTerrainCfg(SubTerrainCfg):
    function: object = None
    slope_range: tuple = (0.0, 0.4)
    inverted: bool = False

    def __post_init__(self):
        self.function = pyramid_sloped_terrain


def pyramid_sloped_terrain(difficulty, cfg, rng=None):
    """Reference hf_terrains.py:pyramid_sloped_terrain."""
    rows, cols = _grid_shape(cfg)
    slope = cfg.slope_range[0] + difficulty * (cfg.slope_range[1] - cfg.slope_range[0])
    if cfg.inverted:
        slope = -slope
    x = np.linspace(-1, 1, rows)[:, None]
    y = np.linspace(-1, 1, cols)[None, :]
    d = np.maximum(np.abs(x), np.abs(y))
    center = 1.0 - d
    h = slope * (cfg.size[0] / 2) * center
    # flat platform at center
    pw = cfg.platform_width / cfg.size[0]
    h = np.where(d < pw, slope * (cfg.size[0] / 2) * (1 - pw), h)
    return h


@configclass
class HfPyramidStairsTerrainCfg(SubTerrainCfg):
    function: object = None
    step_height_range: tuple = (0.05, 0.23)
    step_width: float = 0.3
    inverted: bool = False

    def __post_init__(self):
        self.function = pyramid_stairs_terrain


def pyramid_stairs_terrain(difficulty, cfg, rng=None):
    """Reference hf_terrains.py:pyramid_stairs_terrain."""
    rows, cols = _grid_shape(cfg)
    step_h = cfg.step_height_range[0] + difficulty * (
        cfg.step_height_range[1] - cfg.step_height_range[0]
    )
    if cfg.inverted:
        step_h = -step_h
    step_cells = max(int(cfg.step_width / cfg.horizontal_scale), 1)
    x = np.arange(rows)[:, None]
    y = np.arange(cols)[None, :]
    # ring index from border
    d = np.minimum(np.minimum(x, rows - 1 - x), np.minimum(y, cols - 1 - y))
    ring = d // step_cells
    platform_rings = max(int(cfg.platform_width / cfg.horizontal_scale / step_cells), 1)
    max_ring = (min(rows, cols) // 2) // step_cells - platform_rings
    ring = np.minimum(ring, max(max_ring, 0))
    return ring * step_h


@configclass
class HfDiscreteObstaclesTerrainCfg(SubTerrainCfg):
    function: object = None
    obstacle_height_mode: str = "choice"
    obstacle_width_range: tuple = (0.4, 1.0)
    obstacle_height_range: tuple = (0.05, 0.2)
    num_obstacles: int = 20
    with_wall: bool = False  # fork addition (hf_terrains.py wall variants)

    def __post_init__(self):
        self.function = discrete_obstacles_terrain


def discrete_obstacles_terrain(difficulty, cfg, rng=None):
    """Reference hf_terrains.py:discrete_obstacles_terrain (+fork wall)."""
    rng = rng or np.random.default_rng(0)
    rows, cols = _grid_shape(cfg)
    h_max = cfg.obstacle_height_range[0] + difficulty * (
        cfg.obstacle_height_range[1] - cfg.obstacle_height_range[0]
    )
    h = np.zeros((rows, cols))
    for _ in range(cfg.num_obstacles):
        w = rng.uniform(*cfg.obstacle_width_range)
        wc = max(int(w / cfg.horizontal_scale), 1)
        r = rng.integers(0, max(rows - wc, 1))
        c = rng.integers(0, max(cols - wc, 1))
        if cfg.obstacle_height_mode == "choice":
            hh = rng.choice([h_max, h_max / 2, h_max * 2])
        else:
            hh = rng.uniform(0.05, h_max)
        h[r : r + wc, c : c + wc] = hh
    if cfg.with_wall:
        wall_c = max(int(0.2 / cfg.horizontal_scale), 1)
        gap = max(int(1.0 / cfg.horizontal_scale), 1)
        mid = rows // 2
        h[mid : mid + wall_c, : cols // 2 - gap] = 2.0
        h[mid : mid + wall_c, cols // 2 + gap :] = 2.0
    # clear center platform
    pw = max(int(cfg.platform_width / cfg.horizontal_scale / 2), 1)
    h[rows // 2 - pw : rows // 2 + pw, cols // 2 - pw : cols // 2 + pw] = 0.0
    return h


@configclass
class HfWaveTerrainCfg(SubTerrainCfg):
    function: object = None
    amplitude_range: tuple = (0.0, 0.2)
    num_waves: int = 2

    def __post_init__(self):
        self.function = wave_terrain


def wave_terrain(difficulty, cfg, rng=None):
    """Reference hf_terrains.py:wave_terrain."""
    rows, cols = _grid_shape(cfg)
    amp = cfg.amplitude_range[0] + difficulty * (
        cfg.amplitude_range[1] - cfg.amplitude_range[0]
    )
    x = np.linspace(0, cfg.num_waves * 2 * np.pi, rows)[:, None]
    y = np.linspace(0, cfg.num_waves * 2 * np.pi, cols)[None, :]
    return amp * (np.sin(x) + np.cos(y)) / 2.0


@configclass
class HfSteppingStonesTerrainCfg(SubTerrainCfg):
    function: object = None
    stone_height_max: float = 0.0
    stone_width_range: tuple = (0.4, 1.0)
    stone_distance_range: tuple = (0.1, 0.4)
    holes_depth: float = -2.0

    def __post_init__(self):
        self.function = stepping_stones_terrain


def stepping_stones_terrain(difficulty, cfg, rng=None):
    """Reference hf_terrains.py:stepping_stones_terrain."""
    rng = rng or np.random.default_rng(0)
    rows, cols = _grid_shape(cfg)
    stone_w = cfg.stone_width_range[1] - difficulty * (
        cfg.stone_width_range[1] - cfg.stone_width_range[0]
    )
    dist = cfg.stone_distance_range[0] + difficulty * (
        cfg.stone_distance_range[1] - cfg.stone_distance_range[0]
    )
    wc = max(int(stone_w / cfg.horizontal_scale), 1)
    dc = max(int(dist / cfg.horizontal_scale), 1)
    h = np.full((rows, cols), cfg.holes_depth)
    r = 0
    while r < rows:
        c = int(rng.integers(0, dc + 1))
        while c < cols:
            h[r : r + wc, c : c + wc] = rng.uniform(0, cfg.stone_height_max)
            c += wc + dc
        r += wc + dc
    pw = max(int(cfg.platform_width / cfg.horizontal_scale / 2), 1)
    h[rows // 2 - pw : rows // 2 + pw, cols // 2 - pw : cols // 2 + pw] = 0.0
    return h


@configclass
class HfWallTerrainCfg(SubTerrainCfg):
    """Fork wall terrain (reference hf_terrains.py:544 wall_terrain): random
    rectangular walls, long edge along y, flat center platform."""

    function: object = None
    wall_height_range: tuple = (1.0, 2.0)
    wall_width_range: tuple = (0.1, 0.3)
    wall_length_range: tuple = (1.0, 5.0)
    num_walls: int = 6

    def __post_init__(self):
        self.function = wall_terrain


def _place_walls(h, cfg, rng, num_walls, wall_height):
    rows, cols = h.shape
    w_min = max(int(cfg.wall_width_range[0] / cfg.horizontal_scale), 1)
    w_max = max(int(cfg.wall_width_range[1] / cfg.horizontal_scale), w_min)
    l_min = max(int(cfg.wall_length_range[0] / cfg.horizontal_scale), 1)
    l_max = max(int(cfg.wall_length_range[1] / cfg.horizontal_scale), l_min)
    for _ in range(num_walls):
        ww = int(rng.integers(w_min, w_max + 1))
        wl = int(rng.integers(l_min, l_max + 1))
        if wl < ww:  # long edge always along y (fork semantics)
            ww, wl = wl, ww
        r = int(rng.integers(0, max(rows - ww, 1)))
        c = int(rng.integers(0, max(cols - wl, 1)))
        h[r : r + ww, c : c + wl] = wall_height
    return h


def wall_terrain(difficulty, cfg, rng=None):
    """Reference (fork) hf_terrains.py:544 wall_terrain."""
    rng = rng or np.random.default_rng(0)
    rows, cols = _grid_shape(cfg)
    wall_h = cfg.wall_height_range[0] + difficulty * (
        cfg.wall_height_range[1] - cfg.wall_height_range[0]
    )
    h = np.zeros((rows, cols))
    _place_walls(h, cfg, rng, cfg.num_walls, wall_h)
    pw = max(int(cfg.platform_width / cfg.horizontal_scale / 2), 1)
    h[rows // 2 - pw : rows // 2 + pw, cols // 2 - pw : cols // 2 + pw] = 0.0
    return h


@configclass
class HfDiscreteObstaclesWallTerrainCfg(SubTerrainCfg):
    """Fork obstacle-field terrain (reference hf_terrains.py:295
    discrete_obstacles_wall_terrain): min-distance-separated cuboids,
    cylinders, and walls — the UAV lidar obstacle course."""

    function: object = None
    obstacle_height_mode: str = "fixed"
    obstacle_width_range: tuple = (0.4, 1.2)
    obstacle_height_range: tuple = (1.0, 2.5)
    num_obstacles: int = 12
    num_cylinders: int = 4
    cylinder_radius_range: tuple = (0.2, 0.6)
    cylinder_height: float = None  # defaults to obstacle height
    wall_height_range: tuple = (1.0, 2.0)
    wall_width_range: tuple = (0.1, 0.3)
    wall_length_range: tuple = (1.0, 5.0)
    num_walls: int = 0

    def __post_init__(self):
        self.function = discrete_obstacles_wall_terrain


def discrete_obstacles_wall_terrain(difficulty, cfg, rng=None):
    """Reference (fork) hf_terrains.py:295 discrete_obstacles_wall_terrain."""
    rng = rng or np.random.default_rng(0)
    rows, cols = _grid_shape(cfg)
    h = np.zeros((rows, cols))
    obs_h = cfg.obstacle_height_range[0] + difficulty * (
        cfg.obstacle_height_range[1] - cfg.obstacle_height_range[0]
    )
    w_min = max(int(cfg.obstacle_width_range[0] / cfg.horizontal_scale), 1)
    w_max = max(int(cfg.obstacle_width_range[1] / cfg.horizontal_scale), w_min)
    min_dist = int(1.5 / cfg.horizontal_scale)

    # cuboids with a min centre-to-centre distance (rejection sampling,
    # bounded tries so degenerate cfgs cannot loop forever)
    centers, placed, tries = [], 0, 0
    while placed < cfg.num_obstacles and tries < cfg.num_obstacles * 30:
        tries += 1
        if cfg.obstacle_height_mode == "choice":
            hh = rng.choice([-obs_h, -obs_h / 2, obs_h / 2, obs_h])
        else:
            hh = obs_h
        ww = int(rng.integers(w_min, w_max + 1))
        wl = int(rng.integers(w_min, w_max + 1))
        if rows - ww <= 0 or cols - wl <= 0:
            continue
        r = int(rng.integers(0, rows - ww + 1))
        c = int(rng.integers(0, cols - wl + 1))
        ctr = (r + ww // 2, c + wl // 2)
        if any(
            abs(ctr[0] - p[0]) < min_dist and abs(ctr[1] - p[1]) < min_dist
            for p in centers
        ):
            continue
        h[r : r + ww, c : c + wl] = hh
        centers.append(ctr)
        placed += 1

    # cylinders
    cyl_h = cfg.cylinder_height if cfg.cylinder_height is not None else obs_h
    r_min = max(int(cfg.cylinder_radius_range[0] / cfg.horizontal_scale), 1)
    r_max = max(int(cfg.cylinder_radius_range[1] / cfg.horizontal_scale), r_min)
    rr, cc_grid = np.meshgrid(
        np.arange(rows), np.arange(cols), indexing="ij"
    )
    cyl_centers, placed, tries = [], 0, 0
    while placed < cfg.num_cylinders and tries < cfg.num_cylinders * 30:
        tries += 1
        rad = int(rng.integers(r_min, r_max + 1))
        if rows - 2 * rad <= 0 or cols - 2 * rad <= 0:
            continue
        r = int(rng.integers(rad, rows - rad))
        c = int(rng.integers(rad, cols - rad))
        if any(
            abs(r - p[0]) < min_dist and abs(c - p[1]) < min_dist
            for p in cyl_centers
        ):
            continue
        h[(rr - r) ** 2 + (cc_grid - c) ** 2 <= rad**2] = cyl_h
        cyl_centers.append((r, c))
        placed += 1

    # walls
    wall_h = cfg.wall_height_range[0] + difficulty * (
        cfg.wall_height_range[1] - cfg.wall_height_range[0]
    )
    _place_walls(h, cfg, rng, cfg.num_walls, wall_h)

    pw = max(int(cfg.platform_width / cfg.horizontal_scale / 2), 1)
    h[rows // 2 - pw : rows // 2 + pw, cols // 2 - pw : cols // 2 + pw] = 0.0
    return h


@configclass
class HfFlatTerrainCfg(SubTerrainCfg):
    function: object = None

    def __post_init__(self):
        self.function = flat_terrain


def flat_terrain(difficulty, cfg, rng=None):
    rows, cols = _grid_shape(cfg)
    return np.zeros((rows, cols))
