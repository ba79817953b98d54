"""Terrain generator (reference ``terrains/terrain_generator.py:96-333``).

Builds a (num_rows = difficulty levels) x (num_cols = terrain types) grid of
sub-terrains into ONE merged height-field array + per-cell origins. Host-side
numpy; the merged field uploads once as a device array.
"""

from __future__ import annotations

from dataclasses import MISSING

import numpy as np

from ..utils.configclass import configclass
from .height_field_terrains import SubTerrainCfg


@configclass
class TerrainGeneratorCfg:
    """Reference ``TerrainGeneratorCfg``."""

    seed: int = None
    size: tuple = (8.0, 8.0)  # per sub-terrain, meters
    border_width: float = 0.0
    border_height: float = 1.0
    num_rows: int = 1
    num_cols: int = 1
    horizontal_scale: float = 0.1
    vertical_scale: float = 0.005
    slope_threshold: float = 0.75
    sub_terrains: dict = MISSING  # name -> SubTerrainCfg
    difficulty_range: tuple = (0.0, 1.0)
    curriculum: bool = False
    use_cache: bool = False


class TerrainGenerator:
    """Generates the merged height field + flat-patch spawn origins."""

    def __init__(self, cfg: TerrainGeneratorCfg):
        self.cfg = cfg
        rng = np.random.default_rng(cfg.seed or 0)
        rows_per = int(cfg.size[0] / cfg.horizontal_scale)
        cols_per = int(cfg.size[1] / cfg.horizontal_scale)
        R, C = cfg.num_rows, cfg.num_cols

        self.heights = np.zeros((R * rows_per, C * cols_per))
        self.origins = np.zeros((R, C, 3))
        # overhang slab layer: allocated lazily when a sub-terrain returns
        # (heights, slab) — e.g. the floating ring (mesh_terrains.py)
        self.slabs = None

        # choose sub-terrain per column by proportion (reference behavior:
        # columns are types, rows are difficulty levels)
        names = list(cfg.sub_terrains.keys())
        props = np.array([cfg.sub_terrains[n].proportion for n in names])
        props = props / props.sum()
        col_choice = (
            rng.choice(len(names), size=C, p=props)
            if not cfg.curriculum
            else np.floor(np.linspace(0, len(names) - 1e-9, C)).astype(int)
        )

        for r in range(R):
            if cfg.curriculum:
                difficulty = (r + rng.uniform()) / R
                lo, hi = cfg.difficulty_range
                difficulty = lo + difficulty * (hi - lo)
            else:
                difficulty = rng.uniform(*cfg.difficulty_range)
            for c in range(C):
                sub_cfg = cfg.sub_terrains[names[col_choice[c]]]
                sub_cfg = sub_cfg.replace(
                    size=cfg.size,
                    horizontal_scale=cfg.horizontal_scale,
                    vertical_scale=cfg.vertical_scale,
                )
                h = sub_cfg.function(difficulty, sub_cfg, rng=rng)
                slab = None
                if isinstance(h, tuple):
                    h, slab = h
                rs = slice(r * rows_per, (r + 1) * rows_per)
                cs = slice(c * cols_per, (c + 1) * cols_per)
                self.heights[rs, cs] = h
                if slab is not None:
                    if self.slabs is None:
                        from .mesh_terrains import SLAB_EMPTY_HI, SLAB_EMPTY_LO

                        self.slabs = np.empty(
                            self.heights.shape + (2,), dtype=np.float32
                        )
                        self.slabs[..., 0] = SLAB_EMPTY_LO
                        self.slabs[..., 1] = SLAB_EMPTY_HI
                    self.slabs[rs, cs] = slab
                # origin at cell center, z = height there
                cr, cc = rows_per // 2, cols_per // 2
                self.origins[r, c] = [
                    (r + 0.5) * cfg.size[0],
                    (c + 0.5) * cfg.size[1],
                    h[cr, cc],
                ]

        self.num_rows = R
        self.num_cols = C
        self.sub_size = cfg.size
