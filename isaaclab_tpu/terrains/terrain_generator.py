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


def _find_flat_patches(h, hs, size, patch_cfg, rng):
    """Rejection-sample ``num_patches`` flat patches on one sub-terrain
    height field (reference ``terrains/utils.py:find_flat_patches``, done
    here as a direct grid query instead of mesh ray-casts).

    A candidate is valid when every height sample within ``patch_radius``
    spans less than ``max_height_diff`` and the center height is inside
    ``z_range``. Returns (num_patches, 3) points in the SUB-TERRAIN frame
    (caller shifts into the merged-terrain frame); falls back to the cell
    center for any patch that could not be placed."""
    rows, cols = h.shape
    half = (size[0] / 2.0, size[1] / 2.0)
    pr = float(patch_cfg.patch_radius)
    # clamp the search window to the cell (keep the patch fully inside)
    x_lo = max(patch_cfg.x_range[0], -half[0] + pr)
    x_hi = min(patch_cfg.x_range[1], half[0] - pr)
    y_lo = max(patch_cfg.y_range[0], -half[1] + pr)
    y_hi = min(patch_cfg.y_range[1], half[1] - pr)
    n_want = int(patch_cfg.num_patches)
    found = []
    r_cells = max(int(np.ceil(pr / hs)), 1)
    for _attempt in range(20):
        if len(found) >= n_want:
            break
        cand = rng.uniform(
            [x_lo, y_lo], [max(x_hi, x_lo), max(y_hi, y_lo)],
            size=(4 * n_want, 2),
        )
        for x, y in cand:
            if len(found) >= n_want:
                break
            ci = int((x + half[0]) / hs)
            cj = int((y + half[1]) / hs)
            i0, i1 = max(ci - r_cells, 0), min(ci + r_cells + 1, rows)
            j0, j1 = max(cj - r_cells, 0), min(cj + r_cells + 1, cols)
            win = h[i0:i1, j0:j1]
            if win.size == 0:
                continue
            z = h[min(ci, rows - 1), min(cj, cols - 1)]
            if win.max() - win.min() > patch_cfg.max_height_diff:
                continue
            if not (patch_cfg.z_range[0] <= z <= patch_cfg.z_range[1]):
                continue
            found.append([x + half[0], y + half[1], float(z)])
    while len(found) < n_want:
        cr, cc = rows // 2, cols // 2
        found.append([half[0], half[1], float(h[cr, cc])])
    return np.asarray(found, dtype=np.float32)


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
        # key -> (R, C, num_patches, 3) valid spawn/target points, terrain frame
        self.flat_patches: dict = {}
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
                # flat-patch sampling (reference terrain_generator.py stores
                # per-cell patches keyed by intent, e.g. "target" consumed by
                # TerrainBasedPose2dCommand)
                for key, patch_cfg in (sub_cfg.flat_patch_sampling or {}).items():
                    pts = _find_flat_patches(
                        h, cfg.horizontal_scale, cfg.size, patch_cfg, rng
                    )
                    pts[:, 0] += r * cfg.size[0]
                    pts[:, 1] += c * cfg.size[1]
                    if key not in self.flat_patches:
                        self.flat_patches[key] = np.zeros(
                            (R, C, patch_cfg.num_patches, 3), dtype=np.float32
                        )
                        # cells without this key fall back to their origin
                        self.flat_patches[key][..., :] = np.nan
                    self.flat_patches[key][r, c] = pts

        # NaN-fill cells whose sub-terrain did not sample a key: use the cell
        # origin so consumers always get a finite target
        for key, arr in self.flat_patches.items():
            bad = np.isnan(arr[..., 0])
            if bad.any():
                rr, cc2, pp = np.nonzero(bad)
                arr[rr, cc2, pp] = self.origins[rr, cc2].astype(np.float32)

        self.num_rows = R
        self.num_cols = C
        self.sub_size = cfg.size
