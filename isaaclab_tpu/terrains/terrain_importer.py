"""Terrain importer (reference ``terrains/terrain_importer.py``).

Owns the device-resident height field + per-env terrain-cell assignment.
TPU twist (see scene module docstring): robots stay near the world origin —
``env_offsets`` shift the *terrain queries* per env instead of spawning robots
across a giant shared stage, keeping fp32 coordinates small. Curriculum moves
an env between difficulty rows by changing its offset (reference
``terrain_levels_vel`` curriculum semantics).
"""

from __future__ import annotations

from dataclasses import MISSING

import jax.numpy as jnp
import numpy as np

from ..physics.collision import HeightField
from ..utils.configclass import configclass
from .terrain_generator import TerrainGenerator, TerrainGeneratorCfg


@configclass
class TerrainImporterCfg:
    """Reference ``TerrainImporterCfg``."""

    terrain_type: str = "plane"  # "plane" | "generator" | "mesh"
    terrain_generator: TerrainGeneratorCfg = None
    max_init_terrain_level: int = None
    env_spacing: float = 2.0
    physics_material: object = None
    visual_material: object = None
    debug_vis: bool = False
    # terrain_type == "mesh": OBJ file rasterized to the runtime height field
    # (reference imports USD meshes + Warp BVH; SURVEY.md §2.7 TPU note)
    mesh_path: str = None
    mesh_resolution: float = 0.1


def _pack_height_normals(heights, hs):
    """Host-side (rows, cols, 4) [h, nx, ny, nz] grid: central-difference
    normals baked at build time so runtime queries need one packed bilinear
    fetch instead of five scalar samples."""
    h = np.asarray(heights, dtype=np.float32)
    gx = np.gradient(h, hs, axis=0)
    gy = np.gradient(h, hs, axis=1)
    n = np.stack([-gx, -gy, np.ones_like(h)], axis=-1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    return np.concatenate([h[..., None], n], axis=-1).astype(np.float32)


class TerrainImporter:
    def __init__(self, cfg: TerrainImporterCfg, num_envs: int):
        self.cfg = cfg
        self.num_envs = num_envs

        if cfg.terrain_type == "mesh" and cfg.mesh_path:
            from ..sim.converters import load_obj_mesh
            from ..native import rasterize_mesh_to_heightfield

            verts, tris = load_obj_mesh(cfg.mesh_path)
            min_xy = verts[:, :2].min(axis=0)
            max_xy = verts[:, :2].max(axis=0)
            hs = float(cfg.mesh_resolution)
            rows = max(int(np.ceil((max_xy[0] - min_xy[0]) / hs)), 2)
            cols = max(int(np.ceil((max_xy[1] - min_xy[1]) / hs)), 2)
            hf = rasterize_mesh_to_heightfield(
                verts, tris, rows, cols, hs,
                float(min_xy[0]), float(min_xy[1]),
                fill=float(verts[:, 2].min()),
            )
            self.generator = None
            from ..physics.collision import pack_corner_channels, pack_corner_heights

            self.height_field = HeightField(
                heights=np.asarray(hf, dtype=np.float32),
                horizontal_scale=hs,
                origin=np.asarray(min_xy, dtype=np.float32),
                packed=_pack_height_normals(hf, hs),
                corners=pack_corner_heights(hf),
                packed_corners=pack_corner_channels(_pack_height_normals(hf, hs)),
            )
            center = (min_xy + max_xy) / 2
            self.env_offsets = np.tile(
                np.asarray([center[0], center[1], 0.0], dtype=np.float32),
                (num_envs, 1),
            )
            self.env_origins = np.zeros((num_envs, 3), dtype=np.float32)
            self.terrain_levels = np.zeros(num_envs, dtype=np.int32)
            self.terrain_types = np.zeros(num_envs, dtype=np.int32)
            self.max_terrain_level = 1
            return

        if cfg.terrain_type == "plane" or cfg.terrain_generator is None:
            # host numpy: these become trace-time constants in jitted code
            self.height_field = None
            self.generator = None
            self.env_offsets = np.zeros((num_envs, 3), dtype=np.float32)
            self.env_origins = np.zeros((num_envs, 3), dtype=np.float32)
            self.terrain_levels = np.zeros(num_envs, dtype=np.int32)
            self.terrain_types = np.zeros(num_envs, dtype=np.int32)
            self.max_terrain_level = 1
            return

        gen = TerrainGenerator(cfg.terrain_generator)
        self.generator = gen
        from ..physics.collision import pack_corner_channels, pack_corner_heights

        self.height_field = HeightField(
            heights=np.asarray(gen.heights, dtype=np.float32),
            horizontal_scale=float(cfg.terrain_generator.horizontal_scale),
            origin=np.zeros(2, dtype=np.float32),
            packed=_pack_height_normals(
                gen.heights, float(cfg.terrain_generator.horizontal_scale)
            ),
            corners=pack_corner_heights(gen.heights),
            packed_corners=pack_corner_channels(_pack_height_normals(
                gen.heights, float(cfg.terrain_generator.horizontal_scale)
            )),
            # overhang slabs (floating-ring family): [z_lo, z_hi] per cell
            slab=(
                np.asarray(gen.slabs, dtype=np.float32)
                if gen.slabs is not None else None
            ),
        )
        self._cell_origins = np.asarray(gen.origins, dtype=np.float32)  # (R, C, 3)
        self.max_terrain_level = gen.num_rows
        # initial assignment: random level up to max_init (reference
        # terrain_importer env origin assignment)
        rng = np.random.default_rng(cfg.terrain_generator.seed or 0)
        max_lvl = (
            cfg.max_init_terrain_level
            if cfg.max_init_terrain_level is not None
            else gen.num_rows
        )
        levels = rng.integers(0, max(min(max_lvl, gen.num_rows), 1), size=num_envs)
        types = np.arange(num_envs) % gen.num_cols
        self.terrain_levels = levels.astype(np.int32)
        self.terrain_types = types.astype(np.int32)
        self.env_offsets = np.asarray(
            self._cell_origins[self.terrain_levels, self.terrain_types]
        )
        self.env_origins = np.zeros((num_envs, 3), dtype=np.float32)

    # ------------------------------------------------------------------
    @property
    def flat_patches(self) -> dict:
        """key -> (rows, cols, num_patches, 3) valid points in the terrain
        frame (reference terrain_importer.py:125)."""
        if self.generator is None:
            return {}
        return self.generator.flat_patches

    def _offsets_for(self, levels, types):
        return jnp.asarray(self._cell_origins)[levels, types]

    def update_env_levels(self, levels, types=None):
        """Curriculum hook: returns new (E, 3) terrain offsets for the given
        per-env difficulty levels. The caller stores them in env state."""
        types = jnp.asarray(types if types is not None else self.terrain_types)
        levels = jnp.clip(levels, 0, self.max_terrain_level - 1)
        return self._offsets_for(levels.astype(jnp.int32), types)

    def sample_height(self, xy_local, env_offset):
        """Terrain height under env-local xy (env's cell offset applied)."""
        if self.height_field is None:
            return jnp.zeros(xy_local.shape[:-1])
        return (
            self.height_field.sample(xy_local + env_offset[..., :2])
            - env_offset[..., 2]
        )
