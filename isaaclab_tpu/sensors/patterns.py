"""Ray-caster patterns (reference ``sensors/ray_caster/patterns/patterns.py:16-179``).

Each pattern function returns ``(ray_starts, ray_directions)`` as (N, 3)
host-side numpy arrays, baked as constants into the jitted raycast.
"""

from __future__ import annotations

from dataclasses import MISSING

import numpy as np

from ..utils.configclass import configclass


@configclass
class PatternBaseCfg:
    func: object = MISSING


@configclass
class GridPatternCfg(PatternBaseCfg):
    """Uniform XY grid of downward rays (height scanner)."""

    func: object = None
    resolution: float = 0.1
    size: tuple = (1.0, 1.0)
    direction: tuple = (0.0, 0.0, -1.0)
    ordering: str = "xy"

    def __post_init__(self):
        self.func = grid_pattern


def grid_pattern(cfg: GridPatternCfg):
    x = np.arange(-cfg.size[0] / 2, cfg.size[0] / 2 + 1e-9, cfg.resolution)
    y = np.arange(-cfg.size[1] / 2, cfg.size[1] / 2 + 1e-9, cfg.resolution)
    if cfg.ordering == "xy":
        gx, gy = np.meshgrid(x, y, indexing="xy")
    else:
        gx, gy = np.meshgrid(x, y, indexing="ij")
    starts = np.stack([gx.ravel(), gy.ravel(), np.zeros(gx.size)], axis=-1)
    dirs = np.tile(np.asarray(cfg.direction, dtype=np.float64), (gx.size, 1))
    return starts, dirs


@configclass
class PinholeCameraPatternCfg(PatternBaseCfg):
    """Pinhole ray fan for the ray-caster camera (reference patterns.py:71)."""

    func: object = None
    focal_length: float = 24.0  # mm
    horizontal_aperture: float = 20.955  # mm
    height: int = 64
    width: int = 64

    def __post_init__(self):
        self.func = pinhole_camera_pattern


def pinhole_camera_pattern(cfg: PinholeCameraPatternCfg):
    # intrinsics from focal length/aperture (reference convention)
    fx = cfg.width * cfg.focal_length / cfg.horizontal_aperture
    fy = fx
    cx, cy = cfg.width / 2, cfg.height / 2
    v, u = np.meshgrid(np.arange(cfg.height), np.arange(cfg.width), indexing="ij")
    x = (u - cx) / fx
    y = (v - cy) / fy
    # camera looks along +x (ROS/world convention used by the reference)
    dirs = np.stack([np.ones_like(x), -x, -y], axis=-1).reshape(-1, 3)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    starts = np.zeros_like(dirs)
    return starts, dirs


@configclass
class BpearlPatternCfg(PatternBaseCfg):
    """RS-Bpearl hemispherical lidar pattern (reference patterns.py:113;
    used by the fork's UAV lidar, lidarfly_cfg.py:397-404)."""

    func: object = None
    horizontal_fov: float = 360.0
    horizontal_res: float = 10.0
    vertical_ray_angles: tuple = (
        89.5, 86.6875, 83.875, 81.0625, 78.25, 75.4375, 72.625, 69.8125,
        67.0, 64.1875, 61.375, 58.5625, 55.75, 52.9375, 50.125, 47.3125,
        44.5, 41.6875, 38.875, 36.0625, 33.25, 30.4375, 27.625, 24.8125,
        22.0, 19.1875, 16.375, 13.5625, 10.75, 7.9375, 5.125, 2.3125,
    )

    def __post_init__(self):
        self.func = bpearl_pattern


def bpearl_pattern(cfg: BpearlPatternCfg):
    h_angles = np.deg2rad(
        np.arange(0.0, cfg.horizontal_fov, cfg.horizontal_res)
    )
    v_angles = np.deg2rad(np.asarray(cfg.vertical_ray_angles))
    h, v = np.meshgrid(h_angles, v_angles, indexing="xy")
    # rays over the lower hemisphere (sensor z-down convention like reference)
    x = np.cos(v) * np.cos(h)
    y = np.cos(v) * np.sin(h)
    z = -np.sin(v)
    dirs = np.stack([x.ravel(), y.ravel(), z.ravel()], axis=-1)
    starts = np.zeros_like(dirs)
    return starts, dirs


@configclass
class LidarPatternCfg(PatternBaseCfg):
    """Generic spinning lidar (reference patterns.py:149)."""

    func: object = None
    channels: int = 16
    vertical_fov_range: tuple = (-15.0, 15.0)
    horizontal_fov_range: tuple = (0.0, 360.0)
    horizontal_res: float = 1.0

    def __post_init__(self):
        self.func = lidar_pattern


def lidar_pattern(cfg: LidarPatternCfg):
    v = np.deg2rad(
        np.linspace(cfg.vertical_fov_range[0], cfg.vertical_fov_range[1], cfg.channels)
    )
    h = np.deg2rad(
        np.arange(cfg.horizontal_fov_range[0], cfg.horizontal_fov_range[1],
                  cfg.horizontal_res)
    )
    hh, vv = np.meshgrid(h, v, indexing="xy")
    dirs = np.stack(
        [np.cos(vv) * np.cos(hh), np.cos(vv) * np.sin(hh), np.sin(vv)], axis=-1
    ).reshape(-1, 3)
    starts = np.zeros_like(dirs)
    return starts, dirs
