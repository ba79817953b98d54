"""Sensor presets (reference ``isaaclab_assets/sensors/velodyne.py``)."""

from .sensors import RayCasterCfg
from .sensors.patterns import LidarPatternCfg

VELODYNE_VLP_16_RAYCASTER_CFG = RayCasterCfg(
    attach_yaw_only=False,
    pattern_cfg=LidarPatternCfg(
        channels=16,
        vertical_fov_range=(-15.0, 15.0),
        horizontal_fov_range=(-180.0, 180.0),
        horizontal_res=0.2,
    ),
    max_distance=100,
)
"""Velodyne Puck LiDAR (VLP-16) as a RayCasterCfg."""
