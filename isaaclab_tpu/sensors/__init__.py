"""Sensors (reference ``isaaclab/sensors/``, SURVEY.md §2.6).

RTX render cameras are out of scope on TPU (no renderer); the
``RayCasterCamera`` serves depth/height sensing (SURVEY.md §2.6 TPU note).
"""

from . import patterns  # noqa: F401
from .contact_sensor import (  # noqa: F401
    ContactSensor,
    ContactSensorCfg,
    ContactSensorData,
    ContactSensorState,
)
from .frame_transformer import (  # noqa: F401
    FrameTransformer,
    FrameTransformerCfg,
    FrameTransformerFrameCfg,
)
from .imu import Imu, ImuCfg, ImuData  # noqa: F401
from .ray_caster import (  # noqa: F401
    RayCaster,
    RayCasterCfg,
    RayCasterData,
    RayCasterState,
    raycast_height_field,
)
from .ray_caster_camera import RayCasterCamera, RayCasterCameraCfg  # noqa: F401
from .sensor_base import SensorBase, SensorBaseCfg  # noqa: F401
from .tiled_camera import (  # noqa: F401
    Camera,
    CameraCfg,
    TiledCamera,
    TiledCameraCfg,
    TiledCameraData,
    TiledCameraOffsetCfg,
)
