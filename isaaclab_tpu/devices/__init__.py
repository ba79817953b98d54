"""Teleoperation devices (reference ``isaaclab/devices/``, SURVEY.md §2.15).

Host-side input devices. The TPU build is headless: the keyboard/spacemouse/
gamepad backends are replaced by a scriptable :class:`ReplayDevice` (feed
recorded or programmatic commands) plus a stdin keyboard fallback, keeping the
``advance() -> command`` contract the teleop scripts consume.
"""

from .device_base import DeviceBase  # noqa: F401
from .keyboard import Se2Keyboard, Se3Keyboard  # noqa: F401
from .replay import ReplayDevice  # noqa: F401
from .stream_devices import (  # noqa: F401
    Se2Gamepad,
    Se2SpaceMouse,
    Se3Gamepad,
    Se3SpaceMouse,
)
from .retargeter_base import RetargeterBase  # noqa: F401
from .hand_tracking import (  # noqa: F401
    HAND_JOINT_NAMES,
    GripperRetargeter,
    HandTrackingDevice,
    Se3AbsRetargeter,
    Se3RelRetargeter,
    TrackingTarget,
)
