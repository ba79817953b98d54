"""Cross-cutting utilities (math, configclass, buffers, noise, modifiers)."""

from . import dict as dict_utils  # noqa: F401
from . import interpolation, math, modifiers, noise, string  # noqa: F401
from .buffers import CircularBuffer, DelayBuffer, TimestampedBuffer  # noqa: F401
from .configclass import configclass, is_configclass  # noqa: F401
from .timer import Timer, benchmark  # noqa: F401
