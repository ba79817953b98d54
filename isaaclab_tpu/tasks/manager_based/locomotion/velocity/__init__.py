"""Velocity-tracking locomotion tasks."""
from . import config  # noqa: F401
