"""Manipulation task family (reference manager_based/manipulation/)."""
from . import cabinet, inhand, lift, pick_place, reach, stack  # noqa: F401
