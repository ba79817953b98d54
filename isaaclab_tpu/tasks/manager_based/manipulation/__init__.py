"""Manipulation task family (reference manager_based/manipulation/)."""
from . import cabinet, lift, reach, stack  # noqa: F401
