"""Manipulation task family (reference manager_based/manipulation/)."""
from . import cabinet, lift, reach  # noqa: F401
