"""Manipulation task family (reference manager_based/manipulation/)."""
from . import lift, reach  # noqa: F401
