"""Manipulation task family (reference manager_based/manipulation/)."""
from . import reach  # noqa: F401
