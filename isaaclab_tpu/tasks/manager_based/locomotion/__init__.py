"""Locomotion task family (reference manager_based/locomotion/)."""
from . import velocity  # noqa: F401
