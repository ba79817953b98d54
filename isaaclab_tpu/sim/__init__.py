"""Simulation core (reference ``isaaclab/sim/``, SURVEY.md §2.2)."""

from .converters import load_mjcf, load_model_file, load_urdf  # noqa: F401
from .simulation_cfg import (  # noqa: F401
    PhysxCfg,
    RenderCfg,
    RigidBodyMaterialCfg,
    SimulationCfg,
)
