"""Actuator models (reference ``isaaclab/actuators/``, SURVEY.md §2.5)."""

from .actuator_base import ActuatorBase, ActuatorBaseCfg, ActuatorState  # noqa: F401
from .actuator_net import ActuatorNetLSTMCfg, ActuatorNetMLPCfg  # noqa: F401
from .actuator_pd import (  # noqa: F401
    DCMotorCfg,
    DelayedPDActuatorCfg,
    IdealPDActuatorCfg,
    ImplicitActuatorCfg,
    RemotizedPDActuatorCfg,
)
