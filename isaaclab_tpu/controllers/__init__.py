"""Task-space controllers (reference ``isaaclab/controllers/``)."""

from .differential_ik import (  # noqa: F401
    DifferentialIKController,
    DifferentialIKControllerCfg,
)
from .joint_impedance import (  # noqa: F401
    JointImpedanceController,
    JointImpedanceControllerCfg,
)
from .operational_space import (  # noqa: F401
    OperationalSpaceController,
    OperationalSpaceControllerCfg,
)
from .pink_ik import (  # noqa: F401
    FrameTaskCfg,
    PinkIKController,
    PinkIKControllerCfg,
)
from .rmp_flow import (  # noqa: F401
    RmpFlowController,
    RmpFlowControllerCfg,
    RmpFlowSmoothedController,
)
