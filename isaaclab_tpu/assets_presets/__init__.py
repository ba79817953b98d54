"""Robot presets (reference ``source/isaaclab_assets/``, SURVEY.md §2.13).

Per-robot ``ArticulationCfg`` presets; models are built programmatically or
loaded from local URDF/MJCF (the reference points at Nucleus USDs).
"""

from .ant import ANT_CFG  # noqa: F401
from .anymal import ANYMAL_B_CFG, ANYMAL_C_CFG, ANYMAL_D_CFG  # noqa: F401
from .cassie import CASSIE_CFG  # noqa: F401
from .cartpole import CARTPOLE_CFG  # noqa: F401
from .franka import FRANKA_PANDA_CFG  # noqa: F401
from .humanoid import HUMANOID_CFG  # noqa: F401
from .quadcopter import CRAZYFLIE_CFG, UAVLIDAR_CFG  # noqa: F401
from .spot import SPOT_CFG  # noqa: F401
from .unitree import (  # noqa: F401
    G1_CFG,
    H1_CFG,
    UNITREE_A1_CFG,
    UNITREE_GO1_CFG,
    UNITREE_GO2_CFG,
)
from .universal_robots import UR10_CFG  # noqa: F401
from .allegro import ALLEGRO_HAND_CFG  # noqa: F401
from .kinova import (  # noqa: F401
    KINOVA_GEN3_N7_CFG,
    KINOVA_JACO2_N6S300_CFG,
    KINOVA_JACO2_N7S300_CFG,
)
from .sawyer import SAWYER_CFG  # noqa: F401
from .ridgeback_franka import RIDGEBACK_FRANKA_PANDA_CFG  # noqa: F401
