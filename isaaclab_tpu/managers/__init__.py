"""MDP managers (reference ``isaaclab/managers/``, SURVEY.md §2.8)."""

from .action_manager import ActionManager, ActionManagerState, ActionTerm  # noqa: F401
from .command_manager import (  # noqa: F401
    CommandManager,
    CommandTerm,
    CommandTermState,
)
from .curriculum_manager import CurriculumManager  # noqa: F401
from .event_manager import EventManager, EventManagerState  # noqa: F401
from .manager_base import ManagerBase, ManagerTermBase  # noqa: F401
from .manager_term_cfg import (  # noqa: F401
    ActionTermCfg,
    CommandTermCfg,
    CurriculumTermCfg,
    EventTermCfg,
    ManagerTermBaseCfg,
    ObservationGroupCfg,
    ObservationTermCfg,
    RewardTermCfg,
    TerminationTermCfg,
)
from .observation_manager import ObservationManager, ObservationManagerState  # noqa: F401
from .recorder_manager import (  # noqa: F401
    DatasetExportMode,
    RecorderManager,
    RecorderManagerBaseCfg,
    RecorderTermCfg,
)
from .reward_manager import RewardManager, RewardManagerState  # noqa: F401
from .scene_entity_cfg import SceneEntityCfg  # noqa: F401
from .termination_manager import TerminationManager  # noqa: F401
