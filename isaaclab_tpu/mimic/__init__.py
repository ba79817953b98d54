"""MimicGen-style demo augmentation (reference ``source/isaaclab_mimic/``,
SURVEY.md §2.14). Host-side data tooling over HDF5 episode datasets."""

from .datagen import (  # noqa: F401
    DataGenerator,
    DataGenInfoPool,
    NearestNeighborObjectStrategy,
    RandomStrategy,
    SELECTION_STRATEGIES,
)
from .mimic_env import ManagerBasedRLMimicEnv, MimicEnvCfg, SubTaskConfig  # noqa: F401
