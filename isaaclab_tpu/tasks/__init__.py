"""Task registry (reference ``source/isaaclab_tasks/``, SURVEY.md §2.12).

Uses gymnasium's registry with the reference's registration pattern:
``gym.register(id, entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
kwargs={"env_cfg_entry_point": <cls>, ...})``. Importing this package
recursively imports task modules so registrations fire (reference
``utils/importer.py``).
"""

from .utils import import_packages, load_cfg_from_registry, parse_env_cfg  # noqa: F401

# import task families to trigger gym.register calls
from . import manager_based  # noqa: F401
from . import direct  # noqa: F401
