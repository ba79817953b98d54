"""Reusable MDP term library (reference ``envs/mdp/``, SURVEY.md §2.9)."""

from .actions import *  # noqa: F401,F403
from .commands import *  # noqa: F401,F403
from .curriculums import *  # noqa: F401,F403
from .events import *  # noqa: F401,F403
from .observations import *  # noqa: F401,F403
from .rewards import *  # noqa: F401,F403
from .terminations import *  # noqa: F401,F403
