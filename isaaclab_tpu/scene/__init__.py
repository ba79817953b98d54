"""Interactive scene (reference ``isaaclab/scene/``, SURVEY.md §2.3)."""

from .interactive_scene import (  # noqa: F401
    InteractiveScene,
    InteractiveSceneCfg,
    SceneState,
)
