"""App launcher (reference ``isaaclab/app/``, SURVEY.md §2.1)."""

from .app_launcher import AppLauncher  # noqa: F401
