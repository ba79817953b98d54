"""UI widgets (reference ``isaaclab/ui/``, SURVEY.md §2.15).

Headless build: the live-plot widgets are replaced by
:class:`ManagerLiveLogger` — the same ``get_active_iterable_terms`` manager
API feeds a CSV/JSONL stream instead of an Omniverse window.
"""

from .manager_live_logger import ManagerLiveLogger  # noqa: F401
