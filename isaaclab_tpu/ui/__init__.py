"""UI widgets (reference ``isaaclab/ui/``, SURVEY.md §2.15).

Headless build: the omni.ui live plots become :class:`ManagerLiveVisualizer`
— the SAME ``get_active_iterable_terms`` manager data path, rendered as
terminal sparkline dashboards and JSONL streams instead of viewport widgets.
"""

from .manager_live_logger import ManagerLiveLogger  # noqa: F401
from .manager_live_visualizer import (  # noqa: F401
    EnvLiveVisualizer,
    LiveLinePlot,
    ManagerLiveVisualizer,
    ManagerLiveVisualizerCfg,
)
