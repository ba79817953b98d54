"""Visualization markers (reference ``isaaclab/markers/``, SURVEY.md §2.15).

No renderer on TPU: markers record their data to an in-memory log channel so
debug-vis call sites keep the reference API (``visualize(...)``) and tooling
can dump marker streams to disk for offline viewers.
"""

from .visualization_markers import (  # noqa: F401
    VisualizationMarkers,
    VisualizationMarkersCfg,
)
