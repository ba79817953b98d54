"""Visualization markers (reference ``isaaclab/markers/``, SURVEY.md §2.15).

No renderer on TPU: markers keep the reference instancer SEMANTICS
(prototypes, persistent instance buffers, partial updates, dynamic counts)
and replace the viewport with offline export — OBJ frames any mesh viewer
can replay, or an npz trace for notebooks.
"""

from .visualization_markers import (  # noqa: F401
    ArrowMarkerCfg,
    CuboidMarkerCfg,
    CylinderMarkerCfg,
    FrameMarkerCfg,
    SphereMarkerCfg,
    VisualizationMarkers,
    VisualizationMarkersCfg,
)
