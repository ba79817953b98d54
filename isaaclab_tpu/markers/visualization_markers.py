"""Marker facade (reference ``markers/visualization_markers.py``).

The reference batches debug prims through a ``UsdGeom.PointInstancer``; the
TPU build is headless, so ``visualize`` appends to a bounded in-memory log
(numpy) that offline tools can export.
"""

from __future__ import annotations

from dataclasses import MISSING

import numpy as np

from ..utils.configclass import configclass


@configclass
class VisualizationMarkersCfg:
    """Reference ``VisualizationMarkersCfg``: prim path + marker prototypes."""

    prim_path: str = MISSING
    markers: dict = {}


class VisualizationMarkers:
    """API-compatible no-op-ish marker sink with a retrievable history."""

    MAX_FRAMES = 64

    def __init__(self, cfg: VisualizationMarkersCfg):
        self.cfg = cfg
        self.num_prototypes = max(len(cfg.markers), 1)
        self._frames: list = []
        self._visible = True

    def set_visibility(self, visible: bool):
        self._visible = visible

    @property
    def is_visible(self) -> bool:
        return self._visible

    def visualize(self, translations=None, orientations=None, scales=None,
                  marker_indices=None):
        """Record one marker frame (reference signature)."""
        if not self._visible:
            return
        frame = {
            "translations": None if translations is None else np.asarray(translations),
            "orientations": None if orientations is None else np.asarray(orientations),
            "scales": None if scales is None else np.asarray(scales),
            "marker_indices": None if marker_indices is None else np.asarray(marker_indices),
        }
        self._frames.append(frame)
        if len(self._frames) > self.MAX_FRAMES:
            self._frames.pop(0)

    @property
    def frames(self) -> list:
        return self._frames
