"""Headless manager telemetry (reference ``ui/widgets/manager_live_visualizer.
py:44`` ManagerLiveVisualizer): streams per-term manager values to JSONL for
offline plotting instead of drawing LiveLinePlots."""

from __future__ import annotations

import json
import os
import time


class ManagerLiveLogger:
    def __init__(self, path: str = "/tmp/isaaclab_tpu_live.jsonl",
                 flush_every: int = 50):
        self._path = path
        self._flush_every = flush_every
        self._buffer: list[str] = []
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def log(self, step: int, terms: dict):
        """``terms``: name -> scalar/array (host values)."""
        import numpy as np

        record = {"t": time.time(), "step": int(step)}
        for k, v in terms.items():
            arr = np.asarray(v)
            record[k] = float(arr.mean()) if arr.size else 0.0
        self._buffer.append(json.dumps(record))
        if len(self._buffer) >= self._flush_every:
            self.flush()

    def flush(self):
        if not self._buffer:
            return
        with open(self._path, "a") as f:
            f.write("\n".join(self._buffer) + "\n")
        self._buffer.clear()
