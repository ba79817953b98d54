"""Live manager-term visualization (reference
``ui/widgets/manager_live_visualizer.py:44`` ManagerLiveVisualizer +
``LiveLinePlot``).

The reference draws omni.ui LiveLinePlots in the viewport; the TPU build is
headless, so the same data path — ``manager.get_active_iterable_terms(state,
env_idx)`` — feeds per-term ring-buffer histories that render as an ASCII
sparkline dashboard in the terminal and stream to JSONL for offline
plotting. ``EnvLiveVisualizer`` bundles one visualizer per manager of a
``ManagerBasedRLEnv`` (the reference wires this through the env window)."""

from __future__ import annotations

from dataclasses import MISSING

import numpy as np

from ..utils.configclass import configclass

_SPARK = "▁▂▃▄▅▆▇█"


class LiveLinePlot:
    """Ring-buffer history of one term's channels + sparkline rendering
    (the headless LiveLinePlot)."""

    def __init__(self, name: str, history: int = 128):
        self.name = name
        self._hist = history
        self._data: list[list[float]] = []

    def push(self, values):
        vals = [float(v) for v in np.asarray(values).reshape(-1)]
        self._data.append(vals)
        if len(self._data) > self._hist:
            self._data.pop(0)

    @property
    def series(self) -> np.ndarray:
        """(T, C) history array (ragged rows clipped to the min width)."""
        if not self._data:
            return np.zeros((0, 0))
        width = min(len(r) for r in self._data)
        return np.asarray([r[:width] for r in self._data])

    def sparkline(self, channel: int = 0, width: int = 48) -> str:
        s = self.series
        if s.size == 0 or channel >= s.shape[1]:
            return ""
        y = s[-width:, channel]
        lo, hi = float(y.min()), float(y.max())
        if hi - lo < 1e-12:
            return _SPARK[0] * len(y)
        q = np.clip(((y - lo) / (hi - lo) * (len(_SPARK) - 1)).astype(int),
                    0, len(_SPARK) - 1)
        return "".join(_SPARK[i] for i in q)


@configclass
class ManagerLiveVisualizerCfg:
    """Reference ``ManagerLiveVisualizerCfg`` (manager_live_visualizer.py:29)."""

    debug_vis: bool = False
    manager_name: str = MISSING
    # None = all terms; list filters by name
    term_names: list = None
    history: int = 128


class ManagerLiveVisualizer:
    """Pulls ``get_active_iterable_terms`` from one manager into per-term
    histories; renders sparklines / streams JSONL."""

    def __init__(self, manager, cfg: ManagerLiveVisualizerCfg = None):
        self._manager = manager
        self.cfg = cfg or ManagerLiveVisualizerCfg(manager_name="manager")
        self.debug_vis = self.cfg.debug_vis
        self._env_idx = 0
        self._plots: dict[str, LiveLinePlot] = {}
        if self.cfg.term_names is not None:
            missing = [
                t for t in self.cfg.term_names
                if t not in getattr(manager, "active_terms", [])
            ]
            if missing:
                raise ValueError(
                    f"terms {missing} not in manager "
                    f"'{self.cfg.manager_name}' (has: "
                    f"{getattr(manager, 'active_terms', [])})"
                )

    def set_env_selection(self, env_idx: int):
        """Reference API: which env the widget tracks."""
        self._env_idx = int(env_idx)

    def set_debug_vis(self, debug_vis: bool):
        self.debug_vis = debug_vis

    def update(self, state):
        """Pull one frame of term values from the manager state."""
        if not self.debug_vis:
            return
        for name, values in self._manager.get_active_iterable_terms(
            state, self._env_idx
        ):
            if self.cfg.term_names is not None and \
               name not in self.cfg.term_names:
                continue
            self._plots.setdefault(
                name, LiveLinePlot(name, self.cfg.history)
            ).push(values)

    @property
    def plots(self) -> dict:
        return self._plots

    def render(self, width: int = 48) -> str:
        """ASCII dashboard: one sparkline row per term channel 0."""
        lines = [f"== {self.cfg.manager_name} (env {self._env_idx}) =="]
        for name, plot in self._plots.items():
            s = plot.series
            last = f"{s[-1, 0]: .4g}" if s.size else "-"
            lines.append(
                f"{name[:28]:28s} {plot.sparkline(width=width)} {last}"
            )
        return "\n".join(lines)


class EnvLiveVisualizer:
    """One ManagerLiveVisualizer per manager of a ManagerBasedRLEnv
    (reference wires these into the env window; here: ``update(env_state)``
    each step, ``render()`` for the terminal, ``to_jsonl`` to stream)."""

    _MANAGER_STATE = {
        "action_manager": lambda s: s.actions,
        "reward_manager": lambda s: s.rewards,
        "command_manager": lambda s: s.commands,
        "curriculum_manager": lambda s: s.curriculum,
    }

    def __init__(self, env, managers=None, history: int = 128):
        self._env = env
        self.visualizers: dict[str, ManagerLiveVisualizer] = {}
        for name in managers or list(self._MANAGER_STATE):
            mgr = getattr(env, name, None)
            if mgr is None or not hasattr(mgr, "get_active_iterable_terms"):
                continue
            self.visualizers[name] = ManagerLiveVisualizer(
                mgr,
                ManagerLiveVisualizerCfg(
                    debug_vis=True, manager_name=name, history=history
                ),
            )

    def set_env_selection(self, env_idx: int):
        for v in self.visualizers.values():
            v.set_env_selection(env_idx)

    def update(self, env_state):
        for name, vis in self.visualizers.items():
            vis.update(self._MANAGER_STATE[name](env_state))

    def render(self, width: int = 48) -> str:
        return "\n\n".join(
            v.render(width) for v in self.visualizers.values()
        )

    def to_jsonl(self, path: str, step: int):
        """Append the latest values of every term to a JSONL stream."""
        from .manager_live_logger import ManagerLiveLogger

        logger = ManagerLiveLogger(path, flush_every=1)
        record = {}
        for mname, vis in self.visualizers.items():
            for tname, plot in vis.plots.items():
                s = plot.series
                if s.size:
                    record[f"{mname}/{tname}"] = s[-1, 0]
        logger.log(step, record)
        logger.flush()
