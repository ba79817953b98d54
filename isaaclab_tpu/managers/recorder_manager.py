"""Recorder manager (reference ``managers/recorder_manager.py``).

Episode recording to HDF5 datasets. Host-side by design: device state is
pulled once per env step (small arrays) and appended to per-env episode
buffers; export modes mirror the reference ``DatasetExportMode``
(recorder_manager.py:27).
"""

from __future__ import annotations

import enum
import os
from dataclasses import MISSING

import numpy as np

from ..utils.configclass import configclass


class DatasetExportMode(enum.IntEnum):
    EXPORT_NONE = 0
    EXPORT_ALL = 1
    EXPORT_SUCCEEDED_ONLY = 2
    EXPORT_SUCCEEDED_FAILED_IN_SEPARATE_FILES = 3


@configclass
class RecorderTermCfg:
    """A recorder term names a key and a callable pulling data from the env."""

    func: object = MISSING


@configclass
class RecorderManagerBaseCfg:
    """Reference ``RecorderManagerBaseCfg``."""

    dataset_export_dir_path: str = "/tmp/isaaclab_tpu_datasets"
    dataset_filename: str = "dataset"
    dataset_export_mode: int = DatasetExportMode.EXPORT_ALL
    export_in_record_pre_reset: bool = True


class EpisodeData:
    """Per-env growing episode buffer (reference utils/datasets/episode_data.py)."""

    def __init__(self):
        self.data: dict[str, list] = {}
        self.success = False
        self.seed = None

    def add(self, key: str, value):
        self.data.setdefault(key, []).append(np.asarray(value))

    def as_arrays(self) -> dict:
        return {k: np.stack(v) for k, v in self.data.items()}

    def __len__(self):
        return max((len(v) for v in self.data.values()), default=0)


class RecorderManager:
    """Host-side recorder: hooks called by the env around step/reset
    (reference recorder_manager.py:346-408)."""

    def __init__(self, cfg, env):
        self.cfg = cfg
        self._env = env
        self._episodes = {}
        self._exported_count = 0
        self._terms = {}
        if cfg is not None:
            import dataclasses as _dc

            for f in _dc.fields(cfg):
                v = getattr(cfg, f.name)
                if isinstance(v, RecorderTermCfg):
                    self._terms[f.name] = v
        self._enabled = bool(self._terms)

    @property
    def enabled(self):
        return self._enabled

    def _episode(self, env_id: int) -> EpisodeData:
        if env_id not in self._episodes:
            self._episodes[env_id] = EpisodeData()
        return self._episodes[env_id]

    def record_post_step(self, env, obs, actions, rewards, dones):
        if not self._enabled:
            return
        obs_np = {k: np.asarray(v) for k, v in obs.items()} if isinstance(obs, dict) else {"obs": np.asarray(obs)}
        actions = np.asarray(actions)
        rewards = np.asarray(rewards)
        for e in range(env.num_envs):
            ep = self._episode(e)
            for k, v in obs_np.items():
                ep.add(f"obs/{k}", v[e])
            ep.add("actions", actions[e])
            ep.add("rewards", rewards[e])

    def record_pre_reset(self, env, env_ids, success_mask=None):
        if not self._enabled:
            return
        success = (
            np.asarray(success_mask) if success_mask is not None else None
        )
        for e in np.asarray(env_ids).tolist():
            ep = self._episodes.pop(int(e), None)
            if ep is None or len(ep) == 0:
                continue
            ep.success = bool(success[int(e)]) if success is not None else True
            self._export_episode(ep)

    def _export_episode(self, ep: EpisodeData):
        mode = self.cfg.dataset_export_mode
        if mode == DatasetExportMode.EXPORT_NONE:
            return
        if mode == DatasetExportMode.EXPORT_SUCCEEDED_ONLY and not ep.success:
            return
        from ..utils.datasets import HDF5DatasetFileHandler

        os.makedirs(self.cfg.dataset_export_dir_path, exist_ok=True)
        suffix = ""
        if mode == DatasetExportMode.EXPORT_SUCCEEDED_FAILED_IN_SEPARATE_FILES:
            suffix = "_success" if ep.success else "_failure"
        path = os.path.join(
            self.cfg.dataset_export_dir_path,
            f"{self.cfg.dataset_filename}{suffix}.hdf5",
        )
        handler = HDF5DatasetFileHandler()
        handler.open_or_create(path)
        handler.write_episode(f"demo_{self._exported_count}", ep.as_arrays(),
                              success=ep.success)
        handler.close()
        self._exported_count += 1

    @property
    def exported_successful_episode_count(self):
        return self._exported_count
