"""Curriculum manager (reference ``managers/curriculum_manager.py``).

Terms run at reset and return per-env scalar curriculum state (e.g. terrain
level, reward-weight interpolation); states live in an explicit dict pytree.
Term contract: ``f(env, state_value, mask, **params) -> (new_value, metric)``.
"""

from __future__ import annotations

import jax.numpy as jnp

from .manager_base import ManagerBase
from .manager_term_cfg import CurriculumTermCfg


class CurriculumManager(ManagerBase):
    def _prepare_terms(self):
        self._term_names: list[str] = []
        self._term_cfgs: list[CurriculumTermCfg] = []
        for name, term_cfg in self._iter_term_cfgs(expected_type=CurriculumTermCfg):
            self._resolve_term_cfg(term_cfg)
            self._term_names.append(name)
            self._term_cfgs.append(term_cfg)

    @property
    def active_terms(self):
        return self._term_names

    def get_active_iterable_terms(self, state: dict, env_idx: int):
        """[(term_name, values)] for one env (reference manager_base.py:231)."""
        import numpy as np

        return [
            (name, np.asarray(state[name][env_idx]).reshape(-1).tolist())
            for name in self._term_names
        ]

    def init_state(self, num_envs: int) -> dict:
        return {name: jnp.zeros((num_envs,)) for name in self._term_names}

    def compute(self, env, state: dict, mask) -> tuple[dict, dict]:
        """Apply terms to masked (resetting) envs; returns (state, metrics)."""
        new_state = {}
        metrics = {}
        for name, cfg in zip(self._term_names, self._term_cfgs):
            value, metric = cfg.func(env, state[name], mask, **cfg.params)
            new_state[name] = value
            metrics[f"Curriculum/{name}"] = metric
        return new_state, metrics
