"""Termination manager (reference ``managers/termination_manager.py``).

OR of term functions; ``time_out=True`` terms tracked separately — the
terminated/truncated split that RL bootstrapping needs
(reference termination_manager.py:151).
"""

from __future__ import annotations

import jax.numpy as jnp

from .manager_base import ManagerBase
from .manager_term_cfg import TerminationTermCfg


class TerminationManager(ManagerBase):
    def _prepare_terms(self):
        self._term_names: list[str] = []
        self._term_cfgs: list[TerminationTermCfg] = []
        for name, term_cfg in self._iter_term_cfgs(expected_type=TerminationTermCfg):
            self._resolve_term_cfg(term_cfg)
            self._term_names.append(name)
            self._term_cfgs.append(term_cfg)

    @property
    def active_terms(self):
        return self._term_names

    def compute(self, env):
        """Returns (terminated (E,), time_outs (E,), per_term dict)."""
        terminated = jnp.zeros(env.num_envs, dtype=bool)
        time_outs = jnp.zeros(env.num_envs, dtype=bool)
        per_term = {}
        for name, cfg in zip(self._term_names, self._term_cfgs):
            value = cfg.func(env, **cfg.params).astype(bool)
            per_term[name] = value
            if cfg.time_out:
                time_outs = time_outs | value
            else:
                terminated = terminated | value
        return terminated, time_outs, per_term
