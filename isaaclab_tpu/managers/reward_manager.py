"""Reward manager (reference ``managers/reward_manager.py``).

``compute(env, dt)`` = sum of weight * term(env) * dt with per-term episodic
sums for logging (reference reward_manager.py:128-157); zero-weight terms are
skipped at build time (never traced).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .manager_base import ManagerBase
from .manager_term_cfg import RewardTermCfg


class RewardManagerState(NamedTuple):
    episode_sums: jnp.ndarray  # (E, n_terms)


class RewardManager(ManagerBase):
    # tolerate cfg=None (reward-free tasks, e.g. the stack family which is
    # teleop/imitation-only — reference stack_env_cfg.py:178 `rewards = None`)
    _term_names: list = []
    _term_cfgs: list = []

    def _prepare_terms(self):
        self._term_names: list[str] = []
        self._term_cfgs: list[RewardTermCfg] = []
        for name, term_cfg in self._iter_term_cfgs(expected_type=RewardTermCfg):
            if term_cfg.weight == 0.0:
                continue
            self._resolve_term_cfg(term_cfg)
            self._term_names.append(name)
            self._term_cfgs.append(term_cfg)

    @property
    def active_terms(self):
        return self._term_names

    def init_state(self, num_envs: int) -> RewardManagerState:
        return RewardManagerState(
            episode_sums=jnp.zeros((num_envs, len(self._term_names)))
        )

    def get_active_iterable_terms(self, state: RewardManagerState,
                                  env_idx: int):
        """[(term_name, values)] for one env (reference
        reward_manager.py:195) — running episodic sum per term (the TPU
        state keeps sums, not per-step values)."""
        import numpy as np

        sums = np.asarray(state.episode_sums[env_idx])
        return [(n, [float(sums[i])]) for i, n in enumerate(self._term_names)]

    def compute(self, env, dt: float, state: RewardManagerState):
        """Returns (total_reward (E,), new_state, per_term dict)."""
        values = []
        for cfg in self._term_cfgs:
            v = cfg.func(env, **cfg.params) * cfg.weight * dt
            values.append(v)
        if values:
            stacked = jnp.stack(values, axis=-1)  # (E, n_terms)
            total = jnp.sum(stacked, axis=-1)
        else:
            stacked = jnp.zeros((env.num_envs, 0))
            total = jnp.zeros(env.num_envs)
        new_state = RewardManagerState(episode_sums=state.episode_sums + stacked)
        return total, new_state, dict(zip(self._term_names, values))

    def reset(self, state: RewardManagerState, env_mask):
        """Returns (new state, {term: mean episodic sum over reset envs})."""
        sums = state.episode_sums
        n = jnp.maximum(jnp.sum(env_mask), 1)
        logs = {
            f"Episode_Reward/{name}": jnp.sum(
                jnp.where(env_mask, sums[:, i], 0.0)
            ) / n
            for i, name in enumerate(self._term_names)
        }
        new_sums = jnp.where(env_mask[:, None], 0.0, sums)
        return RewardManagerState(episode_sums=new_sums), logs
