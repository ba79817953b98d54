"""Event manager (reference ``managers/event_manager.py``).

Modes: ``startup`` (once at build), ``reset`` (masked, with
``min_step_count_between_reset`` gating, reference event_manager.py:245-270),
``interval`` (per-env countdown timers, :205-229). Event term functions are
state transforms: ``f(env, scene_state, key, mask, **params) -> scene_state``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .manager_base import ManagerBase
from .manager_term_cfg import EventTermCfg


class EventManagerState(NamedTuple):
    interval_time_left: dict  # term name -> (E,) or () countdown
    last_reset_step: dict  # term name -> (E,) step count at last trigger


class EventManager(ManagerBase):
    def _prepare_terms(self):
        self._mode_terms: dict[str, list] = {}
        for name, term_cfg in self._iter_term_cfgs(expected_type=EventTermCfg):
            self._resolve_term_cfg(term_cfg)
            self._mode_terms.setdefault(term_cfg.mode, []).append((name, term_cfg))

    @property
    def active_terms(self):
        return {
            mode: [n for n, _ in terms] for mode, terms in self._mode_terms.items()
        }

    @property
    def available_modes(self):
        return list(self._mode_terms.keys())

    def init_state(self, num_envs: int, key) -> EventManagerState:
        timers = {}
        last = {}
        for name, cfg in self._mode_terms.get("interval", []):
            lo, hi = cfg.interval_range_s
            key, k = jax.random.split(key)
            shape = () if cfg.is_global_time else (num_envs,)
            timers[name] = jax.random.uniform(k, shape, minval=lo, maxval=hi)
        for name, cfg in self._mode_terms.get("reset", []):
            if cfg.min_step_count_between_reset:
                last[name] = jnp.zeros((num_envs,), dtype=jnp.int32)
        return EventManagerState(interval_time_left=timers, last_reset_step=last)

    def apply_startup(self, env, scene_state, key):
        for name, cfg in self._mode_terms.get("startup", []):
            key, k = jax.random.split(key)
            all_mask = jnp.ones(env.num_envs, dtype=bool)
            scene_state = cfg.func(env, scene_state, k, all_mask, **cfg.params)
        return scene_state

    def apply_reset(self, env, scene_state, state: EventManagerState, key, mask,
                    common_step):
        """Apply reset-mode events to masked envs with step-count gating."""
        last = dict(state.last_reset_step)
        for name, cfg in self._mode_terms.get("reset", []):
            key, k = jax.random.split(key)
            term_mask = mask
            if cfg.min_step_count_between_reset:
                ok = (common_step - last[name]) >= cfg.min_step_count_between_reset
                term_mask = mask & ok
                last[name] = jnp.where(term_mask, common_step, last[name])
            scene_state = cfg.func(env, scene_state, k, term_mask, **cfg.params)
        return scene_state, state._replace(last_reset_step=last)

    def apply_interval(self, env, scene_state, state: EventManagerState, key,
                       dt: float):
        """Tick interval timers; fire terms whose countdown expired."""
        timers = dict(state.interval_time_left)
        for name, cfg in self._mode_terms.get("interval", []):
            key, k1, k2 = jax.random.split(key, 3)
            t = timers[name] - dt
            fired = t <= 0.0
            lo, hi = cfg.interval_range_s
            new_t = jax.random.uniform(k1, t.shape, minval=lo, maxval=hi)
            timers[name] = jnp.where(fired, new_t, t)
            mask = (
                jnp.broadcast_to(fired, (env.num_envs,))
                if cfg.is_global_time
                else fired
            )
            scene_state = cfg.func(env, scene_state, k2, mask, **cfg.params)
        return scene_state, state._replace(interval_time_left=timers)
