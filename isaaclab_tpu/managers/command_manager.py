"""Command manager (reference ``managers/command_manager.py``).

``CommandTerm``s hold per-env command arrays with time-based resampling
(reference _resample, command_manager.py:172) — timers and commands live in an
explicit state pytree; resampling is a masked ``where`` update inside jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .manager_base import ManagerBase
from .manager_term_cfg import CommandTermCfg


class CommandTermState(NamedTuple):
    command: jnp.ndarray  # (E, dim)
    time_left: jnp.ndarray  # (E,)
    extra: tuple = ()  # term-specific (e.g. heading targets, metrics)


class CommandTerm:
    """Reference ``CommandTerm``: subclass provides dim + sampling."""

    def __init__(self, cfg: CommandTermCfg, env):
        self.cfg = cfg
        self._env = env

    @property
    def command_dim(self) -> int:
        raise NotImplementedError

    def init_state(self, num_envs: int) -> CommandTermState:
        return CommandTermState(
            command=jnp.zeros((num_envs, self.command_dim)),
            time_left=jnp.zeros((num_envs,)),
        )

    def sample(self, env, state: CommandTermState, key, mask) -> CommandTermState:
        """Resample commands for envs in ``mask``."""
        raise NotImplementedError

    def update(self, env, state: CommandTermState) -> CommandTermState:
        """Per-step command post-processing (e.g. heading error -> ang vel)."""
        return state

    def _resample_time(self, key, num_envs):
        lo, hi = self.cfg.resampling_time_range
        return jax.random.uniform(key, (num_envs,), minval=lo, maxval=hi)

    def compute(self, env, state: CommandTermState, key, dt: float, reset_mask):
        """Advance timers; resample where expired or reset."""
        time_left = state.time_left - dt
        need = (time_left <= 0.0) | reset_mask
        k1, k2 = jax.random.split(key)
        new_time = self._resample_time(k1, time_left.shape[0])
        state = state._replace(
            time_left=jnp.where(need, new_time, time_left)
        )
        state = self.sample(env, state, k2, need)
        return self.update(env, state)


class CommandManager(ManagerBase):
    """Holds named command terms; state is a dict pytree."""

    def _prepare_terms(self):
        self._term_names: list[str] = []
        self._terms: list[CommandTerm] = []
        for name, term_cfg in self._iter_term_cfgs(expected_type=CommandTermCfg):
            term = term_cfg.class_type(term_cfg, self._env)
            self._term_names.append(name)
            self._terms.append(term)

    @property
    def active_terms(self):
        return self._term_names

    def init_state(self, num_envs: int) -> dict:
        return {
            name: term.init_state(num_envs)
            for name, term in zip(self._term_names, self._terms)
        }

    def get_command(self, state: dict, name: str):
        """Reference ``command_manager.get_command`` — read by mdp terms."""
        return state[name].command

    def get_active_iterable_terms(self, state: dict, env_idx: int):
        """[(term_name, values)] for one env (reference
        command_manager.py get_active_iterable_terms)."""
        import numpy as np

        return [
            (name, np.asarray(state[name].command[env_idx]).reshape(-1).tolist())
            for name in self._term_names
        ]

    def get_term(self, name: str) -> CommandTerm:
        return self._terms[self._term_names.index(name)]

    def compute(self, env, state: dict, key, dt: float, reset_mask) -> dict:
        out = {}
        keys = jax.random.split(key, max(len(self._terms), 1))
        for name, term, k in zip(self._term_names, self._terms, keys):
            out[name] = term.compute(env, state[name], k, dt, reset_mask)
        return out
