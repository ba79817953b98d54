"""Action manager (reference ``managers/action_manager.py``).

Ordered ``ActionTerm``s each own a slice of the action vector
(action_manager.py:318 ``process_action`` splits once per env step;
``apply_action`` runs once per sim substep). Targets persist in entity state,
so most terms only implement ``process``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .manager_base import ManagerBase
from .manager_term_cfg import ActionTermCfg


class ActionTerm:
    """Reference ``ActionTerm`` base: bound to an asset at build time."""

    def __init__(self, cfg: ActionTermCfg, env):
        self.cfg = cfg
        self._env = env
        self._asset = env.scene[cfg.asset_name]

    @property
    def action_dim(self) -> int:
        raise NotImplementedError

    def process_actions(self, env, state, actions):
        """Once per env step: write processed targets into scene state."""
        raise NotImplementedError

    def apply_actions(self, env, state):
        """Once per sim substep (most terms: no-op, targets persist)."""
        return state

    def reset(self, env, state, env_mask):
        return state


class ActionManagerState(NamedTuple):
    action: jnp.ndarray  # (E, D) last raw action
    prev_action: jnp.ndarray  # (E, D)


class ActionManager(ManagerBase):
    def __init__(self, cfg, env):
        super().__init__(cfg, env)

    def _prepare_terms(self):
        self._term_names: list[str] = []
        self._terms: list[ActionTerm] = []
        for name, term_cfg in self._iter_term_cfgs(expected_type=ActionTermCfg):
            term = term_cfg.class_type(term_cfg, self._env)
            self._term_names.append(name)
            self._terms.append(term)

    @property
    def active_terms(self):
        return self._term_names

    @property
    def total_action_dim(self) -> int:
        return sum(t.action_dim for t in self._terms)

    def get_active_iterable_terms(self, state: "ActionManagerState",
                                  env_idx: int):
        """[(term_name, values)] for one env (reference
        manager_base.py:231 / action_manager.py) — each term's slice of the
        last raw action."""
        import numpy as np

        out = []
        idx = 0
        action = np.asarray(state.action[env_idx])
        for name, term in zip(self._term_names, self._terms):
            d = term.action_dim
            out.append((name, action[idx: idx + d].tolist()))
            idx += d
        return out

    def init_state(self, num_envs: int) -> ActionManagerState:
        D = self.total_action_dim
        return ActionManagerState(
            action=jnp.zeros((num_envs, D)), prev_action=jnp.zeros((num_envs, D))
        )

    def process_action(self, env, scene_state, am_state: ActionManagerState, action):
        """Split + per-term process (reference action_manager.py:318)."""
        am_state = ActionManagerState(action=action, prev_action=am_state.action)
        idx = 0
        for term in self._terms:
            d = term.action_dim
            scene_state = term.process_actions(env, scene_state, action[:, idx : idx + d])
            idx += d
        return scene_state, am_state

    def apply_action(self, env, scene_state):
        for term in self._terms:
            scene_state = term.apply_actions(env, scene_state)
        return scene_state

    def reset(self, env, scene_state, am_state: ActionManagerState, env_mask):
        for term in self._terms:
            scene_state = term.reset(env, scene_state, env_mask)
        m = env_mask[:, None]
        return scene_state, ActionManagerState(
            action=jnp.where(m, 0.0, am_state.action),
            prev_action=jnp.where(m, 0.0, am_state.prev_action),
        )
