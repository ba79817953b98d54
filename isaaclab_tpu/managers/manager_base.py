"""Manager base machinery (reference ``managers/manager_base.py``).

``ManagerBase._prepare_terms`` walks a configclass whose attributes are
``*TermCfg`` instances (reference manager_base.py:278 resolves
``SceneEntityCfg`` params and validates signatures); term functions must be
pure over the :class:`EnvContext` — the whole manager compiles into the env
step (SURVEY.md §2.8 TPU note).
"""

from __future__ import annotations

import dataclasses
import inspect
from typing import Callable

from ..utils.configclass import is_configclass
from .manager_term_cfg import ManagerTermBaseCfg
from .scene_entity_cfg import SceneEntityCfg


class ManagerTermBase:
    """Stateful term base (reference manager_base.py:28): callable objects
    whose constructor resolves cfg against the env; the call must stay pure."""

    def __init__(self, cfg, env):
        self.cfg = cfg
        self._env = env

    def reset(self, env_mask):
        return None

    def __call__(self, env, **kwargs):
        raise NotImplementedError


class ManagerBase:
    """Base: parse term cfgs from a configclass at build time."""

    def __init__(self, cfg, env):
        self.cfg = cfg
        self._env = env
        if cfg is not None:
            self._prepare_terms()

    @property
    def active_terms(self):
        raise NotImplementedError

    # ------------------------------------------------------------------
    def _iter_term_cfgs(self, cfg=None, expected_type=ManagerTermBaseCfg):
        """Yield (name, term_cfg) for every term attribute, skipping None."""
        cfg = cfg if cfg is not None else self.cfg
        if isinstance(cfg, dict):
            items = cfg.items()
        elif is_configclass(cfg):
            items = [
                (f.name, getattr(cfg, f.name)) for f in dataclasses.fields(cfg)
            ]
        else:
            items = [
                (k, v) for k, v in vars(cfg).items() if not k.startswith("_")
            ]
        for name, value in items:
            if value is None:
                continue
            if isinstance(value, expected_type):
                yield name, value

    def _resolve_term_cfg(self, term_cfg):
        """Resolve SceneEntityCfg params; instantiate class-based terms
        (reference _resolve_common_term_cfg, manager_base.py:278)."""
        for key, value in list(term_cfg.params.items()):
            if isinstance(value, SceneEntityCfg):
                value.resolve(self._env.scene)
        if inspect.isclass(term_cfg.func) and issubclass(term_cfg.func, ManagerTermBase):
            term_cfg.func = term_cfg.func(cfg=term_cfg, env=self._env)
        return term_cfg

    def _prepare_terms(self):
        raise NotImplementedError
