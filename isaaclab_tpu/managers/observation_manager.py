"""Observation manager (reference ``managers/observation_manager.py``).

Per-term pipeline func -> modifiers -> noise -> clip -> scale
(reference compute_group:260-335) with fixed-size history buffers; the whole
manager compiles into one fused function over the env context. Term dims are
discovered by abstract evaluation (``jax.eval_shape``) instead of the
reference's probe-call trick (observation_manager.py:420).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.buffers import CircularBuffer
from .manager_base import ManagerBase
from .manager_term_cfg import ObservationGroupCfg, ObservationTermCfg


class ObservationManagerState(NamedTuple):
    """History buffers + modifier states per (group, term)."""

    histories: dict  # (group, term) -> CircularBuffer
    modifier_states: dict  # (group, term, idx) -> state pytree


class ObservationManager(ManagerBase):
    def __init__(self, cfg, env):
        super().__init__(cfg, env)

    def _prepare_terms(self):
        self._group_term_names: dict[str, list[str]] = {}
        self._group_term_cfgs: dict[str, list[ObservationTermCfg]] = {}
        self._group_cfgs: dict[str, ObservationGroupCfg] = {}
        for group_name, group_cfg in self._iter_term_cfgs(
            expected_type=ObservationGroupCfg
        ):
            self._group_cfgs[group_name] = group_cfg
            names, cfgs = [], []
            for term_name, term_cfg in self._iter_term_cfgs(
                cfg=group_cfg, expected_type=ObservationTermCfg
            ):
                self._resolve_term_cfg(term_cfg)
                if group_cfg.history_length is not None:
                    term_cfg.history_length = group_cfg.history_length
                    term_cfg.flatten_history_dim = group_cfg.flatten_history_dim
                names.append(term_name)
                cfgs.append(term_cfg)
            self._group_term_names[group_name] = names
            self._group_term_cfgs[group_name] = cfgs
        self._term_dims: dict = {}

    @property
    def active_terms(self):
        return self._group_term_names

    def group_names(self):
        return list(self._group_term_names.keys())

    # ------------------------------------------------------------------
    def init_state(self, template_env) -> ObservationManagerState:
        """Build history buffers using term shapes from abstract eval."""
        histories = {}
        modifier_states = {}
        E = template_env.num_envs
        for group, cfgs in self._group_term_cfgs.items():
            for name, cfg in zip(self._group_term_names[group], cfgs):
                shape = jax.eval_shape(
                    lambda: cfg.func(template_env, **cfg.params)
                ).shape
                self._term_dims[(group, name)] = shape[1:]
                if cfg.history_length:
                    histories[f"{group}/{name}"] = CircularBuffer.create(
                        cfg.history_length, E, shape[1:]
                    )
                if cfg.modifiers:
                    for i, mod in enumerate(cfg.modifiers):
                        st = mod.init_state(shape)
                        if st is not None:
                            modifier_states[f"{group}/{name}/{i}"] = st
        return ObservationManagerState(
            histories=histories, modifier_states=modifier_states
        )

    def reset(self, state: ObservationManagerState, env_mask) -> ObservationManagerState:
        histories = {
            k: buf.reset(env_mask) for k, buf in state.histories.items()
        }
        mods = dict(state.modifier_states)
        for group, cfgs in self._group_term_cfgs.items():
            for name, cfg in zip(self._group_term_names[group], cfgs):
                if cfg.modifiers:
                    for i, mod in enumerate(cfg.modifiers):
                        key = f"{group}/{name}/{i}"
                        if key in mods:
                            mods[key] = mod.reset(mods[key], env_mask)
        return ObservationManagerState(histories=histories, modifier_states=mods)

    # ------------------------------------------------------------------
    def compute(self, env, state: ObservationManagerState, key):
        """All groups -> ({group: obs}, new state). Reference compute()."""
        out = {}
        new_hist = dict(state.histories)
        new_mods = dict(state.modifier_states)
        for group in self._group_term_names:
            key, sub = jax.random.split(key)
            obs, new_hist, new_mods = self._compute_group(
                env, group, new_hist, new_mods, sub
            )
            out[group] = obs
        return out, ObservationManagerState(
            histories=new_hist, modifier_states=new_mods
        )

    def compute_group(self, env, group, state: ObservationManagerState, key):
        obs, hist, mods = self._compute_group(
            env, group, dict(state.histories), dict(state.modifier_states), key
        )
        return obs, ObservationManagerState(histories=hist, modifier_states=mods)

    def _compute_group(self, env, group, histories, mod_states, key):
        gcfg = self._group_cfgs[group]
        results = {}
        cfgs = self._group_term_cfgs[group]
        names = self._group_term_names[group]
        keys = jax.random.split(key, max(len(cfgs), 1))
        for name, cfg, k in zip(names, cfgs, keys):
            value = cfg.func(env, **cfg.params)
            if cfg.modifiers:
                for i, mod in enumerate(cfg.modifiers):
                    mkey = f"{group}/{name}/{i}"
                    st = mod_states.get(mkey)
                    st, value = mod.apply(st, value)
                    if mkey in mod_states:
                        mod_states[mkey] = st
            if cfg.noise is not None and gcfg.enable_corruption:
                value = cfg.noise.func(k, value)
            if cfg.clip is not None:
                value = jnp.clip(value, cfg.clip[0], cfg.clip[1])
            if cfg.scale is not None:
                value = value * jnp.asarray(cfg.scale)
            if cfg.history_length:
                hkey = f"{group}/{name}"
                buf = histories[hkey].append(value)
                histories[hkey] = buf
                hist = buf.history()  # (T, E, ...)
                value = jnp.moveaxis(hist, 0, 1)  # (E, T, ...)
                if cfg.flatten_history_dim:
                    value = value.reshape(value.shape[0], -1)
            results[name] = value
        if gcfg.concatenate_terms:
            flat = [
                v.reshape(v.shape[0], -1) for v in results.values()
            ]
            return jnp.concatenate(flat, axis=-1), histories, mod_states
        return results, histories, mod_states

    # ------------------------------------------------------------------
    def discover_dims(self):
        """Fill term dims without any concrete state: abstract-evaluate the
        whole env-init + term pipeline (zero FLOPs; replaces the reference's
        probe-call trick at observation_manager.py:420)."""
        if self._term_dims:
            return

        env = self._env

        def probe():
            state = env.init_state()
            ctx = env.make_context(state)
            out = {}
            for group, cfgs in self._group_term_cfgs.items():
                for name, cfg in zip(self._group_term_names[group], cfgs):
                    out[(group, name)] = cfg.func(ctx, **cfg.params)
            return out

        shapes = jax.eval_shape(probe)
        for key, sds in shapes.items():
            self._term_dims[key] = sds.shape[1:]

    def group_obs_dim(self, group) -> tuple:
        self.discover_dims()
        dims = 0
        for name, cfg in zip(
            self._group_term_names[group], self._group_term_cfgs[group]
        ):
            shape = self._term_dims[(group, name)]
            n = int(np.prod(shape)) if shape else 1
            if cfg.history_length:
                n *= cfg.history_length
            dims += n
        return (dims,)
