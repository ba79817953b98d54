"""Observation modifiers.

TPU-native counterpart of ``/root/reference/source/isaaclab/isaaclab/utils/modifiers/``:
stateless modifiers (bias/clip/scale) are plain functions; stateful ones
(``DigitalFilter``, ``Integrator``) carry their state in explicit pytrees and
return ``(new_state, output)`` so they compose inside jitted manager pipelines.
"""

from __future__ import annotations

from dataclasses import MISSING
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .configclass import configclass

# -----------------------------------------------------------------------------
# Stateless (reference modifier.py:20-64 + modifier_cfg.py)
# -----------------------------------------------------------------------------


def bias(data, value: float):
    return data + value


def scale(data, multiplier: float):
    return data * multiplier


def clip(data, bounds: tuple):
    lo = -jnp.inf if bounds[0] is None else bounds[0]
    hi = jnp.inf if bounds[1] is None else bounds[1]
    return jnp.clip(data, lo, hi)


@configclass
class ModifierCfg:
    """Stateless modifier term: ``func(data, **params)``."""

    func: Callable = MISSING
    params: dict = {}

    def init_state(self, shape):
        return None

    def apply(self, state, data):
        return state, self.func(data, **self.params)

    def reset(self, state, env_mask):
        return state


# -----------------------------------------------------------------------------
# Stateful (reference modifier.py:67-232)
# -----------------------------------------------------------------------------


class FilterState(NamedTuple):
    x_hist: jax.Array  # (order+1, *shape) input history, newest first
    y_hist: jax.Array  # (order, *shape) output history, newest first


@configclass
class DigitalFilterCfg(ModifierCfg):
    """IIR filter y[n] = -sum(A*y_hist) + sum(B*x_hist)
    (reference modifier.py:106-170)."""

    func: Callable = None
    A: list = MISSING  # denominator coefficients (a1..aN)
    B: list = MISSING  # numerator coefficients (b0..bN)

    def init_state(self, shape):
        return FilterState(
            x_hist=jnp.zeros((len(self.B),) + tuple(shape)),
            y_hist=jnp.zeros((len(self.A),) + tuple(shape)),
        )

    def apply(self, state: FilterState, data):
        x_hist = jnp.roll(state.x_hist, 1, axis=0).at[0].set(data)
        a = jnp.asarray(self.A).reshape((-1,) + (1,) * data.ndim)
        b = jnp.asarray(self.B).reshape((-1,) + (1,) * data.ndim)
        y = jnp.sum(b * x_hist, axis=0) - jnp.sum(a * state.y_hist, axis=0)
        y_hist = jnp.roll(state.y_hist, 1, axis=0).at[0].set(y)
        return FilterState(x_hist=x_hist, y_hist=y_hist), y

    def reset(self, state: FilterState, env_mask):
        mask = env_mask.reshape((1, -1) + (1,) * (state.x_hist.ndim - 2))
        return FilterState(
            x_hist=jnp.where(mask, 0.0, state.x_hist),
            y_hist=jnp.where(mask, 0.0, state.y_hist),
        )


class IntegratorState(NamedTuple):
    integral: jax.Array
    prev: jax.Array


@configclass
class IntegratorCfg(ModifierCfg):
    """Trapezoidal integrator (reference modifier.py:173-232)."""

    func: Callable = None
    dt: float = MISSING

    def init_state(self, shape):
        return IntegratorState(
            integral=jnp.zeros(tuple(shape)), prev=jnp.zeros(tuple(shape))
        )

    def apply(self, state: IntegratorState, data):
        integral = state.integral + 0.5 * self.dt * (data + state.prev)
        return IntegratorState(integral=integral, prev=data), integral

    def reset(self, state: IntegratorState, env_mask):
        mask = env_mask.reshape((-1,) + (1,) * (state.integral.ndim - 1))
        return IntegratorState(
            integral=jnp.where(mask, 0.0, state.integral),
            prev=jnp.where(mask, 0.0, state.prev),
        )
