"""Noise configurations and models.

TPU-native counterpart of ``/root/reference/source/isaaclab/isaaclab/utils/noise/``:
``constant`` / ``uniform`` / ``gaussian`` noise cfgs applied as pure functions
(key-threaded), plus ``NoiseModel`` / ``NoiseModelWithAdditiveBias`` whose
per-env bias state lives in an explicit pytree instead of object attributes.
"""

from __future__ import annotations

from dataclasses import MISSING
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .configclass import configclass


@configclass
class NoiseCfg:
    """Base noise term (reference noise_cfg.py). ``operation`` is one of
    "add", "scale", "abs"."""

    operation: str = "add"

    def func(self, key, data):
        raise NotImplementedError


@configclass
class ConstantNoiseCfg(NoiseCfg):
    bias: float = 0.0

    def func(self, key, data):
        return _apply(self.operation, data, jnp.asarray(self.bias, data.dtype))


@configclass
class UniformNoiseCfg(NoiseCfg):
    n_min: float = -1.0
    n_max: float = 1.0

    def func(self, key, data):
        noise = jax.random.uniform(
            key, data.shape, data.dtype, minval=self.n_min, maxval=self.n_max
        )
        return _apply(self.operation, data, noise)


@configclass
class GaussianNoiseCfg(NoiseCfg):
    mean: float = 0.0
    std: float = 1.0

    def func(self, key, data):
        noise = self.mean + self.std * jax.random.normal(key, data.shape, data.dtype)
        return _apply(self.operation, data, noise)


def _apply(operation: str, data, noise):
    if operation == "add":
        return data + noise
    if operation == "scale":
        return data * noise
    if operation == "abs":
        return jnp.broadcast_to(noise, data.shape)
    raise ValueError(f"Unknown noise operation: {operation}")


# -----------------------------------------------------------------------------
# Stateful noise models (reference noise_model.py:106-173)
# -----------------------------------------------------------------------------


class NoiseModelState(NamedTuple):
    """Per-env additive bias, resampled on reset."""

    bias: jax.Array  # (num_envs, dim)


@configclass
class NoiseModelCfg:
    """Wraps a ``NoiseCfg`` for Direct-workflow action/observation corruption."""

    noise_cfg: NoiseCfg = MISSING

    def init_state(self, num_envs: int, dim: int) -> NoiseModelState:
        return NoiseModelState(bias=jnp.zeros((num_envs, dim)))

    def apply(self, state: NoiseModelState, key, data):
        return self.noise_cfg.func(key, data)

    def reset(self, state: NoiseModelState, key, env_mask) -> NoiseModelState:
        return state


@configclass
class NoiseModelWithAdditiveBiasCfg(NoiseModelCfg):
    """Adds a per-env constant bias resampled at reset
    (reference noise_model.py:140-173)."""

    bias_noise_cfg: NoiseCfg = MISSING

    def apply(self, state: NoiseModelState, key, data):
        return self.noise_cfg.func(key, data) + state.bias

    def reset(self, state: NoiseModelState, key, env_mask) -> NoiseModelState:
        new_bias = self.bias_noise_cfg.func(key, jnp.zeros_like(state.bias))
        mask = env_mask.reshape((-1,) + (1,) * (state.bias.ndim - 1))
        return NoiseModelState(bias=jnp.where(mask, new_bias, state.bias))
