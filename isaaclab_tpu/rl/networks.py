"""Policy networks (the in-repo replacement for rsl-rl's actor-critic models,
SURVEY.md §2.10 row 7): Flax MLP / recurrent LSTM / fork-style cascade
actor-critic, plus empirical observation normalization as an explicit state.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

_ACT = {
    "elu": nn.elu,
    "relu": nn.relu,
    "tanh": jnp.tanh,
    "selu": nn.selu,
    "lrelu": nn.leaky_relu,
    "softsign": nn.soft_sign,
}


class MLP(nn.Module):
    dims: tuple
    out: int
    activation: str = "elu"

    @nn.compact
    def __call__(self, x):
        a = _ACT[self.activation]
        for d in self.dims:
            x = a(nn.Dense(d)(x))
        return nn.Dense(self.out)(x)


class ActorCritic(nn.Module):
    """Gaussian-policy actor + value critic (rsl-rl ActorCritic equivalent)."""

    num_actions: int
    actor_dims: tuple = (256, 256, 128)
    critic_dims: tuple = (256, 256, 128)
    activation: str = "elu"
    init_noise_std: float = 1.0

    @nn.compact
    def __call__(self, obs, critic_obs=None):
        critic_obs = critic_obs if critic_obs is not None else obs
        mean = MLP(self.actor_dims, self.num_actions, self.activation,
                   name="actor")(obs)
        value = MLP(self.critic_dims, 1, self.activation, name="critic")(
            critic_obs
        )[..., 0]
        log_std = self.param(
            "log_std",
            lambda key: jnp.full((self.num_actions,), jnp.log(self.init_noise_std)),
        )
        return mean, log_std, value


class RecurrentCarry(NamedTuple):
    actor: tuple  # (c, h)
    critic: tuple


class ActorCriticRecurrent(nn.Module):
    """LSTM actor-critic (rsl-rl ActorCriticRecurrent / fork LidarGuideRNN).

    The recurrent carry is threaded explicitly; reset masks zero it.
    """

    num_actions: int
    actor_dims: tuple = (256,)
    critic_dims: tuple = (256,)
    hidden_size: int = 256
    activation: str = "elu"
    init_noise_std: float = 1.0

    @nn.compact
    def __call__(self, obs, carry: RecurrentCarry, critic_obs=None):
        critic_obs = critic_obs if critic_obs is not None else obs
        a_cell = nn.OptimizedLSTMCell(self.hidden_size, name="actor_lstm")
        c_cell = nn.OptimizedLSTMCell(self.hidden_size, name="critic_lstm")
        a_carry, a_out = a_cell(carry.actor, obs)
        c_carry, c_out = c_cell(carry.critic, critic_obs)
        mean = MLP(self.actor_dims, self.num_actions, self.activation,
                   name="actor")(a_out)
        value = MLP(self.critic_dims, 1, self.activation, name="critic")(c_out)[..., 0]
        log_std = self.param(
            "log_std",
            lambda key: jnp.full((self.num_actions,), jnp.log(self.init_noise_std)),
        )
        return mean, log_std, value, RecurrentCarry(actor=a_carry, critic=c_carry)

    def init_carry(self, batch: int) -> RecurrentCarry:
        z = jnp.zeros((batch, self.hidden_size))
        return RecurrentCarry(actor=(z, z), critic=(z, z))


class ActorCriticCascade(nn.Module):
    """Fork's cascade actor (reference rl_cfg.py:22-52
    RslRlPpoActorCriticCascadeCfg): the observation is partitioned
    ``[lidar | state1 | state2]``; mlp1 maps (lidar, state1) to a small
    guidance vector (mlp1_out_dim, e.g. a 3d direction), mlp2 maps
    (guidance, state2) to the action. Used by the fork's GuideCa UAV task."""

    num_actions: int
    lidar_input_dim: int = 0
    mlp1_state_dim: int = 0
    mlp2_state_dim: int = 0
    mlp1_dims: tuple = (128, 64)
    mlp2_dims: tuple = (256, 128, 64)
    mlp1_out_dim: int = 3
    mlp2_out_dim: int = 64
    critic_dims: tuple = (512, 256, 128, 64)
    activation: str = "elu"
    init_noise_std: float = 1.0

    @nn.compact
    def __call__(self, obs, critic_obs=None):
        critic_obs = critic_obs if critic_obs is not None else obs
        a = _ACT[self.activation]
        L, s1, s2 = self.lidar_input_dim, self.mlp1_state_dim, self.mlp2_state_dim
        lidar = obs[..., :L]
        state1 = obs[..., L : L + s1]
        state2 = obs[..., L + s1 : L + s1 + s2]
        x = jnp.concatenate([lidar, state1], axis=-1)
        for d in self.mlp1_dims:
            x = a(nn.Dense(d)(x))
        guide = nn.Dense(self.mlp1_out_dim, name="mlp1_out")(x)
        y = jnp.concatenate([guide, state2], axis=-1)
        for d in self.mlp2_dims:
            y = a(nn.Dense(d)(y))
        y = a(nn.Dense(self.mlp2_out_dim)(y))
        mean = nn.Dense(self.num_actions, name="action_head")(y)
        value = MLP(self.critic_dims, 1, self.activation, name="critic")(
            critic_obs
        )[..., 0]
        log_std = self.param(
            "log_std",
            lambda key: jnp.full((self.num_actions,), jnp.log(self.init_noise_std)),
        )
        return mean, log_std, value


class NormalizerState(NamedTuple):
    """Welford running mean/var (rsl-rl EmpiricalNormalization equivalent)."""

    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray

    @staticmethod
    def create(dim: int) -> "NormalizerState":
        return NormalizerState(
            mean=jnp.zeros(dim), var=jnp.ones(dim), count=jnp.asarray(1e-4)
        )


def normalizer_update(state: NormalizerState, batch) -> NormalizerState:
    """Update running stats with a (N, dim) batch."""
    flat = batch.reshape(-1, batch.shape[-1])
    b_mean = jnp.mean(flat, axis=0)
    b_var = jnp.var(flat, axis=0)
    b_count = flat.shape[0]
    delta = b_mean - state.mean
    tot = state.count + b_count
    mean = state.mean + delta * (b_count / tot)
    m_a = state.var * state.count
    m_b = b_var * b_count
    var = (m_a + m_b + jnp.square(delta) * state.count * b_count / tot) / tot
    return NormalizerState(mean=mean, var=var, count=tot)


def normalize_obs(state: NormalizerState, obs, clip: float = 10.0):
    return jnp.clip(
        (obs - state.mean) / jnp.sqrt(state.var + 1e-8), -clip, clip
    )
