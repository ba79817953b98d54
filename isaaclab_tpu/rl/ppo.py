"""PPO algorithm (the in-repo rsl-rl ``PPO`` replacement, SURVEY.md §2.10):
GAE, clipped surrogate + clipped value loss, entropy bonus, minibatch epochs,
adaptive-KL learning rate — all pure jax, jitted as one update step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from .rl_cfg import RslRlPpoAlgorithmCfg


class Transition(NamedTuple):
    """One rollout step across all envs (stacked to (T, E, ...) by scan)."""

    obs: jnp.ndarray
    critic_obs: jnp.ndarray
    action: jnp.ndarray
    log_prob: jnp.ndarray
    value: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray  # terminated | truncated
    time_out: jnp.ndarray
    mean: jnp.ndarray  # rollout-policy action mean (for exact Gaussian KL)


def gaussian_log_prob(mean, log_std, action):
    var = jnp.exp(2.0 * log_std)
    return jnp.sum(
        -0.5 * jnp.square(action - mean) / var - log_std - 0.5 * jnp.log(2 * jnp.pi),
        axis=-1,
    )


def gaussian_entropy(log_std):
    return jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e), axis=-1)


def compute_gae(rewards, values, dones, time_outs, last_value, gamma, lam):
    """Generalized advantage estimation over a (T, E) rollout.

    rsl-rl semantics: bootstrap on time-outs (reward += gamma * value) happens
    before calling this; dones cut the trace.
    """
    T = rewards.shape[0]

    def body(carry, t):
        gae = carry
        next_value = jnp.where(t == T - 1, last_value, values[(t + 1) % T])
        not_done = 1.0 - dones[t].astype(jnp.float32)
        delta = rewards[t] + gamma * next_value * not_done - values[t]
        gae = delta + gamma * lam * not_done * gae
        return gae, gae

    _, adv_rev = jax.lax.scan(
        body, jnp.zeros_like(last_value), jnp.arange(T - 1, -1, -1)
    )
    advantages = adv_rev[::-1]
    returns = advantages + values
    return advantages, returns


class PPOUpdateState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    learning_rate: jnp.ndarray


def make_optimizer(cfg: RslRlPpoAlgorithmCfg):
    """Gradient transform WITHOUT a learning rate: the (possibly adaptive) LR
    is applied functionally by scaling the Adam-normalized update at each
    minibatch, so no optimizer-state internals are ever mutated in-trace."""
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.scale_by_adam(),
    )


def gaussian_kl(old_mean, old_log_std, new_mean, new_log_std):
    """Exact KL(old || new) between diagonal Gaussians, matching rsl-rl's
    adaptive-KL formula (rsl_rl PPO.update): sigma-aware, summed over the
    action dim, averaged over the batch."""
    return jnp.mean(
        jnp.sum(
            new_log_std
            - old_log_std
            + (jnp.exp(2.0 * old_log_std) + jnp.square(old_mean - new_mean))
            / (2.0 * jnp.exp(2.0 * new_log_std))
            - 0.5,
            axis=-1,
        )
    )


def ppo_update(
    apply_fn,
    state: PPOUpdateState,
    optimizer,
    batch: Transition,
    advantages,
    returns,
    cfg: RslRlPpoAlgorithmCfg,
    key,
    aux_loss_fn=None,
    old_log_std=None,
):
    """Epochs x minibatches of clipped PPO with adaptive-KL LR
    (rsl-rl PPO.update equivalent). ``batch`` arrays are (N, ...) flattened.

    ``aux_loss_fn(params, mb) -> scalar`` adds an algorithm-variant loss (the
    fork's PPOCA cascade loss, reference rl_cfg.py:166-170).
    ``old_log_std`` is the rollout policy's (A,) log-std vector; with it the
    adaptive-KL scheduler uses the exact Gaussian KL (rsl-rl formula),
    otherwise the mean-logp surrogate."""
    N = batch.obs.shape[0]
    mb_size = N // cfg.num_mini_batches
    if not cfg.normalize_advantage_per_mini_batch:
        advantages = (advantages - advantages.mean()) / (advantages.std() + 1e-8)

    def loss_fn(params, mb, adv, ret):
        mean, log_std, value = apply_fn(params, mb.obs, mb.critic_obs)
        log_prob = gaussian_log_prob(mean, log_std, mb.action)
        ratio = jnp.exp(log_prob - mb.log_prob)
        adv_n = adv
        if cfg.normalize_advantage_per_mini_batch:
            adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
        surr1 = ratio * adv_n
        surr2 = jnp.clip(ratio, 1 - cfg.clip_param, 1 + cfg.clip_param) * adv_n
        policy_loss = -jnp.mean(jnp.minimum(surr1, surr2))
        if cfg.use_clipped_value_loss:
            v_clipped = mb.value + jnp.clip(
                value - mb.value, -cfg.clip_param, cfg.clip_param
            )
            value_loss = jnp.mean(
                jnp.maximum(
                    jnp.square(value - ret), jnp.square(v_clipped - ret)
                )
            )
        else:
            value_loss = jnp.mean(jnp.square(value - ret))
        entropy = jnp.mean(gaussian_entropy(log_std))
        total = (
            policy_loss
            + cfg.value_loss_coef * value_loss
            - cfg.entropy_coef * entropy
        )
        if aux_loss_fn is not None:
            total = total + aux_loss_fn(params, mb)
        # adaptive-LR KL: exact Gaussian KL when the old sigma is known
        # (rsl-rl PPO.update), surrogate mean-logp-diff otherwise
        if old_log_std is not None:
            kl = gaussian_kl(mb.mean, old_log_std, mean, log_std)
        else:
            kl = jnp.mean(mb.log_prob - log_prob)
        return total, (policy_loss, value_loss, entropy, kl)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    # Pack every field the update reads into ONE (N, F) buffer so each epoch
    # shuffles with a single row-gather. The previous form gathered 9 arrays
    # per minibatch (~180 scattered row-gathers per update at ~10 ns/element)
    # — measured as the whole train column's bottleneck (cartpole train
    # 14.3k env-steps/s while stepping runs at 21M/s).
    A = batch.action.shape[-1]
    obs_dim = batch.obs.shape[-1]
    cobs_dim = batch.critic_obs.shape[-1]
    packed = jnp.concatenate(
        [
            batch.obs,
            batch.critic_obs,
            batch.action,
            batch.mean,
            batch.log_prob[:, None],
            batch.value[:, None],
            advantages[:, None],
            returns[:, None],
        ],
        axis=-1,
    )

    def unpack(mb):
        o = 0
        obs = mb[:, o:o + obs_dim]; o += obs_dim
        cobs = mb[:, o:o + cobs_dim]; o += cobs_dim
        action = mb[:, o:o + A]; o += A
        mean = mb[:, o:o + A]; o += A
        log_prob = mb[:, o]; o += 1
        value = mb[:, o]; o += 1
        adv = mb[:, o]; o += 1
        ret = mb[:, o]
        zeros = jnp.zeros_like(log_prob)
        trans = Transition(
            obs=obs, critic_obs=cobs, action=action, log_prob=log_prob,
            value=value, reward=zeros, done=zeros, time_out=zeros, mean=mean,
        )
        return trans, adv, ret

    def minibatch_step(carry, mb_packed):
        params, opt_state, lr = carry
        mb, adv, ret = unpack(mb_packed)
        (loss, (pl, vl, ent, kl)), grads = grad_fn(params, mb, adv, ret)
        # collective-friendly: grads are averaged by pmean at the caller when
        # running data-parallel (runner wraps this in shard_map)
        if cfg.schedule == "adaptive" and cfg.desired_kl is not None:
            lr = jnp.where(kl > cfg.desired_kl * 2.0, jnp.maximum(lr / 1.5, 1e-5), lr)
            lr = jnp.where(
                (kl < cfg.desired_kl / 2.0) & (kl > 0.0),
                jnp.minimum(lr * 1.5, 1e-2),
                lr,
            )
        updates, opt_state_new = optimizer.update(grads, opt_state, params)
        # apply the (adaptive) LR functionally on the Adam-normalized update
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(params, updates)
        return (params, opt_state_new, lr), jnp.stack([loss, pl, vl, ent, kl])

    def epoch_step(carry, k):
        perm = jax.random.permutation(k, N)
        # ONE gather for the whole epoch's shuffle, then minibatches are
        # contiguous slices (same membership as gathering per minibatch)
        shuf = packed[perm[: mb_size * cfg.num_mini_batches]]
        mbs = shuf.reshape(cfg.num_mini_batches, mb_size, -1)
        carry, metrics = jax.lax.scan(minibatch_step, carry, mbs)
        return carry, metrics

    keys = jax.random.split(key, cfg.num_learning_epochs)
    (params, opt_state, lr), metrics = jax.lax.scan(
        epoch_step, (state.params, state.opt_state, state.learning_rate), keys
    )
    metrics = jnp.mean(metrics.reshape(-1, 5), axis=0)
    return (
        PPOUpdateState(params=params, opt_state=opt_state, learning_rate=lr),
        {
            "loss": metrics[0],
            "policy_loss": metrics[1],
            "value_loss": metrics[2],
            "entropy": metrics[3],
            "kl": metrics[4],
            "learning_rate": lr,
        },
    )


def ppo_update_recurrent(
    apply_seq_fn,
    state: PPOUpdateState,
    optimizer,
    traj: Transition,
    init_carry,
    advantages,
    returns,
    cfg: RslRlPpoAlgorithmCfg,
    key,
    old_log_std=None,
):
    """Recurrent-policy PPO update (rsl-rl recurrent PPO equivalent).

    Trajectories stay time-major ``(T, E, ...)``; minibatches are formed over
    the *env* axis so each minibatch is a set of complete sequences replayed
    through the LSTM from its stored rollout-start carry (``init_carry``,
    leaves ``(E, H)``). ``apply_seq_fn(params, obs, critic_obs, carry0, dones)
    -> (mean, log_std, value)`` replays a full sequence, resetting the carry
    where ``dones`` is set (matching the rollout-side masking).
    """
    T, E = traj.reward.shape
    mb_envs = E // cfg.num_mini_batches
    if not cfg.normalize_advantage_per_mini_batch:
        advantages = (advantages - advantages.mean()) / (advantages.std() + 1e-8)

    def loss_fn(params, mb, carry0, adv, ret):
        mean, log_std, value = apply_seq_fn(
            params, mb.obs, mb.critic_obs, carry0, mb.done
        )
        log_prob = gaussian_log_prob(mean, log_std, mb.action)
        ratio = jnp.exp(log_prob - mb.log_prob)
        adv_n = adv
        if cfg.normalize_advantage_per_mini_batch:
            adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
        surr1 = ratio * adv_n
        surr2 = jnp.clip(ratio, 1 - cfg.clip_param, 1 + cfg.clip_param) * adv_n
        policy_loss = -jnp.mean(jnp.minimum(surr1, surr2))
        if cfg.use_clipped_value_loss:
            v_clipped = mb.value + jnp.clip(
                value - mb.value, -cfg.clip_param, cfg.clip_param
            )
            value_loss = jnp.mean(
                jnp.maximum(jnp.square(value - ret), jnp.square(v_clipped - ret))
            )
        else:
            value_loss = jnp.mean(jnp.square(value - ret))
        entropy = jnp.mean(gaussian_entropy(log_std))
        total = (
            policy_loss
            + cfg.value_loss_coef * value_loss
            - cfg.entropy_coef * entropy
        )
        if old_log_std is not None:
            kl = gaussian_kl(mb.mean, old_log_std, mean, log_std)
        else:
            kl = jnp.mean(mb.log_prob - log_prob)
        return total, (policy_loss, value_loss, entropy, kl)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def minibatch_step(carry, idx):
        params, opt_state, lr = carry
        mb = jax.tree.map(lambda x: x[:, idx], traj)
        c0 = jax.tree.map(lambda x: x[idx], init_carry)
        adv = advantages[:, idx]
        ret = returns[:, idx]
        (loss, (pl, vl, ent, kl)), grads = grad_fn(params, mb, c0, adv, ret)
        if cfg.schedule == "adaptive" and cfg.desired_kl is not None:
            lr = jnp.where(kl > cfg.desired_kl * 2.0, jnp.maximum(lr / 1.5, 1e-5), lr)
            lr = jnp.where(
                (kl < cfg.desired_kl / 2.0) & (kl > 0.0),
                jnp.minimum(lr * 1.5, 1e-2),
                lr,
            )
        updates, opt_state_new = optimizer.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(params, updates)
        return (params, opt_state_new, lr), jnp.stack([loss, pl, vl, ent, kl])

    def epoch_step(carry, k):
        perm = jax.random.permutation(k, E)
        idxs = perm[: mb_envs * cfg.num_mini_batches].reshape(
            cfg.num_mini_batches, mb_envs
        )
        carry, metrics = jax.lax.scan(minibatch_step, carry, idxs)
        return carry, metrics

    keys = jax.random.split(key, cfg.num_learning_epochs)
    (params, opt_state, lr), metrics = jax.lax.scan(
        epoch_step, (state.params, state.opt_state, state.learning_rate), keys
    )
    metrics = jnp.mean(metrics.reshape(-1, 5), axis=0)
    return (
        PPOUpdateState(params=params, opt_state=opt_state, learning_rate=lr),
        {
            "loss": metrics[0],
            "policy_loss": metrics[1],
            "value_loss": metrics[2],
            "entropy": metrics[3],
            "kl": metrics[4],
            "learning_rate": lr,
        },
    )
