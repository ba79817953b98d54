"""On-policy runner (the in-repo ``rsl_rl.runners.OnPolicyRunner`` replacement;
reference call stack SURVEY.md §3.1).

One training iteration — on-device ``lax.scan`` rollout over the env's pure
step + the PPO update — compiles to a single jitted function; the host loop
only logs and checkpoints. Data parallelism (SURVEY.md §2.10 parallelism
inventory) shards envs over the mesh's ``data`` axis via sharding constraints:
gradients are averaged by XLA-inserted collectives, the learner stays
replicated.

Supports manager-based AND direct envs, feed-forward / recurrent (LSTM) /
cascade actor-critics, and the fork's PPOCA algorithm variant
(reference rl_cfg.py:22-34,166-170).
"""

from __future__ import annotations

import os
import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .networks import (
    ActorCritic,
    ActorCriticCascade,
    ActorCriticRecurrent,
    NormalizerState,
    normalize_obs,
    normalizer_update,
)
from .ppo import (
    PPOUpdateState,
    Transition,
    compute_gae,
    gaussian_log_prob,
    make_optimizer,
    ppo_update,
    ppo_update_recurrent,
)
from .rl_cfg import RslRlOnPolicyRunnerCfg


def _from_state_dict_tolerant(target, state_dict):
    """``flax.serialization.from_state_dict`` that tolerates schema growth:
    fields present in ``target`` (a pytree of namedtuples/dicts) but absent
    from the checkpoint keep their current value instead of failing, so old
    full-state checkpoints stay loadable after state pytrees gain fields."""
    from flax import serialization

    if isinstance(state_dict, dict):
        if hasattr(target, "_fields"):  # namedtuple
            kept = {
                k: _from_state_dict_tolerant(getattr(target, k), v)
                for k, v in state_dict.items()
                if k in target._fields
            }
            return target._replace(**kept)
        if isinstance(target, dict):
            return {
                k: (
                    _from_state_dict_tolerant(target[k], state_dict[k])
                    if k in state_dict
                    else v
                )
                for k, v in target.items()
            }
    try:
        return serialization.from_state_dict(target, state_dict)
    except ValueError:
        return target


class TrainState(NamedTuple):
    update: PPOUpdateState
    env_state: object
    last_obs: jnp.ndarray
    last_critic_obs: jnp.ndarray
    normalizer: NormalizerState
    critic_normalizer: NormalizerState
    key: jnp.ndarray
    iteration: jnp.ndarray
    carry: object = ()  # recurrent policies: RecurrentCarry pytree, else ()
    rnd: object = ()  # RND exploration state (params + opt), else ()


class OnPolicyRunner:
    """Reference ``OnPolicyRunner`` API: ``learn``, ``save``, ``load``,
    ``get_inference_policy`` (train.py:167,183)."""

    def __init__(self, env, train_cfg: RslRlOnPolicyRunnerCfg, log_dir=None,
                 device="tpu"):
        self.env = env
        self.cfg = train_cfg
        self.alg_cfg = train_cfg.algorithm
        self.policy_cfg = train_cfg.policy
        self.log_dir = log_dir
        self.device = device

        uenv = env.unwrapped
        self.num_envs = uenv.num_envs
        self.num_steps = int(train_cfg.num_steps_per_env)

        # obs/action dims: manager-based envs expose managers; direct envs
        # expose num_observations/num_states/num_actions (direct_rl_env.py)
        self._is_manager_based = hasattr(uenv, "observation_manager")
        if self._is_manager_based:
            om = uenv.observation_manager
            self.obs_dim = om.group_obs_dim("policy")[0]
            self.separate_critic = "critic" in om.group_names()
            self.critic_obs_dim = om.group_obs_dim(
                "critic" if self.separate_critic else "policy"
            )[0]
            self.num_actions = uenv.action_manager.total_action_dim
        else:
            self.obs_dim = uenv.num_observations
            self.separate_critic = getattr(uenv, "num_states", 0) > 0
            self.critic_obs_dim = (
                uenv.num_states if self.separate_critic else self.obs_dim
            )
            self.num_actions = uenv.num_actions

        self.recurrent = self.policy_cfg.class_name == "ActorCriticRecurrent"
        if self.recurrent:
            self.net = ActorCriticRecurrent(
                num_actions=self.num_actions,
                actor_dims=tuple(self.policy_cfg.actor_hidden_dims),
                critic_dims=tuple(self.policy_cfg.critic_hidden_dims),
                hidden_size=getattr(self.policy_cfg, "rnn_hidden_size", 256),
                activation=self.policy_cfg.activation,
                init_noise_std=self.policy_cfg.init_noise_std,
            )
        elif self.policy_cfg.class_name == "ActorCriticCascade":
            self.net = ActorCriticCascade(
                num_actions=self.num_actions,
                lidar_input_dim=self.policy_cfg.lidar_input_dim,
                mlp1_state_dim=self.policy_cfg.mlp1_state_dim,
                mlp2_state_dim=self.policy_cfg.mlp2_state_dim,
                mlp1_dims=tuple(self.policy_cfg.mlp1_hidden_dims),
                mlp2_dims=tuple(self.policy_cfg.mlp2_hidden_dims),
                mlp1_out_dim=self.policy_cfg.mlp1_out_dim,
                mlp2_out_dim=self.policy_cfg.mlp2_out_dim,
                critic_dims=tuple(self.policy_cfg.critic_hidden_dims),
                activation=self.policy_cfg.activation,
                init_noise_std=self.policy_cfg.init_noise_std,
            )
        else:
            self.net = ActorCritic(
                num_actions=self.num_actions,
                actor_dims=tuple(self.policy_cfg.actor_hidden_dims),
                critic_dims=tuple(self.policy_cfg.critic_hidden_dims),
                activation=self.policy_cfg.activation,
                init_noise_std=self.policy_cfg.init_noise_std,
            )
        self.optimizer = make_optimizer(self.alg_cfg)
        # RND exploration bonus (reference rsl-rl rnd_cfg)
        rnd_cfg = getattr(self.alg_cfg, "rnd_cfg", None)
        self.rnd_cfg = rnd_cfg if (rnd_cfg and rnd_cfg.weight > 0) else None
        if self.rnd_cfg:
            import optax

            from .networks import MLP

            self._rnd_target = MLP(
                tuple(self.rnd_cfg.target_hidden_dims),
                self.rnd_cfg.num_outputs,
            )
            self._rnd_predictor = MLP(
                tuple(self.rnd_cfg.predictor_hidden_dims),
                self.rnd_cfg.num_outputs,
            )
            self._rnd_optimizer = optax.adam(self.rnd_cfg.learning_rate)
        self.symmetry_cfg = getattr(self.alg_cfg, "symmetry_cfg", None)
        self._train_iter_fn = None
        self.writer = None
        self.state: TrainState | None = None

    # ------------------------------------------------------------------
    # Env adapter: manager-based vs direct
    # ------------------------------------------------------------------
    def _env_reset(self, key):
        """Returns (env_state, obs, critic_obs|None)."""
        uenv = self.env.unwrapped
        k_env, k_obs = jax.random.split(key)
        env_state = uenv.init_state(k_env)
        if self._is_manager_based:
            ctx = uenv.make_context(env_state)
            obs_dict, obs_state = uenv.observation_manager.compute(
                ctx, env_state.obs, k_obs
            )
            env_state = env_state._replace(obs=obs_state)
        else:
            obs_dict = uenv._get_observations(env_state)
        obs = obs_dict["policy"]
        critic_obs = obs_dict["critic"] if self.separate_critic else None
        return env_state, obs, critic_obs

    def _env_step(self, env_state, action):
        """Returns (env_state, obs, critic_obs|None, reward, term, to, log)."""
        uenv = self.env.unwrapped
        env_state, (obs_d, reward, terminated, time_outs, extras) = (
            uenv.step_state(env_state, action)
        )
        obs = obs_d["policy"]
        critic_obs = obs_d["critic"] if self.separate_critic else None
        return (
            env_state, obs, critic_obs, reward, terminated, time_outs,
            extras.get("log", {}),
        )

    # ------------------------------------------------------------------
    def _apply(self, params, obs, critic_obs):
        return self.net.apply(params, obs, critic_obs)

    def _apply_seq(self, params, obs, critic_obs, carry0, dones):
        """Replay a (T, E, D) sequence through the recurrent net, resetting
        the carry where ``dones`` (T, E) is set — mirrors the rollout."""

        def step(carry, inp):
            o, co, d = inp
            mean, log_std, value, carry = self.net.apply(params, o, carry, co)
            carry = jax.tree.map(
                lambda c: jnp.where(d[:, None], 0.0, c), carry
            )
            return carry, (mean, log_std, value)

        _, (mean, log_std, value) = jax.lax.scan(
            step, carry0, (obs, critic_obs, dones)
        )
        # log_std is a per-parameter (A,) vector that scan stacked to (T, A);
        # reshape so it broadcasts against (T, E, A)
        return mean, log_std[:, None, :], value

    def _cascade_aux_loss(self, params, mb):
        """PPOCA cascade loss (fork rl_cfg.py:166-170): keep the stage-1
        guidance output a unit direction vector (the GuideCa design intent —
        mlp1 emits a 3d guide that mlp2 consumes)."""
        coef = getattr(self.alg_cfg, "cascade_loss_coef", 0.0)
        _, inter = self.net.apply(
            params, mb.obs, mb.critic_obs,
            capture_intermediates=lambda mdl, _: mdl.name == "mlp1_out",
        )
        guide = jax.tree.leaves(inter["intermediates"])[0]
        # safe norm: plain norm has a NaN gradient at exactly zero (the init)
        norm = jnp.sqrt(jnp.sum(jnp.square(guide), axis=-1) + 1e-8)
        return coef * jnp.mean(jnp.square(norm - 1.0))

    def init_train_state(self, seed: int | None = None) -> TrainState:
        seed = seed if seed is not None else self.cfg.seed
        return self._init_train_state_from_key(jax.random.PRNGKey(seed))

    def _init_train_state_from_key(self, key) -> TrainState:
        k_net, k_env, key = jax.random.split(key, 3)
        env_state, obs, critic_obs = self._env_reset(k_env)
        dummy_obs = jnp.zeros((1, self.obs_dim))
        dummy_cobs = jnp.zeros((1, self.critic_obs_dim))
        if self.recurrent:
            carry = self.net.init_carry(self.num_envs)
            c1 = self.net.init_carry(1)
            params = self.net.init(k_net, dummy_obs, c1, dummy_cobs)
        else:
            carry = ()
            params = self.net.init(k_net, dummy_obs, dummy_cobs)
        opt_state = self.optimizer.init(params)
        return TrainState(
            update=PPOUpdateState(
                params=params,
                opt_state=opt_state,
                learning_rate=jnp.asarray(self.alg_cfg.learning_rate),
            ),
            env_state=env_state,
            last_obs=obs,
            last_critic_obs=critic_obs,
            normalizer=NormalizerState.create(self.obs_dim),
            critic_normalizer=NormalizerState.create(self.critic_obs_dim),
            key=key,
            iteration=jnp.asarray(0, dtype=jnp.int32),
            carry=carry,
            rnd=self._init_rnd_state(k_net) if self.rnd_cfg else (),
        )

    def _init_rnd_state(self, key):
        import jax as _jax

        k1, k2 = _jax.random.split(key)
        dummy = jnp.zeros((1, self.obs_dim))
        target = self._rnd_target.init(k1, dummy)
        predictor = self._rnd_predictor.init(k2, dummy)
        return {
            "target": target,
            "predictor": predictor,
            "opt": self._rnd_optimizer.init(predictor),
        }

    def _intrinsic_reward(self, rnd, obs):
        t = self._rnd_target.apply(rnd["target"], obs)
        p = self._rnd_predictor.apply(rnd["predictor"], obs)
        return self.rnd_cfg.weight * jnp.mean(jnp.square(t - p), axis=-1)

    # ------------------------------------------------------------------
    def _rollout(self, state: TrainState):
        """num_steps x env.step_state under lax.scan; returns (T, E, ...)."""
        use_norm = self.cfg.empirical_normalization

        def step(carry_all, _):
            env_state, obs, critic_obs, key, carry = carry_all
            cobs = critic_obs if self.separate_critic else obs
            key, k_act = jax.random.split(key)
            n_obs = normalize_obs(state.normalizer, obs) if use_norm else obs
            n_cobs = (
                normalize_obs(state.critic_normalizer, cobs)
                if use_norm
                else cobs
            )
            if self.recurrent:
                mean, log_std, value, new_carry = self.net.apply(
                    state.update.params, n_obs, carry, n_cobs
                )
            else:
                mean, log_std, value = self._apply(
                    state.update.params, n_obs, n_cobs
                )
                new_carry = carry
            action = mean + jnp.exp(log_std) * jax.random.normal(
                k_act, mean.shape
            )
            log_prob = gaussian_log_prob(mean, log_std, action)
            env_state, next_obs, next_cobs, reward, terminated, time_outs, log = (
                self._env_step(env_state, action)
            )
            done = terminated | time_outs
            if self.recurrent:  # reset carry of done envs
                new_carry = jax.tree.map(
                    lambda c: jnp.where(done[:, None], 0.0, c), new_carry
                )
            if self.rnd_cfg:
                reward = reward + self._intrinsic_reward(state.rnd, n_obs)
            # rsl-rl: bootstrap value through time-outs
            reward_b = reward + self.alg_cfg.gamma * value * time_outs.astype(
                jnp.float32
            )
            trans = Transition(
                obs=n_obs,
                critic_obs=n_cobs,
                action=action,
                log_prob=log_prob,
                value=value,
                reward=reward_b,
                done=done,
                time_out=time_outs,
                mean=mean,
            )
            return (env_state, next_obs, next_cobs, key, new_carry), (
                trans, reward, log,
            )

        (env_state, last_obs, last_cobs, key, carry), (traj, raw_rewards, logs) = (
            jax.lax.scan(
                step,
                (state.env_state, state.last_obs, state.last_critic_obs,
                 state.key, state.carry),
                None,
                length=self.num_steps,
            )
        )
        return env_state, last_obs, last_cobs, key, carry, traj, raw_rewards, logs

    def _train_iteration(self, state: TrainState):
        init_carry = state.carry  # rollout-start carry, replayed in update
        (env_state, last_obs, last_cobs, key, carry, traj, raw_rewards,
         logs) = self._rollout(state)
        use_norm = self.cfg.empirical_normalization
        normalizer = state.normalizer
        critic_normalizer = state.critic_normalizer
        last_c = last_cobs if self.separate_critic else last_obs
        if use_norm:
            normalizer = normalizer_update(normalizer, traj.obs)
            if self.separate_critic:
                critic_normalizer = normalizer_update(
                    critic_normalizer, traj.critic_obs
                )
            n_last = normalize_obs(normalizer, last_obs)
            n_last_c = normalize_obs(critic_normalizer, last_c)
        else:
            n_last, n_last_c = last_obs, last_c
        if self.recurrent:
            _, old_log_std, last_value, _ = self.net.apply(
                state.update.params, n_last, carry, n_last_c
            )
        else:
            _, old_log_std, last_value = self._apply(
                state.update.params, n_last, n_last_c
            )
        # the rollout policy's sigma is a parameter vector (state-independent),
        # so this single apply recovers it exactly for the Gaussian-KL schedule

        advantages, returns = compute_gae(
            traj.reward, traj.value, traj.done, traj.time_out, last_value,
            self.alg_cfg.gamma, self.alg_cfg.lam,
        )

        key, k_up = jax.random.split(key)
        if self.recurrent:
            update, metrics = ppo_update_recurrent(
                self._apply_seq,
                state.update,
                self.optimizer,
                traj,
                init_carry,
                advantages,
                returns,
                self.alg_cfg,
                k_up,
                old_log_std=old_log_std,
            )
        else:
            flat = jax.tree.map(
                lambda x: x.reshape((-1,) + x.shape[2:]), traj
            )
            flat_adv = advantages.reshape(-1)
            flat_ret = returns.reshape(-1)
            sym = self.symmetry_cfg
            if sym and sym.use_data_augmentation and sym.data_augmentation_func:
                obs_aug, act_aug = sym.data_augmentation_func(
                    flat.obs, flat.action, self.env
                )
                cobs_aug, _ = sym.data_augmentation_func(
                    flat.critic_obs, flat.action, self.env
                )
                # mirrored samples' old-policy mean is the mirrored mean
                _, mean_aug = sym.data_augmentation_func(
                    flat.obs, flat.mean, self.env
                )
                flat = Transition(
                    obs=jnp.concatenate([flat.obs, obs_aug]),
                    critic_obs=jnp.concatenate([flat.critic_obs, cobs_aug]),
                    action=jnp.concatenate([flat.action, act_aug]),
                    log_prob=jnp.tile(flat.log_prob, 2),
                    value=jnp.tile(flat.value, 2),
                    reward=jnp.tile(flat.reward, 2),
                    done=jnp.tile(flat.done, 2),
                    time_out=jnp.tile(flat.time_out, 2),
                    mean=jnp.concatenate([flat.mean, mean_aug]),
                )
                flat_adv = jnp.tile(flat_adv, 2)
                flat_ret = jnp.tile(flat_ret, 2)
            aux_loss = (
                self._cascade_aux_loss
                if self.alg_cfg.class_name == "PPOCA"
                else None
            )
            if sym and sym.use_mirror_loss and sym.data_augmentation_func:
                base_aux = aux_loss

                def mirror_aux(params, mb, _base=base_aux, _sym=sym):
                    mean, _, _ = self._apply(params, mb.obs, mb.critic_obs)
                    obs_m, act_m = _sym.data_augmentation_func(
                        mb.obs, mean, self.env
                    )
                    mean_m, _, _ = self._apply(params, obs_m, mb.critic_obs)
                    loss = _sym.mirror_loss_coeff * jnp.mean(
                        jnp.square(mean_m - act_m)
                    )
                    if _base is not None:
                        loss = loss + _base(params, mb)
                    return loss

                aux_loss = mirror_aux
            update, metrics = ppo_update(
                self._apply,
                state.update,
                self.optimizer,
                flat,
                flat_adv,
                flat_ret,
                self.alg_cfg,
                k_up,
                aux_loss_fn=aux_loss,
                old_log_std=old_log_std,
            )
        rnd = state.rnd
        if self.rnd_cfg:
            flat_obs = traj.obs.reshape((-1, traj.obs.shape[-1]))
            target_emb = self._rnd_target.apply(rnd["target"], flat_obs)

            def rnd_loss(pp):
                pred = self._rnd_predictor.apply(pp, flat_obs)
                return jnp.mean(jnp.square(pred - target_emb))

            rl, grads = jax.value_and_grad(rnd_loss)(rnd["predictor"])
            updates, opt = self._rnd_optimizer.update(grads, rnd["opt"])
            import optax as _optax

            rnd = {
                "target": rnd["target"],
                "predictor": _optax.apply_updates(rnd["predictor"], updates),
                "opt": opt,
            }
            metrics = dict(metrics)
            metrics["rnd_loss"] = rl
        metrics = dict(metrics)
        metrics["mean_reward_per_step"] = jnp.mean(raw_rewards)
        # scan-stacked env logs: average over the rollout
        for k, v in logs.items():
            metrics[k] = jnp.mean(v)
        new_state = TrainState(
            update=update,
            env_state=env_state,
            last_obs=last_obs,
            last_critic_obs=last_cobs,
            normalizer=normalizer,
            critic_normalizer=critic_normalizer,
            key=key,
            iteration=state.iteration + 1,
            carry=carry,
            rnd=rnd,
        )
        return new_state, metrics

    # ------------------------------------------------------------------
    def learn(self, num_learning_iterations: int | None = None,
              init_at_random_ep_len: bool = False):
        iterations = num_learning_iterations or self.cfg.max_iterations
        if self.state is None:
            # jitted init: eager init is minutes of tiny dispatches on TPU
            self.state = jax.jit(
                lambda key: self._init_train_state_from_key(key)
            )(jax.random.PRNGKey(self.cfg.seed))
        if self._train_iter_fn is None:
            self._train_iter_fn = jax.jit(self._train_iteration, donate_argnums=0)

        if self.log_dir is not None:
            os.makedirs(self.log_dir, exist_ok=True)
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.writer = SummaryWriter(self.log_dir)
            except ImportError:
                self.writer = None

        steps_per_iter = self.num_steps * self.num_envs
        t_start = time.time()
        self._curves: list[dict] = getattr(self, "_curves", [])
        # iterations dispatch asynchronously; wall time is only meaningful
        # between host syncs (the float() conversions below), so fps is
        # measured over the sync-to-sync window
        t_sync = time.time()
        it_sync = 0
        for it in range(iterations):
            self.state, metrics = self._train_iter_fn(self.state)
            if it == 0:
                jax.block_until_ready(metrics)
                t_sync = time.time()  # exclude compile from the fps window
                it_sync = 1
            if self.writer is not None or it % 10 == 0 or it == iterations - 1:
                metrics_np = {k: float(v) for k, v in metrics.items()}  # syncs
                now = time.time()
                fps = (
                    (it + 1 - it_sync) * steps_per_iter / max(now - t_sync, 1e-9)
                    if it + 1 > it_sync
                    else 0.0
                )
                t_sync, it_sync = now, it + 1
                self._curves.append({"iteration": it, "fps": fps, **metrics_np})
                if self.writer is not None:
                    for k, v in metrics_np.items():
                        self.writer.add_scalar(k.replace("/", "_"), v, it)
                    self.writer.add_scalar("Perf/fps", fps, it)
                if it % 10 == 0 or it == iterations - 1:
                    print(
                        f"it {it:4d} | reward/step "
                        f"{metrics_np.get('mean_reward_per_step', 0):8.4f} | "
                        f"ep_len {metrics_np.get('Episode_Length', 0):7.1f} | "
                        f"fps {fps:,.0f}",
                        flush=True,
                    )
            if self.log_dir and self.cfg.save_interval and (
                it % self.cfg.save_interval == 0 or it == iterations - 1
            ):
                self.save(os.path.join(self.log_dir, f"model_{it}.ckpt"))
        jax.block_until_ready(self.state.update.params)
        total = time.time() - t_start
        if self.log_dir:
            import json

            with open(os.path.join(self.log_dir, "curves.json"), "w") as f:
                json.dump(self._curves, f)
        print(
            f"training done: {iterations} iters, "
            f"{iterations * steps_per_iter / total:,.0f} env-steps/s "
            "(incl. compile)", flush=True,
        )
        return self.state

    # ------------------------------------------------------------------
    def save(self, path: str, infos=None, full_state: bool = True):
        """Orbax-free checkpoint: msgpack via flax.serialization.

        ``full_state=True`` additionally snapshots the ENTIRE TrainState —
        optimizer moments, PRNG key, env state, recurrent carries — making a
        resumed run bitwise-continuable (SURVEY.md §5 env-state-resumable
        checkpoints; strictly stronger than the reference's params-only
        torch.save)."""
        from flax import serialization

        payload = {
            "params": self.state.update.params,
            "normalizer": self.state.normalizer._asdict(),
            "critic_normalizer": self.state.critic_normalizer._asdict(),
            "iteration": int(self.state.iteration),
        }
        if full_state:
            payload["train_state"] = serialization.to_state_dict(self.state)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(serialization.msgpack_serialize(jax.device_get(payload)))

    def load(self, path: str, load_optimizer: bool = True,
             load_env_state: bool = True):
        from flax import serialization

        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        if self.state is None:
            self.state = jax.jit(
                lambda key: self._init_train_state_from_key(key)
            )(jax.random.PRNGKey(self.cfg.seed))
        if load_env_state and load_optimizer and "train_state" in payload:
            self.state = _from_state_dict_tolerant(
                self.state, payload["train_state"]
            )
            return int(payload.get("iteration", 0))
        self.state = self.state._replace(
            update=self.state.update._replace(params=payload["params"]),
            normalizer=NormalizerState(**payload["normalizer"]),
            critic_normalizer=NormalizerState(**payload["critic_normalizer"]),
        )
        return payload.get("iteration", 0)

    def get_inference_policy(self, device=None):
        params = self.state.update.params
        norm = self.state.normalizer
        use_norm = self.cfg.empirical_normalization

        if self.recurrent:
            net = self.net

            @jax.jit
            def policy(obs, carry):
                n_obs = normalize_obs(norm, obs) if use_norm else obs
                mean, _, _, carry = net.apply(params, n_obs, carry, n_obs)
                return mean, carry

            return policy

        @jax.jit
        def policy(obs):
            n_obs = normalize_obs(norm, obs) if use_norm else obs
            mean, _, _ = self.net.apply(params, n_obs, n_obs)
            return mean

        return policy
