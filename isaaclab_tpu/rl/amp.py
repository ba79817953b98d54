"""Adversarial Motion Priors runner (reference: humanoid AMP tasks trained
with skrl's AMP agent; SURVEY.md §2.12 humanoid AMP row).

PPO + a discriminator trained to tell reference-motion AMP windows from
policy-generated ones; the policy is rewarded with the style reward
``-log(1 - D)`` added to the (small) task reward. Reference windows come from
``env.collect_reference_motions`` (the MotionLoader contract)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .networks import MLP
from .ppo import compute_gae, ppo_update
from .runner import OnPolicyRunner, TrainState
from .rl_cfg import RslRlOnPolicyRunnerCfg
from ..utils.configclass import configclass


@configclass
class AmpCfg:
    """Discriminator + style-reward knobs (skrl AMP agent equivalents)."""

    discriminator_hidden_dims: list = [1024, 512]
    discriminator_learning_rate: float = 5e-5
    style_reward_weight: float = 1.0
    task_reward_weight: float = 1.0
    gradient_penalty_coeff: float = 5.0
    num_reference_batches: int = 64  # pre-sampled reference windows (static)


class AMPOnPolicyRunner(OnPolicyRunner):
    """OnPolicyRunner + AMP discriminator (feed-forward policies)."""

    def __init__(self, env, train_cfg: RslRlOnPolicyRunnerCfg,
                 amp_cfg: AmpCfg = None, log_dir=None, device="tpu"):
        super().__init__(env, train_cfg, log_dir=log_dir, device=device)
        self.amp_cfg = amp_cfg or AmpCfg()
        uenv = env.unwrapped
        self.amp_dim = uenv.amp_observation_size
        self._disc = MLP(
            tuple(self.amp_cfg.discriminator_hidden_dims), 1
        )
        self._disc_optimizer = optax.adam(
            self.amp_cfg.discriminator_learning_rate
        )
        # pre-sample reference windows on host (static buffer; re-sampled
        # windows are sliced by the jitted update)
        ref = uenv.collect_reference_motions(
            self.amp_cfg.num_reference_batches * self.num_steps
        )
        self._reference = jnp.asarray(np.asarray(ref, dtype=np.float32))
        self._amp_state = None

    def _init_amp_state(self, key):
        params = self._disc.init(key, jnp.zeros((1, self.amp_dim)))
        return {"params": params, "opt": self._disc_optimizer.init(params)}

    def _style_reward(self, disc_params, amp_obs):
        logit = self._disc.apply(disc_params, amp_obs)[..., 0]
        prob = jax.nn.sigmoid(logit)
        return -jnp.log(jnp.maximum(1.0 - prob, 1e-4))

    def _train_iteration_amp(self, state: TrainState, amp_state):
        (env_state, last_obs, last_cobs, key, carry, traj, raw_rewards,
         logs) = self._rollout(state)
        logs = dict(logs)
        amp_obs = logs.pop("amp_obs")  # (T, E, amp_dim)
        flat_amp = amp_obs.reshape((-1, self.amp_dim))

        style = self._style_reward(amp_state["params"], amp_obs)
        c = self.amp_cfg
        rewards = (
            c.task_reward_weight * traj.reward
            + c.style_reward_weight * style
        )
        traj = traj._replace(reward=rewards)

        _, old_log_std, last_value = self._apply(
            state.update.params, last_obs,
            last_cobs if self.separate_critic else last_obs,
        )
        advantages, returns = compute_gae(
            traj.reward, traj.value, traj.done, traj.time_out, last_value,
            self.alg_cfg.gamma, self.alg_cfg.lam,
        )
        flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), traj)
        key, k_up, k_ref = jax.random.split(key, 3)
        update, metrics = ppo_update(
            self._apply, state.update, self.optimizer, flat,
            advantages.reshape(-1), returns.reshape(-1), self.alg_cfg, k_up,
            old_log_std=old_log_std,
        )

        # --- discriminator update: ref=1, policy=0, + R1 penalty on ref ---
        n = flat_amp.shape[0]
        ref_idx = jax.random.randint(
            k_ref, (n,), 0, self._reference.shape[0]
        )
        ref_batch = self._reference[ref_idx]

        def disc_loss(params):
            ref_logit = self._disc.apply(params, ref_batch)[..., 0]
            pol_logit = self._disc.apply(params, flat_amp)[..., 0]
            bce = jnp.mean(jax.nn.softplus(-ref_logit)) + jnp.mean(
                jax.nn.softplus(pol_logit)
            )
            # gradient penalty on reference samples (AMP paper R1)
            grad = jax.grad(
                lambda x: jnp.sum(self._disc.apply(params, x))
            )(ref_batch)
            gp = jnp.mean(jnp.sum(jnp.square(grad), axis=-1))
            return bce + self.amp_cfg.gradient_penalty_coeff * gp, (bce, gp)

        (dl, (bce, gp)), grads = jax.value_and_grad(
            disc_loss, has_aux=True
        )(amp_state["params"])
        updates, opt = self._disc_optimizer.update(grads, amp_state["opt"])
        amp_state = {
            "params": optax.apply_updates(amp_state["params"], updates),
            "opt": opt,
        }

        metrics = dict(metrics)
        metrics["disc_loss"] = bce
        metrics["disc_grad_penalty"] = gp
        metrics["style_reward"] = jnp.mean(style)
        metrics["mean_reward_per_step"] = jnp.mean(raw_rewards)
        for k, v in logs.items():
            metrics[k] = jnp.mean(v)
        new_state = state._replace(
            update=update, env_state=env_state, last_obs=last_obs,
            last_critic_obs=last_cobs, key=key, iteration=state.iteration + 1,
            carry=carry,
        )
        return new_state, amp_state, metrics

    def learn(self, num_learning_iterations: int | None = None, **_):
        iterations = num_learning_iterations or self.cfg.max_iterations
        if self.state is None:
            self.state = jax.jit(self._init_train_state_from_key)(
                jax.random.PRNGKey(self.cfg.seed)
            )
        if self._amp_state is None:
            self._amp_state = jax.jit(self._init_amp_state)(
                jax.random.PRNGKey(self.cfg.seed + 1)
            )
        fn = jax.jit(self._train_iteration_amp)
        metrics = {}
        for it in range(iterations):
            self.state, self._amp_state, metrics = fn(
                self.state, self._amp_state
            )
            if it % 10 == 0 or it == iterations - 1:
                m = {k: float(v) for k, v in metrics.items()}
                print(
                    f"it {it:4d} | style {m.get('style_reward', 0):7.3f} | "
                    f"disc {m.get('disc_loss', 0):7.3f}", flush=True,
                )
        return self.state, metrics
