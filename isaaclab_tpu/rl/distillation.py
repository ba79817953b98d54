"""Student-teacher distillation runner (reference rsl-rl ``Distillation``
algorithm + ``StudentTeacher`` policy; SURVEY.md §2.11).

DAgger-style: the STUDENT acts in the env (so it visits its own state
distribution); at every visited state the frozen TEACHER is queried and the
student is regressed onto the teacher's action. Asymmetric setups give the
teacher the privileged ``critic`` observation group.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from .networks import MLP
from .rl_cfg import (
    RslRlDistillationAlgorithmCfg,
    RslRlDistillationStudentTeacherCfg,
)


class DistillState(NamedTuple):
    student_params: dict
    opt_state: optax.OptState
    env_state: object
    last_obs: jnp.ndarray
    last_teacher_obs: jnp.ndarray
    key: jnp.ndarray
    iteration: jnp.ndarray


class DistillationRunner:
    """learn() trains the student to imitate a frozen teacher policy."""

    def __init__(self, env, policy_cfg: RslRlDistillationStudentTeacherCfg,
                 alg_cfg: RslRlDistillationAlgorithmCfg,
                 teacher_apply, num_steps_per_env: int = 24):
        """``teacher_apply(obs) -> action`` is the frozen teacher (e.g. from
        OnPolicyRunner.get_inference_policy())."""
        self.env = env
        self.policy_cfg = policy_cfg
        self.alg_cfg = alg_cfg
        self.teacher_apply = teacher_apply
        self.num_steps = num_steps_per_env

        uenv = env.unwrapped
        self.num_envs = uenv.num_envs
        if hasattr(uenv, "observation_manager"):
            om = uenv.observation_manager
            self.obs_dim = om.group_obs_dim("policy")[0]
            self.teacher_group = (
                "critic" if "critic" in om.group_names() else "policy"
            )
            self.num_actions = uenv.action_manager.total_action_dim
        else:
            self.obs_dim = uenv.num_observations
            self.teacher_group = "policy"
            self.num_actions = uenv.num_actions

        self.student = MLP(
            tuple(policy_cfg.student_hidden_dims),
            self.num_actions,
            policy_cfg.activation,
        )
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(alg_cfg.max_grad_norm),
            optax.adam(alg_cfg.learning_rate),
        )
        self._iter_fn = None

    def init_state(self, seed: int = 0) -> DistillState:
        key = jax.random.PRNGKey(seed)
        k_net, k_env, key = jax.random.split(key, 3)
        uenv = self.env.unwrapped
        env_state = uenv.init_state(k_env)
        if hasattr(uenv, "observation_manager"):
            ctx = uenv.make_context(env_state)
            k_obs, key = jax.random.split(key)
            obs_d, obs_state = uenv.observation_manager.compute(
                ctx, env_state.obs, k_obs
            )
            env_state = env_state._replace(obs=obs_state)
        else:
            obs_d = uenv._get_observations(env_state)
        obs = obs_d["policy"]
        teacher_obs = obs_d.get(self.teacher_group, obs)
        params = self.student.init(k_net, jnp.zeros((1, self.obs_dim)))
        return DistillState(
            student_params=params,
            opt_state=self.optimizer.init(params),
            env_state=env_state,
            last_obs=obs,
            last_teacher_obs=teacher_obs,
            key=key,
            iteration=jnp.asarray(0, dtype=jnp.int32),
        )

    def _iteration(self, state: DistillState):
        uenv = self.env.unwrapped
        noise = self.policy_cfg.init_noise_std

        def rollout_step(carry, _):
            env_state, obs, teacher_obs, key = carry
            key, k = jax.random.split(key)
            act = self.student.apply(state.student_params, obs)
            act = act + noise * jax.random.normal(k, act.shape)
            env_state, (obs_d, _r, _t, _to, _e) = uenv.step_state(
                env_state, act
            )
            next_obs = obs_d["policy"]
            next_teacher = obs_d.get(self.teacher_group, next_obs)
            return (env_state, next_obs, next_teacher, key), (obs, teacher_obs)

        (env_state, last_obs, last_teacher, key), (obs_traj, teacher_traj) = (
            jax.lax.scan(
                rollout_step,
                (state.env_state, state.last_obs, state.last_teacher_obs,
                 state.key),
                None,
                length=self.num_steps,
            )
        )
        flat_obs = obs_traj.reshape((-1, obs_traj.shape[-1]))
        flat_teacher = teacher_traj.reshape((-1, teacher_traj.shape[-1]))
        target = jax.lax.stop_gradient(self.teacher_apply(flat_teacher))

        def epoch(carry, _):
            params, opt_state = carry

            def loss_fn(p):
                pred = self.student.apply(p, flat_obs)
                return jnp.mean(jnp.square(pred - target))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            epoch, (state.student_params, state.opt_state), None,
            length=self.alg_cfg.num_learning_epochs,
        )
        new_state = DistillState(
            student_params=params,
            opt_state=opt_state,
            env_state=env_state,
            last_obs=last_obs,
            last_teacher_obs=last_teacher,
            key=key,
            iteration=state.iteration + 1,
        )
        return new_state, {"bc_loss": jnp.mean(losses)}

    def learn(self, iterations: int, seed: int = 0):
        state = self.init_state(seed)
        if self._iter_fn is None:
            self._iter_fn = jax.jit(self._iteration)
        metrics = {}
        for _ in range(iterations):
            state, metrics = self._iter_fn(state)
        return state, metrics

    def get_inference_policy(self, state: DistillState):
        params = state.student_params

        @jax.jit
        def policy(obs):
            return self.student.apply(params, obs)

        return policy
