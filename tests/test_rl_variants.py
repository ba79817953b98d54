"""Runner-variant coverage: recurrent (LSTM) PPO, cascade/PPOCA, and
direct-workflow envs through the same OnPolicyRunner (the reference trains
direct tasks like Isaac-Cartpole-Direct-v0 with the identical rsl-rl runner).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _manager_env(num_envs=32):
    from isaaclab_tpu.envs import ManagerBasedRLEnv
    from isaaclab_tpu.tasks.manager_based.classic.cartpole.cartpole_env_cfg import (
        CartpoleEnvCfg,
    )

    cfg = CartpoleEnvCfg()
    cfg.scene.num_envs = num_envs
    return ManagerBasedRLEnv(cfg)


def _runner(env, policy_cfg=None, algorithm_cfg=None, **kw):
    from isaaclab_tpu.rl import OnPolicyRunner
    from isaaclab_tpu.rl.rl_cfg import (
        RslRlOnPolicyRunnerCfg,
        RslRlPpoActorCriticCfg,
        RslRlPpoAlgorithmCfg,
    )

    cfg = RslRlOnPolicyRunnerCfg(
        num_steps_per_env=8,
        max_iterations=2,
        experiment_name="test",
        policy=policy_cfg or RslRlPpoActorCriticCfg(
            actor_hidden_dims=[32, 32], critic_hidden_dims=[32, 32]
        ),
        algorithm=algorithm_cfg or RslRlPpoAlgorithmCfg(
            num_learning_epochs=2, num_mini_batches=2
        ),
        **kw,
    )
    return OnPolicyRunner(env, cfg, log_dir=None)


class TestRecurrentPPO:
    def test_train_iteration(self):
        from isaaclab_tpu.rl.rl_cfg import RslRlPpoActorCriticRecurrentCfg

        env = _manager_env()
        runner = _runner(
            env,
            policy_cfg=RslRlPpoActorCriticRecurrentCfg(
                actor_hidden_dims=[32],
                critic_hidden_dims=[32],
                rnn_hidden_size=32,
            ),
        )
        assert runner.recurrent
        state = runner.init_train_state(seed=0)
        # carry is a RecurrentCarry pytree with (E, H) leaves
        assert state.carry.actor[0].shape == (32, 32)
        new_state, metrics = jax.jit(runner._train_iteration)(state)
        assert np.isfinite(float(metrics["loss"]))
        # second iteration continues from the carried state
        new_state2, metrics2 = jax.jit(runner._train_iteration)(new_state)
        assert np.isfinite(float(metrics2["loss"]))
        assert int(new_state2.iteration) == 2

    def test_inference_policy_carries(self):
        from isaaclab_tpu.rl.rl_cfg import RslRlPpoActorCriticRecurrentCfg

        env = _manager_env(num_envs=4)
        runner = _runner(
            env,
            policy_cfg=RslRlPpoActorCriticRecurrentCfg(
                actor_hidden_dims=[16],
                critic_hidden_dims=[16],
                rnn_hidden_size=16,
            ),
        )
        runner.state = runner.init_train_state(seed=0)
        policy = runner.get_inference_policy()
        carry = runner.net.init_carry(4)
        obs = jnp.ones((4, runner.obs_dim))
        act, carry = policy(obs, carry)
        assert act.shape == (4, runner.num_actions)
        # carry actually advances (LSTM state is not identically zero)
        act2, carry2 = policy(obs, carry)
        assert not np.allclose(np.asarray(carry.actor[1]), 0.0)
        assert not np.allclose(np.asarray(act), np.asarray(act2))


class TestCascadePPOCA:
    def test_train_iteration(self):
        from isaaclab_tpu.rl.rl_cfg import (
            RslRlPpoActorCriticCascadeCfg,
            RslRlPpoCascadeAlgorithmCfg,
        )

        env = _manager_env()
        runner = _runner(
            env,
            policy_cfg=RslRlPpoActorCriticCascadeCfg(
                critic_hidden_dims=[32, 32],
                lidar_input_dim=0,
                mlp1_state_dim=2,
                mlp2_state_dim=2,
                mlp1_hidden_dims=[16],
                mlp2_hidden_dims=[32],
                mlp1_out_dim=3,
                mlp2_out_dim=16,
            ),
            algorithm_cfg=RslRlPpoCascadeAlgorithmCfg(
                num_learning_epochs=2, num_mini_batches=2,
                cascade_loss_coef=0.5,
            ),
        )
        state = runner.init_train_state(seed=0)
        new_state, metrics = jax.jit(runner._train_iteration)(state)
        assert np.isfinite(float(metrics["loss"]))


class TestDirectEnvRunner:
    def test_direct_cartpole_trains(self):
        from isaaclab_tpu.tasks.direct.cartpole.cartpole_env import (
            CartpoleDirectEnv,
            CartpoleDirectEnvCfg,
        )

        cfg = CartpoleDirectEnvCfg()
        cfg.scene.num_envs = 32
        env = CartpoleDirectEnv(cfg)
        runner = _runner(env)
        assert not runner._is_manager_based
        state = runner.init_train_state(seed=0)
        new_state, metrics = jax.jit(runner._train_iteration)(state)
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["mean_reward_per_step"]))


class TestRND:
    def test_intrinsic_reward_and_predictor_training(self):
        from isaaclab_tpu.rl.rl_cfg import (
            RslRlPpoAlgorithmCfg,
            RslRlRndCfg,
        )

        env = _manager_env()
        runner = _runner(
            env,
            algorithm_cfg=RslRlPpoAlgorithmCfg(
                num_learning_epochs=2, num_mini_batches=2,
                rnd_cfg=RslRlRndCfg(weight=0.1, num_outputs=16,
                                    predictor_hidden_dims=[32],
                                    target_hidden_dims=[32]),
            ),
        )
        assert runner.rnd_cfg is not None
        state = runner.init_train_state(seed=0)
        assert isinstance(state.rnd, dict)
        s1, m1 = jax.jit(runner._train_iteration)(state)
        s2, m2 = jax.jit(runner._train_iteration)(s1)
        assert np.isfinite(float(m1["rnd_loss"]))
        assert np.isfinite(float(m2["rnd_loss"]))
        # intrinsic reward is nonzero for unvisited states
        obs = jnp.ones((8, runner.obs_dim))
        r_int = runner._intrinsic_reward(s1.rnd, obs)
        assert float(jnp.min(r_int)) > 0.0
        # the predictor converges on a FIXED batch (the rollout distribution
        # shifts between iterations, so cross-iteration loss needn't drop)
        import optax

        rnd = state.rnd
        target = runner._rnd_target.apply(rnd["target"], obs)

        def loss_fn(p):
            return jnp.mean(
                jnp.square(runner._rnd_predictor.apply(p, obs) - target)
            )

        params, opt = rnd["predictor"], runner._rnd_optimizer.init(
            rnd["predictor"]
        )
        first = float(loss_fn(params))
        for _ in range(50):
            g = jax.grad(loss_fn)(params)
            upd, opt = runner._rnd_optimizer.update(g, opt)
            params = optax.apply_updates(params, upd)
        assert float(loss_fn(params)) < 0.5 * first


class TestSymmetry:
    def test_augmentation_doubles_batch_and_trains(self):
        from isaaclab_tpu.rl.rl_cfg import (
            RslRlPpoAlgorithmCfg,
            RslRlSymmetryCfg,
        )

        def mirror(obs, actions, env):
            # cartpole mirror: negate positions/velocities and action
            return -obs, -actions

        env = _manager_env()
        runner = _runner(
            env,
            algorithm_cfg=RslRlPpoAlgorithmCfg(
                num_learning_epochs=2, num_mini_batches=2,
                symmetry_cfg=RslRlSymmetryCfg(
                    use_data_augmentation=True,
                    use_mirror_loss=True,
                    mirror_loss_coeff=0.1,
                    data_augmentation_func=mirror,
                ),
            ),
        )
        state = runner.init_train_state(seed=0)
        new_state, metrics = jax.jit(runner._train_iteration)(state)
        assert np.isfinite(float(metrics["loss"]))


class TestDistillation:
    def test_student_learns_teacher(self):
        from isaaclab_tpu.rl import (
            DistillationRunner,
            RslRlDistillationAlgorithmCfg,
            RslRlDistillationStudentTeacherCfg,
        )

        env = _manager_env(num_envs=16)

        # analytic "teacher": simple PD balance controller on the obs
        def teacher(obs):
            # obs = [pole_pos, pole_vel, cart_pos, cart_vel] (cartpole policy)
            return -(2.0 * obs[:, 0:1] + 0.5 * obs[:, 1:2])

        runner = DistillationRunner(
            env,
            RslRlDistillationStudentTeacherCfg(
                student_hidden_dims=[32, 32], init_noise_std=0.05
            ),
            RslRlDistillationAlgorithmCfg(num_learning_epochs=8,
                                          learning_rate=5e-3),
            teacher_apply=teacher,
            num_steps_per_env=16,
        )
        _, first = runner.learn(iterations=1)
        state, metrics = runner.learn(iterations=60)
        final = float(metrics["bc_loss"])
        assert final < 0.2 and final < 0.5 * float(first["bc_loss"]), (
            f"student failed to imitate: bc_loss "
            f"{float(first['bc_loss'])} -> {final}"
        )


class TestAMP:
    def test_amp_trains_and_style_reward_flows(self):
        from isaaclab_tpu.rl import AmpCfg, AMPOnPolicyRunner
        from isaaclab_tpu.rl.rl_cfg import (
            RslRlOnPolicyRunnerCfg,
            RslRlPpoActorCriticCfg,
            RslRlPpoAlgorithmCfg,
        )
        from isaaclab_tpu.tasks.direct.humanoid_amp.humanoid_amp_env import (
            HumanoidAmpEnv,
            HumanoidAmpEnvCfg,
        )

        cfg = HumanoidAmpEnvCfg()
        cfg.scene.num_envs = 8
        env = HumanoidAmpEnv(cfg)
        assert env.amp_observation_size == 2 * (2 * 19 + 7)
        ref = env.collect_reference_motions(16)
        assert ref.shape == (16, env.amp_observation_size)

        runner_cfg = RslRlOnPolicyRunnerCfg(
            num_steps_per_env=4, max_iterations=2, experiment_name="amp_test",
            policy=RslRlPpoActorCriticCfg(
                actor_hidden_dims=[32, 32], critic_hidden_dims=[32, 32]
            ),
            algorithm=RslRlPpoAlgorithmCfg(
                num_learning_epochs=1, num_mini_batches=1
            ),
        )
        runner = AMPOnPolicyRunner(
            env, runner_cfg,
            AmpCfg(discriminator_hidden_dims=[64], num_reference_batches=4),
        )
        state, metrics = runner.learn(2)
        assert np.isfinite(float(metrics["disc_loss"]))
        assert np.isfinite(float(metrics["style_reward"]))
