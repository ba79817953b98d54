"""PPO learning smoke test: cartpole reward must improve (the reference's
training smoke, tools/run_train_envs.py analogue, plus learning-curve sanity).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def setup():
    from isaaclab_tpu.envs import ManagerBasedRLEnv
    from isaaclab_tpu.rl import OnPolicyRunner
    from isaaclab_tpu.tasks.manager_based.classic.cartpole.agents.rsl_rl_ppo_cfg import (
        CartpolePPORunnerCfg,
    )
    from isaaclab_tpu.tasks.manager_based.classic.cartpole.cartpole_env_cfg import (
        CartpoleEnvCfg,
    )

    cfg = CartpoleEnvCfg()
    cfg.scene.num_envs = 256
    env = ManagerBasedRLEnv(cfg)
    agent_cfg = CartpolePPORunnerCfg()
    runner = OnPolicyRunner(env, agent_cfg, log_dir=None)
    return env, runner


class TestPPOCartpole:
    def test_train_iteration_runs(self, setup):
        env, runner = setup
        state = runner.init_train_state(seed=0)
        new_state, metrics = jax.jit(runner._train_iteration)(state)
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["mean_reward_per_step"]))
        assert int(new_state.iteration) == 1

    def test_reward_improves(self, setup):
        """PPO must balance the pole: rewards are weight*term*dt so the ceiling
        is ~1/60 = 0.0167/step (alive term); random policy sits well below with
        episode lengths of a few steps. After ~60 iterations at 256 envs the
        learner reaches >0.012/step and episodes lasting >40 env steps
        (measured convergence: 0.0165/step, ep_len 130-240 by iteration 80)."""
        env, runner = setup
        runner.state = runner.init_train_state(seed=0)
        fn = jax.jit(runner._train_iteration, donate_argnums=0)
        curve = []  # (ep_len, reward/step) per iteration
        for i in range(60):
            runner.state, metrics = fn(runner.state)
            curve.append((float(metrics.get("Episode_Length", 0.0)),
                          float(metrics["mean_reward_per_step"])))
        lens = np.asarray([c[0] for c in curve])
        first_len, last_len = lens[2], lens[-1]
        last_r = curve[-1][1]
        # note: per-step reward starts near the ceiling (episodes begin
        # upright), so episode LENGTH is the reliable learning signal
        # verified trajectory at seed 0 / 256 envs: ep_len ~1.9 at it0,
        # >100 by it50-60 (see debug run in round-1 log)
        assert last_len > 60.0, (
            f"no learning: ep_len {first_len} -> {last_len}"
        )
        assert last_r > 0.012, f"reward too low after 60 iters: {last_r}"
        # learning-CURVE shape, not just the endpoint (BASELINE.md
        # 'Cartpole PPO learning-curve match' criterion — the reference
        # curve itself is not available offline, so the shape contract is:
        # monotone smoothed improvement and a time-to-threshold bound that
        # brackets the reference's convergence behavior at this size):
        # 10-iteration smoothed means must never regress by >30%
        smooth = lens.reshape(6, 10).mean(axis=1)
        drops = smooth[1:] < 0.7 * smooth[:-1]
        assert not drops.any(), f"smoothed curve regressed: {smooth}"
        # time-to-threshold: ep_len > 30 within the first 45 iterations
        assert (lens[:45] > 30.0).any(), (
            f"too slow to learn: max ep_len in 45 iters {lens[:45].max()}"
        )

    def test_full_state_checkpoint_resume(self, setup, tmp_path):
        """Full-state checkpoints make a resumed run bitwise-continuable
        (SURVEY.md §5: env-state-resumable; stronger than the reference's
        params-only torch.save)."""
        env, runner = setup
        fn = jax.jit(runner._train_iteration)
        state = runner.init_train_state(seed=42)
        for _ in range(2):
            state, _ = fn(state)
        runner.state = state
        ckpt = str(tmp_path / "model.ckpt")
        runner.save(ckpt)
        # uninterrupted continuation
        cont, _ = fn(state)
        # resumed continuation from the serialized checkpoint
        runner.state = None
        runner.load(ckpt)
        resumed, _ = fn(runner.state)
        for a, b in zip(
            jax.tree.leaves(cont.update.params),
            jax.tree.leaves(resumed.update.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # env state (physics q) must also match bitwise
        np.testing.assert_array_equal(
            np.asarray(cont.env_state.scene.phys.q),
            np.asarray(resumed.env_state.scene.phys.q),
        )
