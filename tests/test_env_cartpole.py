"""End-to-end cartpole env tests (mirrors the reference's
test_environments.py pattern: instantiate, step randomly, assert finiteness,
plus determinism — SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def env():
    from isaaclab_tpu.envs import ManagerBasedRLEnv
    from isaaclab_tpu.tasks.manager_based.classic.cartpole.cartpole_env_cfg import (
        CartpoleEnvCfg,
    )

    cfg = CartpoleEnvCfg()
    cfg.scene.num_envs = 16
    return ManagerBasedRLEnv(cfg)


class TestCartpoleEnv:
    def test_construction(self, env):
        assert env.num_envs == 16
        assert env.action_manager.total_action_dim == 1
        assert env.observation_manager.group_obs_dim("policy") == (4,)
        assert env.max_episode_length == int(np.ceil(5 / (2 / 120)))

    def test_reset_and_step(self, env):
        obs, _ = env.reset(seed=0)
        assert obs["policy"].shape == (16, 4)
        for _ in range(5):
            action = jax.random.normal(jax.random.PRNGKey(1), (16, 1))
            obs, rew, term, trunc, extras = env.step(action)
        assert obs["policy"].shape == (16, 4)
        assert rew.shape == (16,)
        assert term.dtype == jnp.bool_
        assert bool(jnp.all(jnp.isfinite(obs["policy"])))
        assert bool(jnp.all(jnp.isfinite(rew)))
        assert "log" in extras

    def test_random_rollout_finite(self, env):
        env.reset(seed=1)
        key = jax.random.PRNGKey(2)
        for i in range(50):
            key, k = jax.random.split(key)
            action = jax.random.uniform(k, (16, 1), minval=-1, maxval=1)
            obs, rew, term, trunc, _ = env.step(action)
            assert bool(jnp.all(jnp.isfinite(obs["policy"]))), f"step {i}"

    def test_determinism(self, env):
        """Same seed twice -> identical trajectories (reference
        test_environment_determinism.py)."""

        def run(seed):
            obs, _ = env.reset(seed=seed)
            outs = []
            key = jax.random.PRNGKey(123)
            for _ in range(10):
                key, k = jax.random.split(key)
                action = jax.random.uniform(k, (16, 1), minval=-1, maxval=1)
                obs, rew, term, trunc, _ = env.step(action)
                outs.append((obs["policy"], rew))
            return outs

        out1 = run(7)
        out2 = run(7)
        for (o1, r1), (o2, r2) in zip(out1, out2):
            np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
            np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))

    def test_episodes_reset(self, env):
        """Cart pushed out of bounds must reset and episode length restart."""
        env.reset(seed=3)
        big_action = jnp.ones((16, 1)) * 4.0  # scale 100 -> 400N, saturated
        resets_seen = False
        for _ in range(int(env.max_episode_length) + 10):
            obs, rew, term, trunc, extras = env.step(big_action)
            if bool(jnp.any(term | trunc)):
                resets_seen = True
        assert resets_seen

    def test_scan_compatible(self, env):
        """The whole step must run under lax.scan (rollout compilation)."""
        state = env.unwrapped.init_state()

        def body(s, _):
            s, (obs, rew, term, trunc, _) = env.unwrapped.step_state(
                s, jnp.zeros((16, 1))
            )
            return s, rew

        final, rews = jax.jit(
            lambda s: jax.lax.scan(body, s, None, length=8)
        )(state)
        assert rews.shape == (8, 16)
        assert bool(jnp.all(jnp.isfinite(rews)))


class TestCartpolePhysicsSanity:
    def test_pole_falls_without_control(self, env):
        """From a tilted start, the uncontrolled pole must swing down
        (gravity sanity through the full env stack)."""
        uenv = env.unwrapped
        state = uenv.init_state()
        # set pole angle to 0.3 rad for all envs via the articulation API
        art = uenv.scene.articulations["robot"]
        jp = jnp.tile(jnp.array([0.0, 0.3]), (16, 1))
        q, qd = art.write_joint_state_to_sim(
            state.scene.phys.q, state.scene.phys.qd, jp, jnp.zeros((16, 2)), None
        )
        state = state._replace(
            scene=state.scene._replace(phys=state.scene.phys._replace(q=q, qd=qd))
        )
        for _ in range(30):
            state, (obs, *_rest) = jax.jit(uenv.step_state)(
                state, jnp.zeros((16, 1))
            )
        pole_angle = obs["policy"][:, 1]
        assert bool(jnp.all(jnp.abs(pole_angle) > 0.3))  # fell further
