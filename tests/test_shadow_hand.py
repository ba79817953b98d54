"""Shadow-hand repose env smoke tests."""

import jax
import jax.numpy as jnp
import pytest


@pytest.fixture(scope="module")
def env():
    from isaaclab_tpu.tasks.direct.shadow_hand.shadow_hand_env import (
        ShadowHandEnv,
        ShadowHandEnvCfg,
    )

    cfg = ShadowHandEnvCfg()
    cfg.scene.num_envs = 4
    return ShadowHandEnv(cfg)


class TestShadowHand:
    def test_model(self, env):
        robot = env.scene.articulations["robot"]
        assert robot.num_joints == 23  # 2 wrist + 4x4 fingers + 5 thumb
        assert robot.is_fixed_base

    def test_cube_starts_on_palm(self, env):
        state = jax.jit(env.init_state)(jax.random.PRNGKey(0))
        step = jax.jit(env.step_state)
        for _ in range(10):
            state, (obs, rew, died, to, extras) = step(
                state, jnp.zeros((4, env.num_actions))
            )
        assert bool(jnp.all(jnp.isfinite(obs["policy"])))
        assert bool(jnp.all(jnp.isfinite(rew)))

    def test_goal_resampling(self, env):
        state = jax.jit(env.init_state)(jax.random.PRNGKey(1))
        g0 = state.user["goal_rot"]
        step = jax.jit(env.step_state)
        state, _ = step(state, jnp.zeros((4, env.num_actions)))
        # goals stay unit quaternions
        import numpy as np

        n = np.linalg.norm(np.asarray(state.user["goal_rot"]), axis=-1)
        np.testing.assert_allclose(n, 1.0, atol=1e-5)
