"""State snapshot/restore round-trip tests for ``scene.get_state`` /
``scene.reset_to`` / ``env.reset_to`` (reference interactive_scene.py:425-569
and manager_based_env.py:317-371; backbone of demo replay + mimic datagen)."""

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
    cfg.scene.num_envs = 8
    return ManagerBasedRLEnv(cfg)


def _actions(seed, n, shape):
    key = jax.random.PRNGKey(seed)
    outs = []
    for _ in range(n):
        key, k = jax.random.split(key)
        outs.append(jax.random.uniform(k, shape, minval=-1, maxval=1))
    return outs


class TestResetTo:
    def test_get_state_schema(self, env):
        env.reset(seed=0)
        rec = env.scene.get_state(env._state.scene)
        assert "articulation" in rec and "robot" in rec["articulation"]
        art = rec["articulation"]["robot"]
        assert art["root_pose"].shape == (8, 7)
        assert art["root_velocity"].shape == (8, 6)
        assert art["joint_position"].shape == (8, 2)
        assert art["joint_velocity"].shape == (8, 2)

    def test_round_trip_exact(self, env):
        """Record mid-episode, diverge, restore -> joint state is bitwise
        recovered and the continuation reproduces the original trajectory."""
        env.reset(seed=1)
        acts = _actions(11, 5, (8, 1))
        for a in acts:
            env.step(a)
        rec = jax.device_get(env.scene.get_state(env._state.scene))
        # continue from the recorded point with a fixed action sequence
        cont = _actions(22, 4, (8, 1))
        ref_traj = [np.asarray(env.step(a)[0]["policy"]) for a in cont]
        # diverge
        for a in _actions(33, 6, (8, 1)):
            env.step(a)
        # restore and verify the state round-trips
        env.reset_to(rec)
        rec2 = jax.device_get(env.scene.get_state(env._state.scene))
        np.testing.assert_allclose(
            rec2["articulation"]["robot"]["joint_position"],
            rec["articulation"]["robot"]["joint_position"],
            atol=1e-6,
        )
        np.testing.assert_allclose(
            rec2["articulation"]["robot"]["joint_velocity"],
            rec["articulation"]["robot"]["joint_velocity"],
            atol=1e-6,
        )
        # and the continuation replays identically
        replay = [np.asarray(env.step(a)[0]["policy"]) for a in cont]
        for r, t in zip(replay, ref_traj):
            np.testing.assert_allclose(r, t, atol=1e-5)

    def test_masked_restore(self, env):
        """Only masked envs take the recorded state."""
        env.reset(seed=2)
        for a in _actions(44, 5, (8, 1)):
            env.step(a)
        rec = jax.device_get(env.scene.get_state(env._state.scene))
        for a in _actions(55, 5, (8, 1)):
            env.step(a)
        before = jax.device_get(env.scene.get_state(env._state.scene))
        mask = jnp.array([True, False] * 4)
        env.reset_to(rec, env_mask=mask)
        after = jax.device_get(env.scene.get_state(env._state.scene))
        jp_rec = rec["articulation"]["robot"]["joint_position"]
        jp_bef = before["articulation"]["robot"]["joint_position"]
        jp_aft = after["articulation"]["robot"]["joint_position"]
        m = np.asarray(mask)
        np.testing.assert_allclose(jp_aft[m], jp_rec[m], atol=1e-6)
        np.testing.assert_allclose(jp_aft[~m], jp_bef[~m], atol=1e-6)

    def test_single_env_broadcast(self, env):
        """A single recorded env (unbatched arrays) broadcasts to all envs —
        the mimic-generation usage pattern."""
        env.reset(seed=3)
        for a in _actions(66, 3, (8, 1)):
            env.step(a)
        rec = jax.device_get(env.scene.get_state(env._state.scene))
        one = {
            "articulation": {
                "robot": {k: v[2] for k, v in rec["articulation"]["robot"].items()}
            }
        }
        env.reset_to(one)
        after = jax.device_get(env.scene.get_state(env._state.scene))
        jp = after["articulation"]["robot"]["joint_position"]
        np.testing.assert_allclose(
            jp, np.broadcast_to(rec["articulation"]["robot"]["joint_position"][2], jp.shape),
            atol=1e-6,
        )


class TestResetToFloatingBase:
    def test_anymal_root_state_round_trip(self):
        """Floating-base restore: root pose/velocity and joints round-trip
        through get_state -> reset_to on the Anymal flat env."""
        from tests.test_env_anymal import make_env

        env = make_env(flat=True, num_envs=2)
        env.reset(seed=0)
        for a in _actions(7, 3, (2, 12)):
            env.step(0.2 * a)
        rec = jax.device_get(env.scene.get_state(env._state.scene))
        for a in _actions(8, 5, (2, 12)):
            env.step(0.2 * a)
        env.reset_to(rec)
        after = jax.device_get(env.scene.get_state(env._state.scene))
        a_rec = rec["articulation"]["robot"]
        a_aft = after["articulation"]["robot"]
        np.testing.assert_allclose(a_aft["root_pose"], a_rec["root_pose"], atol=1e-6)
        np.testing.assert_allclose(
            a_aft["root_velocity"], a_rec["root_velocity"], atol=1e-6
        )
        np.testing.assert_allclose(
            a_aft["joint_position"], a_rec["joint_position"], atol=1e-6
        )
