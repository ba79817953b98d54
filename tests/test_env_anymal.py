"""Locomotion velocity env tests: flat + rough ANYmal-C (contact solver,
sensors, commands, events, curriculum all engaged)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def make_env(flat=True, num_envs=4):
    from isaaclab_tpu.envs import ManagerBasedRLEnv
    from isaaclab_tpu.tasks.manager_based.locomotion.velocity.config.anymal_c.flat_env_cfg import (
        AnymalCFlatEnvCfg,
    )
    from isaaclab_tpu.tasks.manager_based.locomotion.velocity.config.anymal_c.rough_env_cfg import (
        AnymalCRoughEnvCfg,
    )

    cfg = AnymalCFlatEnvCfg() if flat else AnymalCRoughEnvCfg()
    cfg.scene.num_envs = num_envs
    if not flat:
        # shrink terrain for test speed
        cfg.scene.terrain.terrain_generator.num_rows = 2
        cfg.scene.terrain.terrain_generator.num_cols = 2
    return ManagerBasedRLEnv(cfg)


class TestAnymalFlat:
    @pytest.fixture(scope="class")
    def env(self):
        return make_env(flat=True)

    def test_construction(self, env):
        assert env.action_manager.total_action_dim == 12
        robot = env.scene.articulations["robot"]
        assert robot.num_joints == 12
        assert not robot.is_fixed_base
        # obs: 3+3+3+3+12+12+12 = 48 (no height scan on flat)
        assert env.observation_manager.group_obs_dim("policy") == (48,)

    def test_standing_start_is_stable(self, env):
        """With zero actions (PD to default pose), the robot should remain
        upright for 50 steps — contact solver + PD sanity."""
        state = env.init_state()
        step = jax.jit(env.step_state)
        action = jnp.zeros((4, 12))
        for _ in range(50):
            state, (obs, rew, term, trunc, _) = step(state, action)
        views, _ = env.scene.data_views(state.scene, env.physics_dt)
        base_z = views["robot"].root_pos_w[:, 2]
        assert bool(jnp.all(base_z > 0.3)), f"robot collapsed: z={base_z}"
        assert bool(jnp.all(jnp.isfinite(obs["policy"])))

    def test_contact_sensor_reports_feet(self, env):
        state = env.init_state()
        step = jax.jit(env.step_state)
        for _ in range(20):
            state, _ = step(state, jnp.zeros((4, 12)))
        forces = state.scene.sensors["contact_forces"].net_forces_w
        total_up = jnp.sum(forces[..., 2], axis=1)
        # standing robot: total normal force ~ m g (27+4*(2+3.1+1.1) = 51.8 kg)
        np.testing.assert_allclose(
            np.asarray(total_up), 51.8 * 9.81, rtol=0.3
        )

    def test_random_actions_finite(self, env):
        state = env.init_state()
        step = jax.jit(env.step_state)
        key = jax.random.PRNGKey(0)
        for i in range(30):
            key, k = jax.random.split(key)
            a = jax.random.uniform(k, (4, 12), minval=-1, maxval=1)
            state, (obs, rew, term, trunc, _) = step(state, a)
            assert bool(jnp.all(jnp.isfinite(obs["policy"]))), f"step {i}"
            assert bool(jnp.all(jnp.isfinite(rew)))


class TestAnymalRough:
    def test_rough_env_steps(self):
        env = make_env(flat=False, num_envs=4)
        # height scan adds rays: 17 x 11 grid = 187 -> obs 48 + 187
        assert env.observation_manager.group_obs_dim("policy")[0] > 48
        state = env.init_state()
        step = jax.jit(env.step_state)
        for _ in range(10):
            state, (obs, rew, term, trunc, _) = step(state, jnp.zeros((4, 12)))
        assert bool(jnp.all(jnp.isfinite(obs["policy"])))
        # height scanner produced non-default readings
        hits = state.scene.sensors["height_scanner"].ray_hits_w
        assert bool(jnp.all(jnp.isfinite(hits)))
