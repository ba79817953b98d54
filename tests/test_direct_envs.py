"""Direct-workflow env tests: cartpole-direct + the fork's UAV Hover task."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestCartpoleDirect:
    @pytest.fixture(scope="class")
    def env(self):
        from isaaclab_tpu.tasks.direct.cartpole.cartpole_env import (
            CartpoleDirectEnv,
            CartpoleDirectEnvCfg,
        )

        cfg = CartpoleDirectEnvCfg()
        cfg.scene.num_envs = 8
        return CartpoleDirectEnv(cfg)

    def test_step(self, env):
        state = env.init_state()
        step = jax.jit(env.step_state)
        for _ in range(20):
            state, (obs, rew, died, to, extras) = step(state, jnp.zeros((8, 1)))
        assert obs["policy"].shape == (8, 4)
        assert bool(jnp.all(jnp.isfinite(obs["policy"])))
        assert bool(jnp.all(jnp.isfinite(rew)))

    def test_determinism(self, env):
        s1 = env.init_state(jax.random.PRNGKey(5))
        s2 = env.init_state(jax.random.PRNGKey(5))
        step = jax.jit(env.step_state)
        a = jnp.ones((8, 1)) * 0.3
        for _ in range(5):
            s1, o1 = step(s1, a)
            s2, o2 = step(s2, a)
        np.testing.assert_array_equal(
            np.asarray(o1[0]["policy"]), np.asarray(o2[0]["policy"])
        )


class TestQuadcopterHover:
    @pytest.fixture(scope="class")
    def env(self):
        from isaaclab_tpu.tasks.direct.quadcopter.quadcopter_env import (
            QuadcopterEnv,
            QuadcopterEnvCfg,
        )

        cfg = QuadcopterEnvCfg()
        cfg.scene.num_envs = 8
        return QuadcopterEnv(cfg)

    def test_step_runs(self, env):
        state = env.init_state()
        step = jax.jit(env.step_state)
        action = jnp.zeros((8, 4))
        for _ in range(10):
            state, (obs, rew, died, to, extras) = step(state, action)
        assert obs["policy"].shape == (8, 16)
        assert bool(jnp.all(jnp.isfinite(obs["policy"])))
        assert "reset_height" in extras  # fork's 5-tuple telemetry

    def test_thrust_lifts(self, env):
        """Full-throttle, zero-rate action must accelerate the UAV upward."""
        state = env.init_state()
        step = jax.jit(env.step_state)
        action = jnp.zeros((8, 4)).at[:, 3].set(1.0)
        views, _ = env.scene.data_views(state.scene, env.physics_dt)
        z0 = views["robot"].root_pos_w[:, 2]
        vz_end = None
        for _ in range(8):
            state, (obs, rew, died, to, _) = step(state, action)
            views, _ = env.scene.data_views(state.scene, env.physics_dt)
            vz_end = views["robot"].root_lin_vel_w[:, 2]
        # max thrust on the UAV_LIDAR rotors: 4 * 3800^2 * 4.34e-7 = 25 N
        # vs weight 7.4 N -> must be climbing (unless already reset by z>3)
        assert bool(jnp.any(vz_end > 0.1)) or bool(jnp.any(to | died))

    def test_motor_first_order_lag(self):
        from isaaclab_tpu.tasks.direct.quadcopter.modules import MotorModel

        m = MotorModel(2, dt=0.004)
        st = m.init_state()
        cmds = jnp.ones((2, 4))
        for _ in range(100):
            st, thrust, moment = m.step(st, cmds)
        # converged to max velocity -> thrust = v^2 * k
        expected = 3800.0**2 * 4.33948e-07
        np.testing.assert_allclose(np.asarray(thrust), expected, rtol=0.01)

    def test_rate_controller_signs(self):
        from isaaclab_tpu.tasks.direct.quadcopter.modules import RateController

        rc = RateController(1)
        st = rc.init_state()
        target = jnp.array([[1.0, 0.0, 0.0]])  # roll rate +
        # two runs with constant error: second has zero derivative term
        st, _ = rc.run(st, target, jnp.zeros((1, 1)), jnp.zeros((1, 3)), 0.01)
        st, cmd = rc.run(st, target, jnp.zeros((1, 1)), jnp.zeros((1, 3)), 0.01)
        # mixer col 0: rotors 1,2 spin up, 0,3 down for +roll torque cmd
        cmd = np.asarray(cmd)[0]
        assert cmd[1] > cmd[0] and cmd[2] > cmd[3]


class TestLidarFly:
    def test_steps_with_lidar(self):
        from isaaclab_tpu.tasks.direct.quadcopter.lidarfly_env import (
            LidarFlyEnv,
            LidarFlyEnvCfg,
        )

        cfg = LidarFlyEnvCfg()
        cfg.scene.num_envs = 4
        env = LidarFlyEnv(cfg)
        assert env.num_rays == 3 * 36
        state = jax.jit(env.init_state)(jax.random.PRNGKey(0))
        step = jax.jit(env.step_state)
        hover = jnp.zeros((4, 4)).at[:, 3].set(0.3)
        for _ in range(5):
            state, (obs, rew, died, to, extras) = step(state, hover)
        assert obs["policy"].shape == (4, env.num_rays + 17)
        assert bool(jnp.all(jnp.isfinite(obs["policy"])))
        assert "reset_lidar" in extras
        # scan values in [0, 1]
        scan = obs["policy"][:, : env.num_rays]
        assert bool(jnp.all((scan >= -1e-5) & (scan <= 1.0 + 1e-5)))


class TestFactoryWeldedCollisionPlans:
    """Regression (ADVICE r3): GearMesh/NutThread inherited PegInsert's
    collision filters whose negative-lookahead regex matched the unnamed
    welded geoms and dropped EVERY robot-vs-fixed pair — the welded held
    asset passed straight through the fixed asset."""

    def _robot_fixed_pairs(self, scene_cfg):
        from isaaclab_tpu.scene import InteractiveScene

        sc = InteractiveScene(scene_cfg)
        ba, bb = sc.collision_plan.static_bodies()
        sl_r, sl_f = sc.slices["robot"], sc.slices["fixed_asset"]
        rb = set(range(sl_r.body_start, sl_r.body_start + sl_r.body_count))
        fb = set(range(sl_f.body_start, sl_f.body_start + sl_f.body_count))
        return sum(
            1 for a, b in zip(ba, bb)
            if (a in rb and b in fb) or (a in fb and b in rb)
        )

    def test_gear_mesh_has_insertion_pairs(self):
        from isaaclab_tpu.tasks.direct.factory.factory_tasks import (
            GearMeshSceneCfg,
        )

        assert self._robot_fixed_pairs(
            GearMeshSceneCfg(num_envs=2, env_spacing=2.0)) > 0

    def test_nut_thread_has_insertion_pairs(self):
        from isaaclab_tpu.tasks.direct.factory.factory_tasks import (
            NutThreadSceneCfg,
        )

        assert self._robot_fixed_pairs(
            NutThreadSceneCfg(num_envs=2, env_spacing=2.0)) > 0
