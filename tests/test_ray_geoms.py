"""Analytic ray-primitive intersection tests (the dynamic-geometry raycast
path used by the depth camera and lidar; reference relies on RTX/Warp)."""

import jax.numpy as jnp
import numpy as np

from isaaclab_tpu.sensors.ray_caster import (
    _ray_box,
    _ray_capsule,
    _ray_sphere,
)

MAXD = 100.0


class TestRayPrimitives:
    def test_sphere_head_on(self):
        o = jnp.array([[-5.0, 0.0, 0.0]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        t = _ray_sphere(o, d, jnp.array([0.0, 0.0, 0.0]), 1.0, MAXD)
        np.testing.assert_allclose(np.asarray(t), [4.0], atol=1e-5)

    def test_sphere_miss(self):
        o = jnp.array([[-5.0, 2.0, 0.0]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        t = _ray_sphere(o, d, jnp.array([0.0, 0.0, 0.0]), 1.0, MAXD)
        assert float(t[0]) == MAXD

    def test_sphere_behind(self):
        o = jnp.array([[5.0, 0.0, 0.0]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        t = _ray_sphere(o, d, jnp.array([0.0, 0.0, 0.0]), 1.0, MAXD)
        assert float(t[0]) == MAXD

    def test_box_axis_aligned(self):
        o = jnp.array([[-5.0, 0.1, 0.2]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        t = _ray_box(
            o, d, jnp.array([0.0, 0.0, 0.0]), jnp.array([1.0, 0, 0, 0]),
            jnp.array([0.5, 0.5, 0.5]), MAXD,
        )
        np.testing.assert_allclose(np.asarray(t), [4.5], atol=1e-5)

    def test_box_rotated(self):
        # box yawed 45 deg: corner toward the ray, hit at sqrt(2)/2 half-diag
        s2 = np.sqrt(2) / 2
        quat = jnp.array([np.cos(np.pi / 8), 0.0, 0.0, np.sin(np.pi / 8)])
        o = jnp.array([[-5.0, 0.0, 0.0]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        t = _ray_box(
            o, d, jnp.array([0.0, 0.0, 0.0]), quat,
            jnp.array([0.5, 0.5, 0.5]), MAXD,
        )
        np.testing.assert_allclose(np.asarray(t), [5.0 - 0.5 * np.sqrt(2)],
                                   atol=1e-4)

    def test_capsule_body_and_cap(self):
        # capsule along z, r=0.5, hl=1: side hit
        o = jnp.array([[-5.0, 0.0, 0.5], [0.0, 0.0, 5.0]])
        d = jnp.array([[1.0, 0.0, 0.0], [0.0, 0.0, -1.0]])
        t = _ray_capsule(
            o, d, jnp.array([0.0, 0.0, 0.0]), jnp.array([1.0, 0, 0, 0]),
            0.5, 1.0, MAXD,
        )
        np.testing.assert_allclose(np.asarray(t), [4.5, 3.5], atol=1e-5)

    def test_depth_camera_sees_robot(self):
        """e2e: the cartpole depth camera image contains the pole."""
        import jax

        from isaaclab_tpu.tasks.direct.cartpole.cartpole_camera_env import (
            CartpoleDepthCameraDirectEnv,
            CartpoleDepthCameraDirectEnvCfg,
        )

        cfg = CartpoleDepthCameraDirectEnvCfg()
        cfg.scene.num_envs = 2
        env = CartpoleDepthCameraDirectEnv(cfg)
        state = jax.jit(env.init_state)(jax.random.PRNGKey(0))
        obs = jax.jit(env._get_observations)(state)["policy"]
        o = np.asarray(obs)
        assert np.all(np.isfinite(o))
        assert o.std() > 0.01, "depth image is flat: geoms not visible"
