"""Math library tests — mirror the reference's test_math.py coverage
(quaternion round-trips, frame transforms, sampling shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import isaaclab_tpu.utils.math as math_utils


def random_quats(key, n):
    return math_utils.random_orientation(key, n)


class TestQuaternions:
    def test_mul_identity(self):
        key = jax.random.PRNGKey(0)
        q = random_quats(key, 64)
        ident = jnp.tile(jnp.array([1.0, 0, 0, 0]), (64, 1))
        np.testing.assert_allclose(math_utils.quat_mul(q, ident), q, atol=1e-6)
        np.testing.assert_allclose(math_utils.quat_mul(ident, q), q, atol=1e-6)

    def test_conjugate_inverse(self):
        q = random_quats(jax.random.PRNGKey(1), 64)
        qq = math_utils.quat_mul(q, math_utils.quat_conjugate(q))
        ident = jnp.tile(jnp.array([1.0, 0, 0, 0]), (64, 1))
        np.testing.assert_allclose(qq, ident, atol=1e-5)

    def test_matrix_roundtrip(self):
        q = random_quats(jax.random.PRNGKey(2), 128)
        m = math_utils.matrix_from_quat(q)
        q2 = math_utils.quat_from_matrix(m)
        # Same rotation up to sign.
        dot = jnp.abs(jnp.sum(q * q2, axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)

    def test_apply_matches_matrix(self):
        key = jax.random.PRNGKey(3)
        q = random_quats(key, 32)
        v = jax.random.normal(jax.random.PRNGKey(4), (32, 3))
        out1 = math_utils.quat_apply(q, v)
        out2 = jnp.einsum("nij,nj->ni", math_utils.matrix_from_quat(q), v)
        np.testing.assert_allclose(out1, out2, atol=1e-5)

    def test_rotate_inverse(self):
        q = random_quats(jax.random.PRNGKey(5), 32)
        v = jax.random.normal(jax.random.PRNGKey(6), (32, 3))
        back = math_utils.quat_rotate_inverse(q, math_utils.quat_rotate(q, v))
        np.testing.assert_allclose(back, v, atol=1e-5)

    def test_euler_roundtrip(self):
        rpy = jax.random.uniform(
            jax.random.PRNGKey(7), (64, 3), minval=-1.5, maxval=1.5
        )
        q = math_utils.quat_from_euler_xyz(rpy[:, 0], rpy[:, 1], rpy[:, 2])
        r, p, y = math_utils.euler_xyz_from_quat(q)
        np.testing.assert_allclose(jnp.stack([r, p, y], -1), rpy, atol=1e-5)

    def test_yaw_quat(self):
        q = math_utils.quat_from_euler_xyz(
            jnp.array([0.3]), jnp.array([0.2]), jnp.array([1.1])
        )
        yq = math_utils.yaw_quat(q)
        r, p, y = math_utils.euler_xyz_from_quat(yq)
        np.testing.assert_allclose(r, 0.0, atol=1e-6)
        np.testing.assert_allclose(p, 0.0, atol=1e-6)
        np.testing.assert_allclose(y, 1.1, atol=1e-5)

    def test_angle_axis_roundtrip(self):
        axis = math_utils.normalize(jax.random.normal(jax.random.PRNGKey(8), (32, 3)))
        angle = jax.random.uniform(jax.random.PRNGKey(9), (32,), minval=0.1, maxval=3.0)
        q = math_utils.quat_from_angle_axis(angle, axis)
        aa = math_utils.axis_angle_from_quat(q)
        np.testing.assert_allclose(aa, angle[:, None] * axis, atol=1e-4)

    def test_error_magnitude(self):
        q1 = random_quats(jax.random.PRNGKey(10), 16)
        np.testing.assert_allclose(
            math_utils.quat_error_magnitude(q1, q1), 0.0, atol=1e-3
        )


class TestTransforms:
    def test_combine_subtract_inverse(self):
        key = jax.random.PRNGKey(11)
        t01 = jax.random.normal(key, (16, 3))
        q01 = random_quats(jax.random.PRNGKey(12), 16)
        t12 = jax.random.normal(jax.random.PRNGKey(13), (16, 3))
        q12 = random_quats(jax.random.PRNGKey(14), 16)
        t02, q02 = math_utils.combine_frame_transforms(t01, q01, t12, q12)
        t12b, q12b = math_utils.subtract_frame_transforms(t01, q01, t02, q02)
        np.testing.assert_allclose(t12b, t12, atol=1e-4)
        dot = jnp.abs(jnp.sum(q12 * q12b, axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)

    def test_pose_make_unmake(self):
        pos = jax.random.normal(jax.random.PRNGKey(15), (8, 3))
        rot = math_utils.matrix_from_quat(random_quats(jax.random.PRNGKey(16), 8))
        pose = math_utils.make_pose(pos, rot)
        p2, r2 = math_utils.unmake_pose(pose)
        np.testing.assert_allclose(p2, pos, atol=1e-6)
        np.testing.assert_allclose(r2, rot, atol=1e-6)
        inv = math_utils.pose_inv(pose)
        np.testing.assert_allclose(
            pose @ inv, jnp.tile(jnp.eye(4), (8, 1, 1)), atol=1e-5
        )

    def test_wrap_to_pi(self):
        angles = jnp.array([0.0, jnp.pi, -jnp.pi, 2 * jnp.pi, 3.5 * jnp.pi])
        wrapped = math_utils.wrap_to_pi(angles)
        assert jnp.all(wrapped <= jnp.pi + 1e-6)
        assert jnp.all(wrapped > -jnp.pi - 1e-6)
        np.testing.assert_allclose(jnp.cos(wrapped), jnp.cos(angles), atol=1e-5)

    def test_scale_unscale(self):
        lower, upper = jnp.array([-2.0]), jnp.array([4.0])
        x = jnp.linspace(-2, 4, 7)[:, None]
        s = math_utils.scale_transform(x, lower, upper)
        np.testing.assert_allclose(s[0], -1.0, atol=1e-6)
        np.testing.assert_allclose(s[-1], 1.0, atol=1e-6)
        np.testing.assert_allclose(
            math_utils.unscale_transform(s, lower, upper), x, atol=1e-5
        )


class TestSampling:
    def test_shapes_and_ranges(self):
        key = jax.random.PRNGKey(20)
        u = math_utils.sample_uniform(key, -1.0, 3.0, (100,))
        assert u.shape == (100,) and float(u.min()) >= -1.0 and float(u.max()) <= 3.0
        lu = math_utils.sample_log_uniform(key, 0.1, 10.0, (100,))
        assert float(lu.min()) >= 0.1 and float(lu.max()) <= 10.0
        quats = math_utils.random_orientation(key, 50)
        np.testing.assert_allclose(jnp.linalg.norm(quats, axis=-1), 1.0, atol=1e-5)
        cyl = math_utils.sample_cylinder(key, 2.0, (0.0, 1.0), 64)
        assert cyl.shape == (64, 3)
        r = jnp.linalg.norm(cyl[:, :2], axis=-1)
        assert float(r.max()) <= 2.0


class TestJitCompat:
    def test_jit_vmap(self):
        @jax.jit
        def fn(q, v):
            return math_utils.quat_apply_yaw(q, v)

        q = random_quats(jax.random.PRNGKey(21), 8)
        v = jax.random.normal(jax.random.PRNGKey(22), (8, 3))
        out = fn(q, v)
        assert out.shape == (8, 3)
        assert jnp.all(jnp.isfinite(out))
