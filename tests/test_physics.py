"""Physics engine validation against analytic solutions.

Golden-trajectory tests the reference cannot do (its tests need a booted
simulator — SURVEY.md §4): pendulum period, free-fall kinematics, energy
conservation, resting contact, mass-matrix symmetry.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaaclab_tpu.physics import engine as eng
from isaaclab_tpu.physics.collision import CollisionPlan
from isaaclab_tpu.physics.dynamics import crba, rnea_bias
from isaaclab_tpu.physics.kinematics import forward_kinematics, point_jacobian
from isaaclab_tpu.physics.model import (
    GEOM_SPHERE,
    JOINT_FREE,
    JOINT_PRISMATIC,
    JOINT_REVOLUTE,
    ModelBuilder,
)


def make_pendulum(length=1.0, mass=1.0):
    """Point-mass pendulum: revolute about y at origin, COM at (0,0,-L)."""
    b = ModelBuilder("pendulum")
    b.add_body(
        "pole",
        parent=-1,
        jnt_type=JOINT_REVOLUTE,
        jnt_axis=(0, 1, 0),
        jnt_pos=(0, 0, 0),
        mass=mass,
        com=(0, 0, -length),
        inertia=np.zeros((3, 3)),  # point mass: inertia from COM offset only
        jnt_name="hinge",
    )
    return b.build()


def make_free_ball(radius=0.1, mass=1.0):
    b = ModelBuilder("ball")
    b.add_body(
        "ball",
        parent=-1,
        jnt_type=JOINT_FREE,
        mass=mass,
        inertia=np.eye(3) * (0.4 * mass * radius**2),
    )
    b.add_geom(0, GEOM_SPHERE, (radius,), restitution=0.0, friction=1.0)
    return b.build()


def simulate(model, plan, state, drive, params, cfg, n_steps, terrain=None):
    def body(state, _):
        new_state, _, _ = eng.step(model, plan, state, drive, params, cfg, terrain)
        return new_state, new_state.q

    return jax.lax.scan(body, state, None, length=n_steps)


class TestDynamicsAlgorithms:
    def test_mass_matrix_pendulum(self):
        L, m = 0.7, 2.0
        model = make_pendulum(L, m)
        kin = forward_kinematics(model, jnp.array([0.3]))
        H = crba(model, kin)
        # point mass at distance L: H = m L^2
        np.testing.assert_allclose(H[0, 0], m * L * L, rtol=1e-5)

    def test_gravity_torque_pendulum(self):
        L, m, g = 0.7, 2.0, 9.81
        model = make_pendulum(L, m)
        for theta in [0.0, 0.4, -1.1, np.pi / 2]:
            kin = forward_kinematics(model, jnp.array([theta]))
            C = rnea_bias(model, kin, jnp.zeros(1), jnp.array([0.0, 0.0, -g]))
            # tau_gravity = -m g L sin(theta) (theta from straight down, +y axis)
            np.testing.assert_allclose(
                C[0], m * g * L * np.sin(theta), rtol=1e-4, atol=1e-5
            )

    def test_mass_matrix_symmetry_double_pendulum(self):
        b = ModelBuilder("dp")
        b.add_body("l1", -1, JOINT_REVOLUTE, jnt_axis=(0, 1, 0), mass=1.0,
                   com=(0, 0, -0.5), inertia=np.eye(3) * 0.02)
        b.add_body("l2", 0, JOINT_REVOLUTE, jnt_axis=(0, 1, 0),
                   jnt_pos=(0, 0, -1.0), mass=1.5, com=(0, 0, -0.4),
                   inertia=np.eye(3) * 0.03)
        model = b.build()
        kin = forward_kinematics(model, jnp.array([0.3, -0.7]))
        H = crba(model, kin)
        np.testing.assert_allclose(H, H.T, atol=1e-6)
        assert np.all(np.linalg.eigvalsh(np.asarray(H)) > 0)

    def test_floating_base_mass_matrix(self):
        model = make_free_ball(0.1, 3.0)
        kin = forward_kinematics(model, jnp.asarray(model.default_qpos()))
        H = crba(model, kin)
        np.testing.assert_allclose(H[3:, 3:], np.eye(3) * 3.0, atol=1e-6)
        np.testing.assert_allclose(H, H.T, atol=1e-6)

    def test_point_jacobian_matches_fd(self):
        """Jacobian columns vs finite-difference of FK."""
        b = ModelBuilder("arm")
        b.add_body("l1", -1, JOINT_REVOLUTE, jnt_axis=(0, 0, 1), mass=1.0)
        b.add_body("l2", 0, JOINT_REVOLUTE, jnt_axis=(0, 1, 0),
                   jnt_pos=(0.5, 0, 0), mass=1.0)
        b.add_body("l3", 1, JOINT_PRISMATIC, jnt_axis=(1, 0, 0),
                   jnt_pos=(0.4, 0, 0), mass=1.0)
        model = b.build()
        q0 = jnp.array([0.3, -0.5, 0.2])

        def tip_pos(q):
            kin = forward_kinematics(model, q)
            return kin.body_pos_w[2]

        kin = forward_kinematics(model, q0)
        J = point_jacobian(model, kin, 2, kin.body_pos_w[2])
        J_fd = jax.jacobian(tip_pos)(q0)
        np.testing.assert_allclose(J, J_fd, atol=1e-4)


class TestIntegration:
    def test_pendulum_small_oscillation_period(self):
        """Small-amplitude period ~ 2*pi*sqrt(L/g)."""
        L, g = 1.0, 9.81
        model = make_pendulum(L, 1.0)
        plan = CollisionPlan(model, with_ground=False)
        cfg = eng.EngineCfg(dt=1.0 / 1000.0, gravity=(0, 0, -g))
        params = eng.BodyParams.from_model(model)
        drive = eng.JointDrive.zero(model.nu)
        state = eng.PhysicsState.create(model, plan.ncon, 2 * model.nu)
        state = state._replace(q=jnp.array([0.05]))

        n_steps = 4000
        _, qs = jax.jit(
            lambda s: simulate(model, plan, s, drive, params, cfg, n_steps)
        )(state)
        qs = np.asarray(qs)[:, 0]
        # find zero crossings (downward)
        sign = np.sign(qs)
        crossings = np.where((sign[:-1] > 0) & (sign[1:] <= 0))[0]
        assert len(crossings) >= 2
        period = (crossings[1] - crossings[0]) * cfg.dt
        expected = 2 * np.pi * np.sqrt(L / g)
        np.testing.assert_allclose(period, expected, rtol=0.02)

    def test_free_fall(self):
        """Floating body: z(t) = z0 - g t^2 / 2 under semi-implicit Euler."""
        model = make_free_ball()
        plan = CollisionPlan(model, with_ground=False)
        g = 9.81
        cfg = eng.EngineCfg(dt=0.01, gravity=(0, 0, -g))
        params = eng.BodyParams.from_model(model)
        drive = eng.JointDrive.zero(model.nu)
        state = eng.PhysicsState.create(model, plan.ncon, 0)
        state = state._replace(q=state.q.at[2].set(10.0))

        n = 100
        final, _ = jax.jit(
            lambda s: simulate(model, plan, s, drive, params, cfg, n)
        )(state)
        # semi-implicit Euler: z = z0 - g*dt^2*(1+2+...+n) = z0 - g dt^2 n(n+1)/2
        expected = 10.0 - g * cfg.dt**2 * n * (n + 1) / 2
        np.testing.assert_allclose(final.q[2], expected, rtol=1e-4)
        # world-frame vz = -g dt n
        np.testing.assert_allclose(final.qd[5], -g * cfg.dt * n, rtol=1e-4)

    def test_tumbling_conserves_angular_momentum_magnitude(self):
        """Torque-free rigid body: |L| conserved (Euler equations)."""
        model = make_free_ball(0.1, 1.0)
        # non-spherical inertia
        model.inertia[0] = np.diag([0.01, 0.02, 0.03])
        plan = CollisionPlan(model, with_ground=False)
        cfg = eng.EngineCfg(dt=1e-3, gravity=(0, 0, 0))
        params = eng.BodyParams.from_model(model)
        drive = eng.JointDrive.zero(model.nu)
        state = eng.PhysicsState.create(model, plan.ncon, 0)
        state = state._replace(qd=state.qd.at[:3].set(jnp.array([3.0, 0.1, 1.0])))

        final, _ = jax.jit(
            lambda s: simulate(model, plan, s, drive, params, cfg, 500)
        )(state)
        I = jnp.asarray(model.inertia[0])

        def ang_mom_world(st):
            from isaaclab_tpu.utils import math as mu

            quat = st.q[3:7]
            # qd[:3] is world-frame omega; L_w = R I_b R^T w_w
            w_b = mu.quat_apply_inverse(quat, st.qd[:3])
            return mu.quat_apply(quat, I @ w_b)

        L0 = ang_mom_world(state)
        L1 = ang_mom_world(final)
        np.testing.assert_allclose(
            jnp.linalg.norm(L1), jnp.linalg.norm(L0), rtol=5e-3
        )


class TestContacts:
    def test_ball_rests_on_plane(self):
        model = make_free_ball(radius=0.2)
        plan = CollisionPlan(model, with_ground=True)
        cfg = eng.EngineCfg(dt=1.0 / 120.0)
        params = eng.BodyParams.from_model(model)
        drive = eng.JointDrive.zero(model.nu)
        state = eng.PhysicsState.create(model, plan.ncon, 0)
        state = state._replace(q=state.q.at[2].set(0.5))

        final, qs = jax.jit(
            lambda s: simulate(model, plan, s, drive, params, cfg, 240)
        )(state)
        # ball should be resting at z ~ radius
        np.testing.assert_allclose(final.q[2], 0.2, atol=0.01)
        np.testing.assert_allclose(final.qd, 0.0, atol=0.05)
        # contact force ~ m g upward
        np.testing.assert_allclose(
            final.contact_force_w[0, 2], 1.0 * 9.81, rtol=0.1
        )

    def test_ball_friction_transitions_to_rolling(self):
        """A sliding ball's contact-point slip velocity is driven to zero by
        friction (rolling without slipping); the rolling speed matches the
        angular-momentum-about-contact conservation value."""
        model = make_free_ball(radius=0.2)
        # solid-sphere inertia consistent with the geom radius
        model.inertia[0] = np.eye(3) * (0.4 * 1.0 * 0.2**2)
        plan = CollisionPlan(model, with_ground=True)
        cfg = eng.EngineCfg(dt=1.0 / 120.0)
        params = eng.BodyParams.from_model(model)
        drive = eng.JointDrive.zero(model.nu)
        state = eng.PhysicsState.create(model, plan.ncon, 0)
        state = state._replace(
            q=state.q.at[2].set(0.2), qd=state.qd.at[3].set(2.0)
        )
        final, _ = jax.jit(
            lambda s: simulate(model, plan, s, drive, params, cfg, 240)
        )(state)
        # free-joint qd is world-frame already
        w_w = final.qd[:3]
        v_w = final.qd[3:6]
        # slip at the contact point ~ 0 (rolling)
        slip = v_w[0] + w_w[1] * (-0.2)
        assert abs(float(slip)) < 0.1
        # rolling speed: v0 / (1 + I/(m r^2)) = 2 / 1.4
        np.testing.assert_allclose(float(v_w[0]), 2.0 / 1.4, atol=0.15)


class TestPDControl:
    def test_pd_holds_target(self):
        model = make_pendulum(1.0, 1.0)
        plan = CollisionPlan(model, with_ground=False)
        cfg = eng.EngineCfg(dt=1.0 / 120.0)
        params = eng.BodyParams.from_model(model)
        target = 0.8
        drive = eng.JointDrive(
            kp=jnp.array([200.0]),
            kd=jnp.array([20.0]),
            pos_target=jnp.array([target]),
            vel_target=jnp.zeros(1),
            effort=jnp.zeros(1),
        )
        state = eng.PhysicsState.create(model, plan.ncon, 2 * model.nu)
        final, _ = jax.jit(
            lambda s: simulate(model, plan, s, drive, params, cfg, 600)
        )(state)
        # gravity torque at 0.8 rad: ~ m g L sin(0.8) = 7.04; kp error ~ 0.035
        np.testing.assert_allclose(final.q[0], target, atol=0.05)
        np.testing.assert_allclose(final.qd[0], 0.0, atol=0.05)

    def test_joint_limits_respected(self):
        b = ModelBuilder("limited")
        b.add_body(
            "pole", -1, JOINT_REVOLUTE, jnt_axis=(0, 1, 0), mass=1.0,
            com=(0, 0, -0.5), inertia=np.eye(3) * 0.01, limits=(-0.3, 0.3),
        )
        model = b.build()
        plan = CollisionPlan(model, with_ground=False)
        cfg = eng.EngineCfg(dt=1.0 / 240.0)
        params = eng.BodyParams.from_model(model)
        # push hard against the upper limit
        drive = eng.JointDrive(
            kp=jnp.zeros(1), kd=jnp.zeros(1), pos_target=jnp.zeros(1),
            vel_target=jnp.zeros(1), effort=jnp.array([5.0]),
        )
        state = eng.PhysicsState.create(model, plan.ncon, 2 * model.nu)
        final, qs = jax.jit(
            lambda s: simulate(model, plan, s, drive, params, cfg, 480)
        )(state)
        assert float(final.q[0]) < 0.35  # limit holds (some softness allowed)


class TestBatching:
    def test_vmap_over_envs(self):
        model = make_pendulum()
        plan = CollisionPlan(model, with_ground=False)
        cfg = eng.EngineCfg(dt=1.0 / 120.0)
        params = eng.BodyParams.from_model(model)
        drive = eng.JointDrive.zero(model.nu)
        n_envs = 8
        state = eng.PhysicsState.create(model, plan.ncon, 2 * model.nu)
        batch = jax.tree.map(lambda x: jnp.tile(x, (n_envs,) + (1,) * x.ndim), state)
        batch = batch._replace(q=jnp.linspace(-1, 1, n_envs)[:, None])

        step_fn = jax.jit(
            jax.vmap(
                lambda s: eng.step(model, plan, s, drive, params, cfg)[0]
            )
        )
        out = step_fn(batch)
        assert out.q.shape == (n_envs, 1)
        assert bool(jnp.all(jnp.isfinite(out.q)))
        # different initial conditions -> different evolution
        assert len(set(np.asarray(out.q[:, 0]).round(6).tolist())) == n_envs


class TestCrbaWorld:
    def test_matches_recursive_crba(self):
        """Jacobian-space mass matrix == Featherstone CRBA on a floating-base
        multi-body (anymal-like) at random configurations."""
        import jax.numpy as jnp

        from isaaclab_tpu.assets_presets.anymal import build_anymal_c_model
        from isaaclab_tpu.physics.solver import crba_world

        model = build_anymal_c_model()
        key = jax.random.PRNGKey(0)

        @jax.jit
        def both(q):
            kin = forward_kinematics(model, q)
            H1 = crba(model, kin)
            H2 = crba_world(
                model, kin,
                jnp.asarray(model.mass), jnp.asarray(model.inertia),
                jnp.asarray(model.com),
            )
            return H1, H2

        q = jnp.asarray(model.default_qpos())
        # random perturbation incl. base rotation
        dq = jax.random.uniform(key, (model.nq,), minval=-0.3, maxval=0.3)
        q = q + dq
        from isaaclab_tpu.utils import math as mu

        q = q.at[3:7].set(mu.normalize(q[3:7]))
        H1, H2 = both(q)
        np.testing.assert_allclose(np.asarray(H1), np.asarray(H2), atol=2e-4)


class TestBoxBoxContact:
    """Corner-sampling box-box narrowphase (physics/collision.py:box_box_contacts)."""

    def _two_boxes(self, half=0.05, mass=0.5):
        from isaaclab_tpu.physics.model import GEOM_BOX

        b = ModelBuilder("boxes")
        inertia = np.eye(3) * (mass * (2 * half) ** 2 / 6.0)
        b.add_body("lower", parent=-1, jnt_type=JOINT_FREE, mass=mass, inertia=inertia)
        b.add_geom(0, GEOM_BOX, (half, half, half), friction=1.0)
        b.add_body("upper", parent=-1, jnt_type=JOINT_FREE, mass=mass, inertia=inertia)
        b.add_geom(1, GEOM_BOX, (half, half, half), friction=1.0)
        return b.build()

    def test_stacked_boxes_rest(self):
        model = self._two_boxes()
        pairs = [(model.geoms[0], model.geoms[1])]
        plan = CollisionPlan(model, pairs=pairs, with_ground=True)
        cfg = eng.EngineCfg(dt=1.0 / 120.0)
        params = eng.BodyParams.from_model(model)
        drive = eng.JointDrive.zero(model.nu)
        state = eng.PhysicsState.create(model, plan.ncon, 0)
        # lower box resting on ground, upper box directly on top
        state = state._replace(q=state.q.at[2].set(0.05).at[9].set(0.15))
        final, _ = jax.jit(
            lambda s: simulate(model, plan, s, drive, params, cfg, 240)
        )(state)
        np.testing.assert_allclose(float(final.q[2]), 0.05, atol=0.01)
        np.testing.assert_allclose(float(final.q[9]), 0.15, atol=0.015)
        np.testing.assert_allclose(np.asarray(final.qd), 0.0, atol=0.08)

    def test_offset_box_falls_off(self):
        """An upper box with no overlap must not be held up by phantom contacts."""
        model = self._two_boxes()
        pairs = [(model.geoms[0], model.geoms[1])]
        plan = CollisionPlan(model, pairs=pairs, with_ground=True)
        cfg = eng.EngineCfg(dt=1.0 / 120.0)
        params = eng.BodyParams.from_model(model)
        drive = eng.JointDrive.zero(model.nu)
        state = eng.PhysicsState.create(model, plan.ncon, 0)
        # upper box fully offset in x: falls to the ground next to the lower
        state = state._replace(
            q=state.q.at[2].set(0.05).at[7].set(0.4).at[9].set(0.15)
        )
        final, _ = jax.jit(
            lambda s: simulate(model, plan, s, drive, params, cfg, 360)
        )(state)
        np.testing.assert_allclose(float(final.q[9]), 0.05, atol=0.01)


class TestPallasSolverDispatch:
    """The custom_vmap APGD dispatch must match the per-env reference path
    (the Pallas kernel itself is validated on TPU; on CPU the batch rule
    falls back to vmap of the XLA loop)."""

    def test_batched_dispatch_matches_reference(self):
        from isaaclab_tpu.physics.pallas_solver import make_apgd_dispatch
        from isaaclab_tpu.physics.solver import apgd_solve

        E, nv, ncon, n_lim, iters = 4, 6, 3, 4, 8
        R = 3 * ncon + n_lim
        rng = np.random.RandomState(1)
        J = jnp.asarray(rng.randn(E, nv, R).astype(np.float32) * 0.3)
        MJ = jnp.asarray(rng.randn(E, nv, R).astype(np.float32) * 0.3)
        b = jnp.asarray(rng.randn(E, R).astype(np.float32))
        diag = jnp.asarray(np.abs(rng.randn(E, R)).astype(np.float32) + 0.1)
        act = jnp.asarray((rng.rand(E, R) > 0.2).astype(np.float32))
        mu = jnp.asarray(0.7 * np.ones((E, ncon), np.float32))
        lam0 = jnp.zeros((E, R), jnp.float32)

        ref_fn = lambda Jt, mj, bb, dd, aa, mm, ll: apgd_solve(
            Jt, mj, bb, dd, aa > 0.5, mm, ll, ncon, n_lim, iters
        )
        dispatch = make_apgd_dispatch(ncon, n_lim, iters, ref_fn)
        lam_d = jax.vmap(dispatch)(J, MJ, b, diag, act, mu, lam0)
        lam_r = jax.vmap(ref_fn)(J, MJ, b, diag, act, mu, lam0)
        np.testing.assert_allclose(
            np.asarray(lam_d), np.asarray(lam_r), rtol=1e-5, atol=1e-6
        )


class TestFixedTendons:
    """Fixed-tendon couplings (reference articulation.py:958-1145 +
    FixedTendonPropertiesCfg): L = offset + coef @ q, spring + limit bands."""

    def _coupled_double_pendulum(self, limit_stiffness=50.0):
        b = ModelBuilder("coupled")
        b.add_body(
            "link0", -1, JOINT_REVOLUTE, jnt_axis=(0, 1, 0), mass=0.5,
            com=(0, 0, -0.2), inertia=np.eye(3) * 1e-3, jnt_name="j0",
        )
        b.add_body(
            "link1", 0, JOINT_REVOLUTE, jnt_axis=(0, 1, 0), mass=0.5,
            body_pos=(0, 0, -0.4), com=(0, 0, -0.2),
            inertia=np.eye(3) * 1e-3, jnt_name="j1",
        )
        # zero-width limit band enforcing q1 == q0 (Shadow-hand J0/J1 style)
        b.add_tendon(
            "couple", {"j1": 1.0, "j0": -1.0},
            limit_stiffness=limit_stiffness, damping=0.5, limits=(0.0, 0.0),
        )
        return b.build()

    def test_limit_band_couples_joints(self):
        model = self._coupled_double_pendulum()
        assert model.ntendon == 1
        plan = CollisionPlan(model, with_ground=False)
        cfg = eng.EngineCfg(dt=1.0 / 120.0)
        params = eng.BodyParams.from_model(model)
        # PD drives only j0; the tendon must drag j1 along
        drive = eng.JointDrive(
            kp=jnp.array([40.0, 0.0]), kd=jnp.array([4.0, 0.0]),
            pos_target=jnp.array([0.6, 0.0]), vel_target=jnp.zeros(2),
            effort=jnp.zeros(2),
        )
        state = eng.PhysicsState.create(model, plan.ncon, 2 * model.nu)
        final, qs = jax.jit(
            lambda s: simulate(model, plan, s, drive, params, cfg, 960)
        )(state)
        assert bool(jnp.all(jnp.isfinite(qs)))
        q0, q1 = float(final.q[0]), float(final.q[1])
        assert q0 > 0.3  # drive got somewhere
        np.testing.assert_allclose(q1, q0, atol=0.12)

    def test_rest_length_spring_equilibrium(self):
        # prismatic along x (gravity orthogonal): spring pulls L=q to rest 0.3
        b = ModelBuilder("slider")
        b.add_body(
            "cart", -1, JOINT_PRISMATIC, jnt_axis=(1, 0, 0), mass=1.0,
            inertia=np.eye(3) * 1e-2, jnt_name="slide",
        )
        b.add_tendon("spring", {"slide": 1.0}, stiffness=50.0, damping=8.0,
                     rest_length=0.3)
        model = b.build()
        plan = CollisionPlan(model, with_ground=False)
        cfg = eng.EngineCfg(dt=1.0 / 120.0)
        params = eng.BodyParams.from_model(model)
        drive = eng.JointDrive.zero(model.nu)
        state = eng.PhysicsState.create(model, plan.ncon, 2 * model.nu)
        final, _ = jax.jit(
            lambda s: simulate(model, plan, s, drive, params, cfg, 600)
        )(state)
        np.testing.assert_allclose(float(final.q[0]), 0.3, atol=0.01)
        np.testing.assert_allclose(float(final.qd[0]), 0.0, atol=0.01)

    def test_stiff_tendon_stable_on_light_links(self):
        # shadow-hand regime: limit_stiffness 30 on ~1e-5 inertia phalanges
        # must not explode at dt=1/120 (implicit coupling fold-in)
        b = ModelBuilder("finger")
        b.add_body(
            "p0", -1, JOINT_REVOLUTE, jnt_axis=(0, 1, 0), mass=0.008,
            com=(0, 0, 0.0125), inertia=np.eye(3) * 1e-5, jnt_name="q1",
        )
        b.add_body(
            "p1", 0, JOINT_REVOLUTE, jnt_axis=(0, 1, 0), mass=0.008,
            body_pos=(0, 0, 0.025), com=(0, 0, 0.0125),
            inertia=np.eye(3) * 1e-5, jnt_name="q0",
        )
        b.add_tendon("t", {"q1": 1.0, "q0": -1.0},
                     limit_stiffness=30.0, damping=0.1, limits=(0.0, 0.0))
        model = b.build()
        plan = CollisionPlan(model, with_ground=False)
        cfg = eng.EngineCfg(dt=1.0 / 120.0)
        params = eng.BodyParams.from_model(model)
        drive = eng.JointDrive(
            kp=jnp.array([2.0, 0.0]), kd=jnp.array([0.1, 0.0]),
            pos_target=jnp.array([1.0, 0.0]), vel_target=jnp.zeros(2),
            effort=jnp.zeros(2),
        )
        state = eng.PhysicsState.create(model, plan.ncon, 2 * model.nu)
        final, qs = jax.jit(
            lambda s: simulate(model, plan, s, drive, params, cfg, 480)
        )(state)
        assert bool(jnp.all(jnp.isfinite(qs)))
        assert bool(jnp.all(jnp.abs(qs) < 10.0))
