"""Equivalence of the fused Pallas contact-solve kernel vs the XLA batch
path (physics/pallas_contact.py vs solver.solve_constraints_batch's XLA
branch), run through engine.step_batch on multi-step rollouts.

On CPU the kernel runs in Pallas interpret mode — same math, same code
path selection (ISAACLAB_TPU_FUSED_SOLVER=1); on TPU CI the identical
tests compile the real Mosaic kernel.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaaclab_tpu.physics import engine as eng
from isaaclab_tpu.physics.collision import CollisionPlan, HeightField
from isaaclab_tpu.physics.model import (
    GEOM_BOX,
    GEOM_CAPSULE,
    GEOM_SPHERE,
    JOINT_FREE,
    JOINT_REVOLUTE,
    ModelBuilder,
)

E = 6


def _tile_state(model, plan, E):
    from isaaclab_tpu.physics.solver import num_limit_rows

    s = eng.PhysicsState.create(model, plan.ncon, num_limit_rows(model))
    return jax.tree.map(lambda x: jnp.tile(x, (E,) + (1,) * x.ndim), s)


def _tile_params(model, E):
    p = eng.BodyParams.from_model(model)
    return jax.tree.map(lambda x: jnp.tile(x, (E,) + (1,) * x.ndim), p)


def _run_modes(model, plan, state, drive, params, cfg, n=15, terrain=None,
               offsets=None):
    """step_batch n steps with the XLA solver, then with the fused kernel."""

    def chunk(s):
        def body(c, _):
            ns, _, _ = eng.step_batch(model, plan, c, drive, params, cfg,
                                      terrain=terrain, terrain_offset=offsets)
            return ns, None

        s, _ = jax.lax.scan(body, s, None, length=n)
        return s

    old = os.environ.get("ISAACLAB_TPU_FUSED_SOLVER")
    try:
        os.environ["ISAACLAB_TPU_FUSED_SOLVER"] = "0"
        ref = jax.jit(chunk)(state)
        ref = jax.tree.map(np.asarray, ref)
        os.environ["ISAACLAB_TPU_FUSED_SOLVER"] = "1"
        fus = jax.jit(lambda s: chunk(s))(state)  # fresh closure: retrace
        fus = jax.tree.map(np.asarray, fus)
    finally:
        if old is None:
            os.environ.pop("ISAACLAB_TPU_FUSED_SOLVER", None)
        else:
            os.environ["ISAACLAB_TPU_FUSED_SOLVER"] = old
    return ref, fus


def _assert_close(ref, fus, atol=2e-3):
    np.testing.assert_allclose(fus.q, ref.q, atol=atol, err_msg="q diverged")
    np.testing.assert_allclose(
        fus.qd, ref.qd, atol=10 * atol, err_msg="qd diverged")
    np.testing.assert_allclose(
        fus.contact_force_w, ref.contact_force_w, atol=2.0,
        err_msg="contact forces diverged")


def _ball_arm_model():
    """Free ball bouncing on the ground next to a 2-link limited arm whose
    capsule can hit the ball: ground rows + a two-body pair + limit rows."""
    b = ModelBuilder("w")
    ball = b.add_body("ball", -1, JOINT_FREE, mass=0.4,
                      inertia=np.eye(3) * 0.002)
    b.add_geom(ball, GEOM_SPHERE, (0.12,), friction=0.7, restitution=0.3)
    l0 = b.add_body("l0", -1, JOINT_REVOLUTE, jnt_axis=(0, 1, 0),
                    jnt_pos=(0.35, 0, 0.25), mass=0.8, com=(0, 0, -0.15),
                    inertia=np.eye(3) * 0.01, jnt_name="j0",
                    limits=(-1.5, 1.5))
    b.add_geom(l0, GEOM_CAPSULE, (0.04, 0.15), pos=(0, 0, -0.15),
               friction=0.6)
    l1 = b.add_body("l1", l0, JOINT_REVOLUTE, jnt_axis=(0, 1, 0),
                    body_pos=(0, 0, -0.3), mass=0.5, com=(0, 0, -0.1),
                    inertia=np.eye(3) * 0.005, jnt_name="j1",
                    limits=(-2.0, 2.0))
    b.add_geom(l1, GEOM_CAPSULE, (0.035, 0.1), pos=(0, 0, -0.1),
               friction=0.6)
    model = b.build()
    geoms = model.geoms
    pairs = [(geoms[0], geoms[1]), (geoms[0], geoms[2])]
    plan = CollisionPlan(model, pairs=pairs, with_ground=True)
    return model, plan


class TestFusedContactKernel:
    def test_ball_arm_ground(self):
        model, plan = _ball_arm_model()
        cfg = eng.EngineCfg(dt=1.0 / 120.0)
        state = _tile_state(model, plan, E)
        key = jax.random.PRNGKey(0)
        q = state.q
        q = q.at[:, 2].set(
            0.25 + 0.1 * jax.random.uniform(key, (E,)))  # ball above ground
        q = q.at[:, 7].add(0.3 * jax.random.normal(key, (E,)))
        state = state._replace(
            q=q, qd=0.3 * jax.random.normal(key, (E, model.nv)))
        drive = eng.JointDrive(
            kp=jnp.full((E, model.nu), 20.0),
            kd=jnp.full((E, model.nu), 1.0),
            pos_target=jnp.tile(
                jnp.asarray([-1.2, 0.5]), (E, 1)),
            vel_target=jnp.zeros((E, model.nu)),
            effort=jnp.zeros((E, model.nu)),
        )
        params = _tile_params(model, E)
        ref, fus = _run_modes(model, plan, state, drive, params, cfg)
        assert np.all(np.isfinite(fus.q))
        # contacts actually active (otherwise this tests nothing)
        assert np.max(np.abs(ref.contact_force_w)) > 1.0
        _assert_close(ref, fus)

    def test_box_stack_two_body(self):
        """Box-on-box stack: exercises the mask_a - mask_b two-body path
        and the box-box 17-candidate manifold through the kernel."""
        b = ModelBuilder("s")
        b1 = b.add_body("b1", -1, JOINT_FREE, mass=1.0,
                        inertia=np.eye(3) * 0.01)
        b.add_geom(b1, GEOM_BOX, (0.1, 0.1, 0.1), friction=0.8)
        b2 = b.add_body("b2", -1, JOINT_FREE, mass=0.5,
                        inertia=np.eye(3) * 0.005)
        b.add_geom(b2, GEOM_BOX, (0.08, 0.08, 0.08), friction=0.8)
        model = b.build()
        pairs = [(model.geoms[0], model.geoms[1])]
        plan = CollisionPlan(model, pairs=pairs, with_ground=True)
        cfg = eng.EngineCfg(dt=1.0 / 120.0)
        state = _tile_state(model, plan, E)
        q = state.q
        q = q.at[:, 2].set(0.1)       # bottom box resting
        q = q.at[:, 9].set(0.285)     # top box slightly above
        q = q.at[:, 7].set(0.02)      # small xy offset
        state = state._replace(q=q)
        drive = eng.JointDrive.zero(0)
        drive = jax.tree.map(lambda x: jnp.tile(x, (E, 1)), drive)
        params = _tile_params(model, E)
        # short rollout: single-step parity is ~1e-7, but the box-box SAT
        # edge candidate's argmin branch makes long stacking rollouts
        # chaotic — f32 order-of-ops noise amplifies past any fixed atol
        ref, fus = _run_modes(model, plan, state, drive, params, cfg, n=8)
        assert np.max(np.abs(ref.contact_force_w)) > 1.0
        _assert_close(ref, fus)

    def test_heightfield_terrain(self):
        """Ball on a bumpy heightfield with per-env terrain offsets."""
        b = ModelBuilder("h")
        ball = b.add_body("ball", -1, JOINT_FREE, mass=0.3,
                          inertia=np.eye(3) * 0.001)
        b.add_geom(ball, GEOM_SPHERE, (0.1,), friction=0.9)
        model = b.build()
        plan = CollisionPlan(model, with_ground=True)
        hts = 0.05 * np.sin(np.arange(32))[:, None] * np.cos(
            np.arange(32))[None, :]
        terrain = HeightField(
            heights=jnp.asarray(hts, jnp.float32), horizontal_scale=0.25,
            origin=jnp.asarray([-4.0, -4.0]))
        offsets = jnp.asarray(
            np.random.RandomState(0).uniform(-1, 1, (E, 3)), jnp.float32)
        cfg = eng.EngineCfg(dt=1.0 / 120.0)
        state = _tile_state(model, plan, E)
        state = state._replace(q=state.q.at[:, 2].set(0.3))
        drive = jax.tree.map(
            lambda x: jnp.tile(x, (E, 1)), eng.JointDrive.zero(0))
        params = _tile_params(model, E)
        ref, fus = _run_modes(model, plan, state, drive, params, cfg, n=30,
                              terrain=terrain, offsets=offsets)
        assert np.max(np.abs(ref.contact_force_w)) > 0.5
        _assert_close(ref, fus)

    def test_warm_start_carried(self):
        """The kernel consumes the carried warm_lambda exactly like the XLA
        path: a second rollout seeded from the first's state must match."""
        model, plan = _ball_arm_model()
        cfg = eng.EngineCfg(dt=1.0 / 120.0)
        state = _tile_state(model, plan, E)
        state = state._replace(q=state.q.at[:, 2].set(0.121))
        drive = eng.JointDrive(
            kp=jnp.full((E, model.nu), 10.0),
            kd=jnp.full((E, model.nu), 0.5),
            pos_target=jnp.zeros((E, model.nu)),
            vel_target=jnp.zeros((E, model.nu)),
            effort=jnp.zeros((E, model.nu)),
        )
        params = _tile_params(model, E)
        ref1, fus1 = _run_modes(model, plan, state, drive, params, cfg, n=10)
        assert np.any(np.abs(np.asarray(fus1.warm_lambda)) > 1e-6), (
            "warm start never populated")
        ref2, fus2 = _run_modes(
            model, plan, jax.tree.map(jnp.asarray, fus1), drive, params,
            cfg, n=10)
        _assert_close(ref2, fus2)
