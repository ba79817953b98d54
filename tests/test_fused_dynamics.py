"""Equivalence of the batch-last fused dynamics path vs the per-env
reference path (physics/fused.py + engine.step_batch vs vmap(engine.step)).

The fused path is the TPU hot path; the vmapped per-env path is the oracle
(itself validated against analytic solutions in test_physics.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaaclab_tpu.physics import engine as eng
from isaaclab_tpu.physics.collision import CollisionPlan
from isaaclab_tpu.physics.model import (
    JOINT_FREE,
    JOINT_PRISMATIC,
    JOINT_REVOLUTE,
    GEOM_SPHERE,
    ModelBuilder,
)

E = 8


def _tile_state(model, plan, E):
    from isaaclab_tpu.physics.solver import num_limit_rows

    s = eng.PhysicsState.create(model, plan.ncon, num_limit_rows(model))
    return jax.tree.map(lambda x: jnp.tile(x, (E,) + (1,) * x.ndim), s)


def _tile_params(model, E):
    p = eng.BodyParams.from_model(model)
    return jax.tree.map(lambda x: jnp.tile(x, (E,) + (1,) * x.ndim), p)


def _rand_drive(model, key, E):
    k = jax.random.split(key, 5)
    nu = model.nu
    return eng.JointDrive(
        kp=jax.random.uniform(k[0], (E, nu), minval=0.0, maxval=50.0),
        kd=jax.random.uniform(k[1], (E, nu), minval=0.0, maxval=5.0),
        pos_target=0.3 * jax.random.normal(k[2], (E, nu)),
        vel_target=0.1 * jax.random.normal(k[3], (E, nu)),
        effort=0.5 * jax.random.normal(k[4], (E, nu)),
    )


def _run_both(model, plan, state, drive, params, cfg, n=20, terrain=None,
              offsets=None):
    def ref_chunk(s):
        def body(c, _):
            def one(phys, drv, prm, off):
                ns, _, _ = eng.step(model, plan, phys, drv, prm, cfg,
                                    terrain=terrain, terrain_offset=off)
                return ns
            if offsets is None:
                c2 = jax.vmap(lambda p_, d_, pr_: one(p_, d_, pr_, None))(
                    c, drive, params
                )
            else:
                c2 = jax.vmap(one)(c, drive, params, offsets)
            return c2, None
        s, _ = jax.lax.scan(body, s, None, length=n)
        return s

    def fused_chunk(s):
        def body(c, _):
            ns, _, _ = eng.step_batch(model, plan, c, drive, params, cfg,
                                      terrain=terrain, terrain_offset=offsets)
            return ns, None
        s, _ = jax.lax.scan(body, s, None, length=n)
        return s

    ref = jax.jit(ref_chunk)(state)
    fus = jax.jit(fused_chunk)(state)
    return ref, fus


def _assert_close(ref, fus, atol=2e-3):
    np.testing.assert_allclose(
        np.asarray(fus.q), np.asarray(ref.q), atol=atol,
        err_msg="q diverged",
    )
    np.testing.assert_allclose(
        np.asarray(fus.qd), np.asarray(ref.qd), atol=10 * atol,
        err_msg="qd diverged",
    )


class TestFusedEquivalence:
    def test_double_pendulum(self):
        b = ModelBuilder("dp")
        b.add_body("l0", -1, JOINT_REVOLUTE, jnt_axis=(0, 1, 0), mass=1.0,
                   com=(0, 0, -0.3), inertia=np.eye(3) * 0.02, jnt_name="j0",
                   limits=(-2.0, 2.0))
        b.add_body("l1", 0, JOINT_REVOLUTE, jnt_axis=(1, 0, 0),
                   body_pos=(0, 0, -0.6), mass=0.7, com=(0, 0, -0.25),
                   inertia=np.eye(3) * 0.01, jnt_name="j1",
                   limits=(-2.0, 2.0))
        model = b.build()
        plan = CollisionPlan(model, with_ground=False)
        cfg = eng.EngineCfg(dt=1.0 / 120.0)
        state = _tile_state(model, plan, E)
        state = state._replace(
            q=0.3 * jax.random.normal(jax.random.PRNGKey(1), (E, model.nq)),
            qd=0.2 * jax.random.normal(jax.random.PRNGKey(2), (E, model.nv)),
        )
        drive = _rand_drive(model, jax.random.PRNGKey(3), E)
        params = _tile_params(model, E)
        ref, fus = _run_both(model, plan, state, drive, params, cfg)
        _assert_close(ref, fus)

    def test_cartpole_prismatic(self):
        b = ModelBuilder("cp")
        b.add_body("cart", -1, JOINT_PRISMATIC, jnt_axis=(1, 0, 0), mass=1.0,
                   inertia=np.eye(3) * 0.01, jnt_name="slide")
        b.add_body("pole", 0, JOINT_REVOLUTE, jnt_axis=(0, 1, 0), mass=0.3,
                   com=(0, 0, 0.4), inertia=np.eye(3) * 0.005,
                   jnt_name="hinge")
        model = b.build()
        plan = CollisionPlan(model, with_ground=False)
        cfg = eng.EngineCfg(dt=1.0 / 120.0)
        state = _tile_state(model, plan, E)
        state = state._replace(
            q=0.2 * jax.random.normal(jax.random.PRNGKey(4), (E, model.nq)),
        )
        drive = _rand_drive(model, jax.random.PRNGKey(5), E)
        params = _tile_params(model, E)
        ref, fus = _run_both(model, plan, state, drive, params, cfg, n=40)
        _assert_close(ref, fus)

    def test_free_ball_on_ground(self):
        b = ModelBuilder("ball")
        b.add_body("ball", -1, JOINT_FREE, mass=1.0,
                   inertia=np.eye(3) * 0.004)
        b.add_geom(0, GEOM_SPHERE, (0.1,), friction=0.8)
        model = b.build()
        plan = CollisionPlan(model, with_ground=True)
        cfg = eng.EngineCfg(dt=1.0 / 120.0)
        state = _tile_state(model, plan, E)
        key = jax.random.PRNGKey(6)
        q = state.q.at[:, 2].set(
            0.1 + 0.2 * jax.random.uniform(key, (E,))
        )
        qd = state.qd.at[:, 3:5].set(
            0.5 * jax.random.normal(key, (E, 2))
        )
        state = state._replace(q=q, qd=qd)
        drive = eng.JointDrive(*(jnp.zeros((E, 0)),) * 5)
        params = _tile_params(model, E)
        ref, fus = _run_both(model, plan, state, drive, params, cfg, n=60)
        _assert_close(ref, fus)

    def test_anymal_locomotion_world(self):
        from isaaclab_tpu.assets_presets.anymal import build_anymal_model

        model = build_anymal_model()
        plan = CollisionPlan(model, with_ground=True)
        cfg = eng.EngineCfg(dt=1.0 / 200.0)
        state = _tile_state(model, plan, E)
        state = state._replace(
            q=state.q + 0.02 * jax.random.normal(
                jax.random.PRNGKey(7), (E, model.nq)
            )
        )
        drive = _rand_drive(model, jax.random.PRNGKey(8), E)
        params = _tile_params(model, E)
        ref, fus = _run_both(model, plan, state, drive, params, cfg, n=30)
        _assert_close(ref, fus, atol=5e-3)

    def test_external_wrench(self):
        b = ModelBuilder("fb")
        b.add_body("base", -1, JOINT_FREE, mass=2.0, inertia=np.eye(3) * 0.02)
        b.add_body("arm", 0, JOINT_REVOLUTE, jnt_axis=(0, 0, 1),
                   body_pos=(0.2, 0, 0), mass=0.5, com=(0.1, 0, 0),
                   inertia=np.eye(3) * 0.003, jnt_name="j")
        model = b.build()
        plan = CollisionPlan(model, with_ground=False)
        cfg = eng.EngineCfg(dt=1.0 / 120.0, gravity=(0.0, 0.0, 0.0))
        state = _tile_state(model, plan, E)
        f_ext = 0.3 * jax.random.normal(
            jax.random.PRNGKey(9), (E, model.nbody, 6)
        )
        state = state._replace(f_ext_w=f_ext)
        drive = _rand_drive(model, jax.random.PRNGKey(10), E)
        params = _tile_params(model, E)
        ref, fus = _run_both(model, plan, state, drive, params, cfg, n=20)
        _assert_close(ref, fus)

    def test_tendon_coupling(self):
        b = ModelBuilder("tend")
        b.add_body("l0", -1, JOINT_REVOLUTE, jnt_axis=(0, 1, 0), mass=0.5,
                   com=(0, 0, -0.2), inertia=np.eye(3) * 1e-3, jnt_name="j0")
        b.add_body("l1", 0, JOINT_REVOLUTE, jnt_axis=(0, 1, 0),
                   body_pos=(0, 0, -0.4), mass=0.5, com=(0, 0, -0.2),
                   inertia=np.eye(3) * 1e-3, jnt_name="j1")
        b.add_tendon("c", {"j1": 1.0, "j0": -1.0}, limit_stiffness=30.0,
                     damping=0.3, limits=(0.0, 0.0))
        model = b.build()
        plan = CollisionPlan(model, with_ground=False)
        cfg = eng.EngineCfg(dt=1.0 / 120.0)
        state = _tile_state(model, plan, E)
        drive = _rand_drive(model, jax.random.PRNGKey(11), E)
        params = _tile_params(model, E)
        ref, fus = _run_both(model, plan, state, drive, params, cfg, n=40)
        _assert_close(ref, fus)

    def test_heightfield_terrain(self):
        from isaaclab_tpu.physics.collision import HeightField

        b = ModelBuilder("ball")
        b.add_body("ball", -1, JOINT_FREE, mass=1.0,
                   inertia=np.eye(3) * 0.004)
        b.add_geom(0, GEOM_SPHERE, (0.15,), friction=0.6)
        model = b.build()
        plan = CollisionPlan(model, with_ground=True)
        cfg = eng.EngineCfg(dt=1.0 / 120.0)
        hf = HeightField(
            heights=jnp.asarray(
                0.05 * np.sin(np.arange(32))[:, None]
                * np.cos(np.arange(32))[None, :]
            ).astype(jnp.float32),
            horizontal_scale=0.1,
            origin=jnp.array([-1.6, -1.6]),
        )
        offsets = jnp.concatenate(
            [0.3 * jax.random.normal(jax.random.PRNGKey(12), (E, 2)),
             jnp.zeros((E, 1))], axis=1
        )
        state = _tile_state(model, plan, E)
        state = state._replace(q=state.q.at[:, 2].set(0.3))
        drive = eng.JointDrive(*(jnp.zeros((E, 0)),) * 5)
        params = _tile_params(model, E)
        ref, fus = _run_both(model, plan, state, drive, params, cfg, n=40,
                             terrain=hf, offsets=offsets)
        _assert_close(ref, fus)
