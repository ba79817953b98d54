"""Static active-set contact compaction (SolverCfg.active_contacts — the
TPU recast of PhysX broadphase culling, solver.py): top-K selection must be
EXACT whenever at most K candidates touch, and must keep candidate-layout
outputs (impulses, forces, warm start) intact."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from isaaclab_tpu.physics import engine as eng  # noqa: E402
from isaaclab_tpu.physics import fused  # noqa: E402
from isaaclab_tpu.physics.collision import CollisionPlan, Contacts  # noqa: E402
from isaaclab_tpu.physics.model import (  # noqa: E402
    GEOM_SPHERE,
    JOINT_FREE,
    ModelBuilder,
)
from isaaclab_tpu.physics.solver import (  # noqa: E402
    SolverCfg,
    num_limit_rows,
    solve_constraints_batch,
)


@pytest.fixture(scope="module")
def plate_world():
    """Free 3x3 sphere plate over ground: 9 candidates, all 9 touch when
    flat, 3 touch when tilted."""
    b = ModelBuilder("plate")
    body = b.add_body(
        "plate", -1, JOINT_FREE, mass=1.0, inertia=np.eye(3) * 0.05
    )
    for i, dx in enumerate((-0.2, 0.0, 0.2)):
        for j, dy in enumerate((-0.2, 0.0, 0.2)):
            b.add_geom(body, GEOM_SPHERE, (0.05,), pos=(dx, dy, 0.0),
                       name=f"s{i}{j}")
    m = b.build()
    return m, CollisionPlan(m, with_ground=True)


def _solve(model, plan, q, qd, active):
    E = q.shape[0]
    params = eng.BodyParams.from_model(model)
    params = jax.tree.map(
        lambda x: jnp.broadcast_to(jnp.asarray(x), (E,) + jnp.asarray(x).shape),
        params,
    )
    dt = 1 / 120

    @jax.jit
    def run(q, qd, warm):
        dyn = fused.free_dynamics_batch(
            model, q, qd, jnp.zeros((E, model.nv)), params, dt,
            (0.0, 0.0, -9.81),
        )
        pos, nrm, dep, fr, re = jax.vmap(
            lambda k: (lambda c: (c.pos, c.normal, c.depth, c.friction,
                                  c.restitution))(plan.detect(k))
        )(dyn.kin)
        ba, bb = plan.static_bodies()
        con = Contacts(pos=pos, normal=nrm, depth=dep, body_a=ba, body_b=bb,
                       friction=fr, restitution=re)
        cfg = SolverCfg(active_contacts=active)
        return solve_constraints_batch(
            model, dyn.kin, dyn.L, dyn.v_free, con, jnp.zeros((E, 0)), dt,
            cfg, limit_lower=None, limit_upper=None, warm_lambda=warm,
        ), dep

    warm = jnp.zeros((E, 3 * plan.ncon + num_limit_rows(model)))
    return run(q, qd, warm)


def test_topk_exact_when_covering(plate_world):
    model, plan = plate_world
    E = 4
    key = jax.random.PRNGKey(0)
    q = jnp.tile(jnp.asarray(model.default_qpos()), (E, 1))
    # tilted plate: only one edge's 3 spheres touch
    tilt = 0.12
    quat = jnp.array(
        [np.cos(tilt / 2), np.sin(tilt / 2), 0.0, 0.0], dtype=jnp.float32
    )
    q = q.at[:, 2].set(0.062).at[:, 3:7].set(quat)
    qd = 0.2 * jax.random.normal(key, (E, model.nv))
    r0, dep = _solve(model, plan, q, qd, 0)
    assert int((dep > 0).sum(1).max()) <= 4
    r1, _ = _solve(model, plan, q, qd, 4)
    np.testing.assert_allclose(
        np.asarray(r0.qd), np.asarray(r1.qd), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(r0.contact_impulse), np.asarray(r1.contact_impulse),
        atol=1e-5,
    )
    # outputs stay in FULL candidate layout
    assert r1.contact_impulse.shape == (E, plan.ncon, 3)
    assert r1.contact_force_w.shape == (E, plan.ncon, 3)


def test_topk_keeps_deepest_when_oversubscribed(plate_world):
    """With more touching candidates than K, the kept rows are the deepest
    — the resting plate still gets supported (no fall-through)."""
    model, plan = plate_world
    E = 2
    q = jnp.tile(jnp.asarray(model.default_qpos()), (E, 1))
    q = q.at[:, 2].set(0.045)  # all 9 spheres 5mm deep
    qd = jnp.zeros((E, model.nv))
    r, dep = _solve(model, plan, q, qd, 4)
    assert int((dep > 0).sum(1).min()) == 9
    # upward impulse support exists and only K slots carry impulses
    n_imp = np.asarray((np.abs(r.contact_impulse).sum(-1) > 0).sum(1))
    assert (n_imp <= 4).all() and (n_imp > 0).all()
    assert float(r.qd[:, 5].min()) > -0.2  # plate does not accelerate down
