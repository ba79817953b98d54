"""Factory free-peg grasp + scripted insertion (reference
``direct/factory/factory_env.py:127-156`` keeps the held asset friction-
grasped inside PhysX; round-3 unweld).

Marked slow: the 2-env factory world compiles for minutes on the CI CPU.
Run explicitly with ``ISAACLAB_TPU_SLOW=1 pytest tests/test_factory_grasp.py``.
The committed artifact ``artifacts/r03/factory_demo.log`` records a full
scripted-insertion run of the same code path.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("ISAACLAB_TPU_SLOW"),
    reason="factory world compile is minutes on CI CPU; set ISAACLAB_TPU_SLOW=1",
)


@pytest.fixture(scope="module")
def env_and_state():
    import jax
    import jax.numpy as jnp

    from isaaclab_tpu.tasks.direct.factory.factory_env import (
        FactoryEnv,
        FactoryEnvCfg,
    )

    cfg = FactoryEnvCfg()
    cfg.scene.num_envs = 2
    env = FactoryEnv(cfg)
    state = jax.jit(env.init_state)(jax.random.PRNGKey(0))
    state = jax.jit(lambda s: env._reset_idx(s, jnp.ones(2, bool)))(state)
    return env, state


def test_friction_grasp_holds(env_and_state):
    """Zero-action hold: the free peg must stay in the gripper (no weld)."""
    import jax
    import jax.numpy as jnp

    env, state = env_and_state
    step = jax.jit(env.step_state)

    def peg_z(s):
        views, _ = env.scene.data_views(s.scene, env.physics_dt)
        return np.asarray(views["held_asset"].root_pos_w[:, 2])

    z0 = peg_z(state)
    for _ in range(15):
        state, _ = step(state, jnp.zeros((2, 6)))
    drop = float((z0 - peg_z(state)).max())
    assert drop < 0.02, f"peg dropped {drop*1000:.0f} mm out of the gripper"


def test_scripted_insertion_converges(env_and_state):
    """P-controlled descent drives the keypoint distance near the success
    threshold — the insertion mechanics work end to end without a weld."""
    import jax
    import jax.numpy as jnp

    env, state = env_and_state
    step = jax.jit(env.step_state)

    @jax.jit
    def held_and_target(s):
        views, _ = env.scene.data_views(s.scene, env.physics_dt)
        tgt = views["fixed_asset"].root_pos_w + jnp.asarray(env._hole_offset)[None]
        return views["held_asset"].root_pos_w, tgt

    best = np.inf
    for t in range(120):
        pos, tgt = held_and_target(state)
        above = tgt + jnp.array([0.0, 0.0, 0.12])
        xy_err = jnp.linalg.norm((pos - tgt)[:, :2], axis=-1, keepdims=True)
        goal = jnp.where(xy_err > 0.005, above, tgt)
        act = jnp.concatenate(
            [jnp.clip((goal - pos) / 0.05, -1, 1), jnp.zeros((2, 3))], -1
        )
        state, (obs, rew, term, trunc, extras) = step(state, act)
        kp_held, kp_fixed = env._keypoints(state)
        d = float(
            jnp.mean(jnp.linalg.norm(kp_held - kp_fixed, axis=-1), -1).min()
        )
        best = min(best, d)
        if bool(term.all()):
            break
    assert best < 0.08, f"insertion stalled at keypoint distance {best*1000:.0f} mm"
