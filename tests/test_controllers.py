"""Controller tests (reference ``source/isaaclab/test/controllers/``):
RMP-flow convergence + obstacle avoidance on an analytic planar arm."""

import jax.numpy as jnp
import numpy as np


def _planar_arm(q):
    """2-link planar arm in the xy plane, link lengths 1. Returns
    (E, 3) ee pos and (E, 6, 2) spatial jacobian."""
    l1 = l2 = 1.0
    s1, c1 = jnp.sin(q[:, 0]), jnp.cos(q[:, 0])
    s12, c12 = jnp.sin(q[:, 0] + q[:, 1]), jnp.cos(q[:, 0] + q[:, 1])
    x = l1 * c1 + l2 * c12
    y = l1 * s1 + l2 * s12
    pos = jnp.stack([x, y, jnp.zeros_like(x)], axis=-1)
    J = jnp.zeros((q.shape[0], 6, 2))
    J = J.at[:, 0, 0].set(-l1 * s1 - l2 * s12)
    J = J.at[:, 0, 1].set(-l2 * s12)
    J = J.at[:, 1, 0].set(l1 * c1 + l2 * c12)
    J = J.at[:, 1, 1].set(l2 * c12)
    J = J.at[:, 5, 0].set(1.0)
    J = J.at[:, 5, 1].set(1.0)
    return pos, J


def _run(ctrl, cmd, q0, steps=400, obstacles=None):
    from isaaclab_tpu.utils import math as math_utils

    q = q0
    qd = jnp.zeros_like(q0)
    for _ in range(steps):
        pos, J = _planar_arm(q)
        yaw = (q[:, 0] + q[:, 1])[:, None]
        quat = math_utils.quat_from_angle_axis(
            yaw[:, 0], jnp.tile(jnp.array([0.0, 0.0, 1.0]), (q.shape[0], 1))
        )
        q, qd = ctrl.compute(q, qd, pos, quat, J, command=cmd,
                             obstacles=obstacles)
    return q


def test_rmp_flow_reaches_target():
    from isaaclab_tpu.controllers import RmpFlowController, RmpFlowControllerCfg
    from isaaclab_tpu.utils import math as math_utils

    cfg = RmpFlowControllerCfg(orient_metric=0.0)  # position task only
    ctrl = RmpFlowController(
        cfg, num_envs=3, dt=0.02,
        joint_limits=np.array([[-3.0, 3.0], [-3.0, 3.0]]),
    )
    target = jnp.array([[1.2, 0.8, 0.0], [0.5, 1.3, 0.0], [1.5, -0.5, 0.0]])
    quat = jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (3, 1))
    cmd = jnp.concatenate([target, quat], axis=-1)
    q = _run(ctrl, cmd, jnp.array([[0.3, 0.5]] * 3))
    pos, _ = _planar_arm(q)
    err = np.linalg.norm(np.asarray(pos - target), axis=-1)
    assert np.all(err < 0.05), f"RMP-flow did not converge: err={err}"


def test_rmp_flow_avoids_obstacle():
    from isaaclab_tpu.controllers import RmpFlowController, RmpFlowControllerCfg

    cfg = RmpFlowControllerCfg(orient_metric=0.0)
    ctrl = RmpFlowController(cfg, num_envs=1, dt=0.02)
    # target straight through an obstacle sphere: trajectory must keep the
    # ee outside the sphere at every step
    target = jnp.array([[1.8, 0.0, 0.0]])
    cmd = jnp.concatenate(
        [target, jnp.array([[1.0, 0.0, 0.0, 0.0]])], axis=-1
    )
    obstacle = jnp.array([[1.2, 0.35, 0.0, 0.2]])
    q = jnp.array([[1.2, 0.6]])  # start above the obstacle
    qd = jnp.zeros_like(q)
    min_gap = 1e9
    from isaaclab_tpu.utils import math as math_utils

    for _ in range(400):
        pos, J = _planar_arm(q)
        yaw = (q[:, 0] + q[:, 1])[:, None]
        quat = math_utils.quat_from_angle_axis(
            yaw[:, 0], jnp.array([[0.0, 0.0, 1.0]])
        )
        q, qd = ctrl.compute(q, qd, pos, quat, J, command=cmd,
                             obstacles=obstacle)
        pos, _ = _planar_arm(q)
        gap = float(
            jnp.linalg.norm(pos[0, :2] - obstacle[0, :2]) - obstacle[0, 3]
        )
        min_gap = min(min_gap, gap)
    assert min_gap > -0.02, f"ee penetrated the obstacle: min gap {min_gap}"
    pos, _ = _planar_arm(q)
    err = float(jnp.linalg.norm(pos[0] - target[0]))
    assert err < 0.15, f"did not reach target around obstacle: {err}"


def test_rmp_flow_smoothed_filters_command():
    from isaaclab_tpu.controllers import (
        RmpFlowControllerCfg,
        RmpFlowSmoothedController,
    )

    ctrl = RmpFlowSmoothedController(
        RmpFlowControllerCfg(), num_envs=1, dt=0.02, alpha=0.25
    )
    cmd = jnp.concatenate(
        [jnp.array([[2.0, 0.0, 0.0]]), jnp.array([[1.0, 0.0, 0.0, 0.0]])],
        axis=-1,
    )
    out1 = ctrl.set_command(cmd)
    # first application moves only alpha of the way from the zero-init pose
    np.testing.assert_allclose(np.asarray(out1[0, 0]), 0.5, atol=1e-6)
    out2 = ctrl.set_command(cmd)
    assert float(out2[0, 0]) > float(out1[0, 0])
