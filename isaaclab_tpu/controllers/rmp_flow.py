"""RMP-flow motion-policy controller (reference ``controllers/rmp_flow.py``).

The reference wraps NVIDIA LULA's RmpFlow (closed-source C++) one robot at a
time through ``ArticulationMotionPolicy``; this build implements the RMP
algebra itself — task-space Riemannian motion policies (target attraction,
sphere-obstacle repulsion) pulled back through the kinematic Jacobian and
combined with configuration-space policies (joint-limit avoidance, damping)
— as pure batched jnp over the in-repo dynamics engine's Jacobians
(SURVEY.md §2.15 TPU note). Same public surface: ``num_actions == 7``
(position + wxyz quat command), ``set_command``/``compute`` producing joint
position and velocity targets, Euler roll-out with
``evaluations_per_frame`` substeps (reference rmp_flow.py:40,104).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils import math as math_utils
from ..utils.configclass import configclass


@configclass
class RmpFlowControllerCfg:
    """Reference ``RmpFlowControllerCfg`` (rmp_flow.py:26-42). The LULA
    config/urdf/collision file paths are replaced by gain knobs — the TPU
    build computes RMPs from its own model, no external config files."""

    name: str = "rmp_flow"  # "rmp_flow" | "rmp_flow_smoothed"
    frame_name: str = ""  # end-effector body name (resolved by the caller)
    evaluations_per_frame: int = 5  # Euler substeps per physics frame
    ignore_robot_state_updates: bool = False
    # --- RMP gains (defaults tuned for arm reach; LULA-config analogue) ---
    attract_kp: float = 60.0
    attract_kd: float = 18.0
    attract_metric: float = 1.0
    orient_kp: float = 30.0
    orient_kd: float = 10.0
    orient_metric: float = 0.3
    limit_kp: float = 50.0
    limit_margin: float = 0.1  # rad from the limit where avoidance kicks in
    damping: float = 4.0
    obstacle_kp: float = 80.0
    obstacle_margin: float = 0.15  # m standoff added to obstacle radius
    obstacle_metric_scale: float = 5.0


class RmpFlowController:
    """Batched RMP-flow (reference rmp_flow.py:45 RmpFlowController).

    Functional like the other repo controllers: the caller supplies the
    end-effector state and Jacobian each step; obstacles are an optional
    static (num_obstacles, 4) array of ``(x, y, z, radius)`` spheres.
    """

    def __init__(self, cfg: RmpFlowControllerCfg, num_envs: int, dt: float,
                 joint_limits=None):
        self.cfg = cfg
        self.num_envs = num_envs
        self.dt = dt
        # (nu, 2) lower/upper; None disables limit RMPs
        self.joint_limits = (
            None if joint_limits is None else jnp.asarray(joint_limits)
        )
        self._command = jnp.zeros((num_envs, self.num_actions))
        self._command = self._command.at[:, 3].set(1.0)

    @property
    def num_actions(self) -> int:
        """Reference rmp_flow.py:67 — ee position + wxyz quaternion."""
        return 7

    def reset_idx(self, robot_ids=None):
        """Reference rmp_flow.py:120 — the TPU policy is stateless; kept for
        API parity."""
        return None

    def set_command(self, command):
        """Store the (E, 7) target end-effector pose (rmp_flow.py:129)."""
        self._command = command
        return command

    # ------------------------------------------------------------------
    def compute(self, joint_pos, joint_vel, ee_pos, ee_quat, jacobian,
                command=None, obstacles=None):
        """One controller frame -> (dof_pos_target, dof_vel_target).

        Args:
            joint_pos/joint_vel: (E, nu) active-joint state.
            ee_pos/ee_quat: (E, 3)/(E, 4 wxyz) current end-effector pose.
            jacobian: (E, 6, nu) spatial Jacobian of the ee frame
                (linear rows 0:3, angular rows 3:6).
            command: optional (E, 7) pose target overriding ``set_command``.
            obstacles: optional (K, 4) or (E, K, 4) world spheres (xyz, r).

        Returns:
            (E, nu) joint position targets and (E, nu) velocity targets
            (reference rmp_flow.py:134 compute).
        """
        cmd = command if command is not None else self._command
        cfg = self.cfg
        q, qd = joint_pos, joint_vel
        sub_dt = self.dt / max(int(cfg.evaluations_per_frame), 1)

        for _ in range(max(int(cfg.evaluations_per_frame), 1)):
            qdd = self._rmp_accel(q, qd, ee_pos, ee_quat, jacobian, cmd,
                                  obstacles)
            # roll the internal world model forward (ee pose advanced with
            # the fixed Jacobian — exact in the small-substep limit, which
            # is what evaluations_per_frame controls)
            dq = qd * sub_dt
            ee_pos = ee_pos + jnp.einsum("eij,ej->ei", jacobian[:, 0:3], dq)
            w = jnp.einsum("eij,ej->ei", jacobian[:, 3:6], dq)
            ee_quat = math_utils.quat_mul(
                math_utils.quat_from_angle_axis(
                    jnp.linalg.norm(w, axis=-1) + 1e-12,
                    w / (jnp.linalg.norm(w, axis=-1, keepdims=True) + 1e-12),
                ),
                ee_quat,
            )
            q = q + qd * sub_dt
            qd = qd + qdd * sub_dt

        if self.joint_limits is not None:
            q = jnp.clip(q, self.joint_limits[:, 0], self.joint_limits[:, 1])
        return q, qd

    def _rmp_accel(self, q, qd, ee_pos, ee_quat, jacobian, cmd, obstacles):
        """Combine task + C-space RMPs: qdd = (sum J^T M J)^-1 sum J^T M a."""
        cfg = self.cfg
        E, nu = q.shape
        J_lin = jacobian[:, 0:3]
        J_ang = jacobian[:, 3:6]
        xd = jnp.einsum("eij,ej->ei", J_lin, qd)

        # metric-weighted pullback accumulators
        A = jnp.eye(nu)[None].repeat(E, axis=0) * 1e-3  # regularizer
        b = jnp.zeros((E, nu))

        # -- target attractor (soft-normalized spring-damper) --
        err = cmd[:, 0:3] - ee_pos
        dist = jnp.linalg.norm(err, axis=-1, keepdims=True)
        soft = err / (dist + 0.05)  # saturating direction field
        a_att = cfg.attract_kp * soft - cfg.attract_kd * xd
        M = cfg.attract_metric
        A = A + M * jnp.einsum("eij,eik->ejk", J_lin, J_lin)
        b = b + M * jnp.einsum("eij,ei->ej", J_lin, a_att)

        # -- orientation attractor --
        _, ang_err = math_utils.compute_pose_error(
            ee_pos, ee_quat, cmd[:, 0:3], cmd[:, 3:7],
            rot_error_type="axis_angle",
        )
        wd = jnp.einsum("eij,ej->ei", J_ang, qd)
        a_or = cfg.orient_kp * ang_err - cfg.orient_kd * wd
        A = A + cfg.orient_metric * jnp.einsum("eij,eik->ejk", J_ang, J_ang)
        b = b + cfg.orient_metric * jnp.einsum("eij,ei->ej", J_ang, a_or)

        # -- sphere obstacle repulsion (metric grows near the surface) --
        if obstacles is not None:
            obs = jnp.asarray(obstacles)
            if obs.ndim == 2:
                obs = obs[None].repeat(E, axis=0)
            delta = ee_pos[:, None, :] - obs[..., 0:3]  # (E, K, 3)
            d = jnp.linalg.norm(delta, axis=-1)  # (E, K)
            gap = d - obs[..., 3] - cfg.obstacle_margin
            n = delta / (d[..., None] + 1e-9)
            # barrier-style repulsion, active only inside the margin shell
            act = jnp.maximum(-gap, 0.0) + 0.02 * jnp.exp(-10.0 * gap)
            a_rep = cfg.obstacle_kp * act[..., None] * n  # (E, K, 3)
            w_rep = cfg.obstacle_metric_scale * act  # (E, K)
            a_sum = jnp.sum(a_rep * w_rep[..., None], axis=1)
            w_sum = jnp.sum(w_rep, axis=1)
            A = A + w_sum[:, None, None] * jnp.einsum(
                "eij,eik->ejk", J_lin, J_lin
            )
            b = b + jnp.einsum("eij,ei->ej", J_lin, a_sum)

        # -- C-space: joint-limit avoidance + damping (identity metric) --
        a_cs = -cfg.damping * qd
        if self.joint_limits is not None:
            lo = self.joint_limits[:, 0][None]
            hi = self.joint_limits[:, 1][None]
            m = cfg.limit_margin
            a_cs = a_cs + cfg.limit_kp * (
                jnp.maximum(lo + m - q, 0.0) / m
                - jnp.maximum(q - (hi - m), 0.0) / m
            )
        A = A + jnp.eye(nu)[None]
        b = b + a_cs

        return jnp.linalg.solve(A, b[..., None])[..., 0]


class RmpFlowSmoothedController(RmpFlowController):
    """Reference ``RmpFlowSmoothed`` variant: identical RMPs with a one-pole
    low-pass on the commanded target to avoid jerky retargeting."""

    def __init__(self, cfg, num_envs, dt, joint_limits=None, alpha=0.25):
        super().__init__(cfg, num_envs, dt, joint_limits)
        self.alpha = alpha

    def set_command(self, command):
        prev = self._command
        pos = prev[:, 0:3] + self.alpha * (command[:, 0:3] - prev[:, 0:3])
        # nlerp the quaternion toward the target
        sign = jnp.sign(
            jnp.sum(prev[:, 3:7] * command[:, 3:7], axis=-1, keepdims=True)
        )
        quat = prev[:, 3:7] + self.alpha * (
            sign * command[:, 3:7] - prev[:, 3:7]
        )
        quat = quat / (jnp.linalg.norm(quat, axis=-1, keepdims=True) + 1e-9)
        self._command = jnp.concatenate([pos, quat], axis=-1)
        return self._command
