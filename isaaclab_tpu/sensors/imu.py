"""IMU sensor (reference ``sensors/imu/imu.py``).

Pose/angular velocity from FK; linear acceleration by finite-differencing
velocities plus gravity bias, offset-frame corrected (reference imu.py:141-171).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..utils import math as math_utils
from ..utils.configclass import configclass
from .sensor_base import SensorBase, SensorBaseCfg, parse_entity_from_prim_path


@configclass
class ImuOffsetCfg:
    pos: tuple = (0.0, 0.0, 0.0)
    rot: tuple = (1.0, 0.0, 0.0, 0.0)


@configclass
class ImuCfg(SensorBaseCfg):
    class_type: type = None
    offset: ImuOffsetCfg = ImuOffsetCfg()
    gravity_bias: tuple = (0.0, 0.0, 9.81)

    def __post_init__(self):
        if self.class_type is None:
            self.class_type = Imu


class ImuState(NamedTuple):
    pos_w: jnp.ndarray  # (E, 3)
    quat_w: jnp.ndarray  # (E, 4)
    lin_vel_b: jnp.ndarray
    ang_vel_b: jnp.ndarray
    lin_acc_b: jnp.ndarray
    ang_acc_b: jnp.ndarray
    prev_lin_vel_w: jnp.ndarray
    prev_ang_vel_w: jnp.ndarray


class ImuData:
    def __init__(self, state: ImuState):
        self.pos_w = state.pos_w
        self.quat_w = state.quat_w
        self.lin_vel_b = state.lin_vel_b
        self.ang_vel_b = state.ang_vel_b
        self.lin_acc_b = state.lin_acc_b
        self.ang_acc_b = state.ang_acc_b


class Imu(SensorBase):
    def __init__(self, cfg: ImuCfg, scene):
        super().__init__(cfg, scene)
        entity_name, body_regex = parse_entity_from_prim_path(cfg.prim_path, scene)
        self.entity = scene[entity_name]
        if body_regex and body_regex != ".*":
            ids, _ = self.entity.find_bodies(body_regex)
            self.body_id = int(ids[0])
        else:
            self.body_id = 0
        self._world_body = self.body_id + self.entity.slice.body_start

    def init_state(self, num_envs: int) -> ImuState:
        z3 = jnp.zeros((num_envs, 3))
        quat = jnp.tile(jnp.array([1.0, 0, 0, 0]), (num_envs, 1))
        return ImuState(z3, quat, z3, z3, z3, z3, z3, z3)

    def update(self, state, scene_state, dt: float) -> ImuState:
        if state is None:
            state = self.init_state(scene_state.phys.q.shape[0])
        from ..physics.kinematics import body_velocities_world

        kin = self._scene.kinematics(scene_state)
        wm = self._scene.world_model
        import jax

        vels = jax.vmap(lambda k, v: body_velocities_world(wm, k, v))(
            kin, scene_state.phys.qd
        )
        b = self._world_body
        pos_w = kin.body_pos_w[:, b]
        quat_w = kin.body_quat_w[:, b]
        off_pos = jnp.asarray(self.cfg.offset.pos)
        off_quat = jnp.asarray(self.cfg.offset.rot)
        ang_w = vels[:, b, 0:3]
        lin_w = vels[:, b, 3:6]
        # offset point velocity: v + w x r
        r_w = math_utils.quat_apply(quat_w, off_pos[None])
        lin_w = lin_w + jnp.cross(ang_w, r_w)
        pos_w, quat_w = math_utils.combine_frame_transforms(
            pos_w, quat_w, off_pos[None], off_quat[None]
        )
        lin_acc_w = (lin_w - state.prev_lin_vel_w) / dt + jnp.asarray(
            self.cfg.gravity_bias
        )
        ang_acc_w = (ang_w - state.prev_ang_vel_w) / dt
        return ImuState(
            pos_w=pos_w,
            quat_w=quat_w,
            lin_vel_b=math_utils.quat_apply_inverse(quat_w, lin_w),
            ang_vel_b=math_utils.quat_apply_inverse(quat_w, ang_w),
            lin_acc_b=math_utils.quat_apply_inverse(quat_w, lin_acc_w),
            ang_acc_b=math_utils.quat_apply_inverse(quat_w, ang_acc_w),
            prev_lin_vel_w=lin_w,
            prev_ang_vel_w=ang_w,
        )

    def reset(self, state, env_mask, key=None):
        if state is None:
            return state
        m = env_mask[:, None]
        return state._replace(
            prev_lin_vel_w=jnp.where(m, 0.0, state.prev_lin_vel_w),
            prev_ang_vel_w=jnp.where(m, 0.0, state.prev_ang_vel_w),
        )

    def data_view(self, state):
        return ImuData(state)


ImuCfg.class_type = Imu
