"""Observation terms (reference ``envs/mdp/observations.py:33-529``).

Same names/semantics as the reference library; all pure functions of the env
context. ``asset_cfg.joint_ids`` are static index arrays resolved at build.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...managers import SceneEntityCfg
from ...utils import math as math_utils

_DEFAULT = SceneEntityCfg("robot")


def _sel(x, ids):
    if isinstance(ids, slice):
        return x[:, ids]
    return x[:, jnp.asarray(ids)]


# -- root state --


def base_pos_z(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    return env.scene[asset_cfg.name].data.root_pos_w[:, 2:3]


def base_lin_vel(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    return env.scene[asset_cfg.name].data.root_lin_vel_b


def base_ang_vel(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    return env.scene[asset_cfg.name].data.root_ang_vel_b


def projected_gravity(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    return env.scene[asset_cfg.name].data.projected_gravity_b


def root_pos_w(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    return env.scene[asset_cfg.name].data.root_pos_w


def root_quat_w(env, make_quat_unique: bool = False, asset_cfg: SceneEntityCfg = _DEFAULT):
    quat = env.scene[asset_cfg.name].data.root_quat_w
    return math_utils.quat_unique(quat) if make_quat_unique else quat


def root_lin_vel_w(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    return env.scene[asset_cfg.name].data.root_lin_vel_w


def root_ang_vel_w(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    return env.scene[asset_cfg.name].data.root_ang_vel_w


# -- joint state --


def joint_pos(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    return _sel(env.scene[asset_cfg.name].data.joint_pos, asset_cfg.joint_ids)


def joint_pos_rel(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    data = env.scene[asset_cfg.name].data
    return _sel(data.joint_pos - data.default_joint_pos, asset_cfg.joint_ids)


def joint_pos_limit_normalized(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    data = env.scene[asset_cfg.name].data
    lim = data.soft_joint_pos_limits
    scaled = math_utils.scale_transform(data.joint_pos, lim[..., 0], lim[..., 1])
    return _sel(scaled, asset_cfg.joint_ids)


def joint_vel(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    return _sel(env.scene[asset_cfg.name].data.joint_vel, asset_cfg.joint_ids)


def joint_vel_rel(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    data = env.scene[asset_cfg.name].data
    return _sel(data.joint_vel - data.default_joint_vel, asset_cfg.joint_ids)


def joint_effort(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    return _sel(env.scene[asset_cfg.name].data.applied_torque, asset_cfg.joint_ids)


# -- sensors --


def height_scan(env, sensor_cfg: SceneEntityCfg, offset: float = 0.5):
    """Height-scanner reading: sensor z minus ray hit z minus offset
    (reference observations.py:165)."""
    sensor = env.scene[sensor_cfg.name]
    data = sensor.data
    return data.pos_w[:, 2:3] - data.ray_hits_w[..., 2] - offset


def body_incoming_wrench(env, asset_cfg: SceneEntityCfg):
    """External wrenches on selected bodies (reference observations.py)."""
    est_fext = env.state.scene.phys.f_ext_w
    entity = env.scene[asset_cfg.name]
    ids = jnp.asarray(asset_cfg.body_ids) + entity.slice.body_start
    return est_fext[:, ids].reshape(est_fext.shape[0], -1)


def imu_orientation(env, asset_cfg: SceneEntityCfg):
    return env.scene[asset_cfg.name].data.quat_w


def imu_ang_vel(env, asset_cfg: SceneEntityCfg):
    return env.scene[asset_cfg.name].data.ang_vel_b


def imu_lin_acc(env, asset_cfg: SceneEntityCfg):
    return env.scene[asset_cfg.name].data.lin_acc_b


def lidar_obs(env, sensor_cfg: SceneEntityCfg, max_distance: float = 10.0):
    """Normalized lidar ranges (fork's UAV tasks consume Bpearl ranges)."""
    data = env.scene[sensor_cfg.name].data
    dist = jnp.linalg.norm(data.ray_hits_w - data.pos_w[:, None, :], axis=-1)
    return jnp.clip(dist, 0.0, max_distance) / max_distance


# -- actions & commands --


def last_action(env, action_name: str = None):
    return env.action_manager.action


def generated_commands(env, command_name: str):
    return env.command_manager.get_command(command_name)


def velocity_commands(env, command_name: str = "base_velocity"):
    return env.command_manager.get_command(command_name)


# -- classic-locomotion observations (reference classic/humanoid/mdp/observations.py) --


def base_yaw_roll(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    """(yaw, roll) of the base (reference humanoid mdp)."""
    quat = env.scene[asset_cfg.name].data.root_quat_w
    roll, _, yaw = math_utils.euler_xyz_from_quat(quat)
    return jnp.stack([yaw, roll], axis=-1)


def base_up_proj(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    """Projection of the base up-vector on world z."""
    g = env.scene[asset_cfg.name].data.projected_gravity_b
    return -g[:, 2:3]


def base_heading_proj(env, target_pos: tuple, asset_cfg: SceneEntityCfg = _DEFAULT):
    """Alignment of base forward axis with the to-target direction."""
    data = env.scene[asset_cfg.name].data
    to_target = jnp.asarray(target_pos)[None, :2] - data.root_pos_w[:, :2]
    to_target = to_target / jnp.maximum(
        jnp.linalg.norm(to_target, axis=-1, keepdims=True), 1e-9
    )
    fwd = math_utils.quat_apply(data.root_quat_w, jnp.array([1.0, 0.0, 0.0]))
    return jnp.sum(fwd[:, :2] * to_target, axis=-1, keepdims=True)


def base_angle_to_target(env, target_pos: tuple, asset_cfg: SceneEntityCfg = _DEFAULT):
    """Yaw error toward a world target."""
    data = env.scene[asset_cfg.name].data
    to_target = jnp.asarray(target_pos)[None, :2] - data.root_pos_w[:, :2]
    target_yaw = jnp.arctan2(to_target[:, 1], to_target[:, 0])
    _, _, yaw = math_utils.euler_xyz_from_quat(data.root_quat_w)
    return math_utils.wrap_to_pi(target_yaw - yaw)[:, None]


def object_position_in_robot_root_frame(
    env,
    robot_cfg: SceneEntityCfg = _DEFAULT,
    object_cfg: SceneEntityCfg = SceneEntityCfg("object"),
):
    """Object position in the robot base frame (reference lift mdp)."""
    robot = env.scene[robot_cfg.name].data
    obj = env.scene[object_cfg.name].data
    pos_b, _ = math_utils.subtract_frame_transforms(
        robot.root_pos_w, robot.root_quat_w, obj.root_pos_w
    )
    return pos_b


# -- camera images (reference observations.py:234-529) --


def image(
    env,
    sensor_cfg: SceneEntityCfg = SceneEntityCfg("tiled_camera"),
    data_type: str = "rgb",
    convert_perspective_to_orthogonal: bool = False,
    normalize: bool = True,
):
    """Camera image observation (reference observations.py:image:234).

    rgb is normalized to [0,1] minus the per-image mean; depth types replace
    far-clip misses with zero — same post-processing as the reference.
    """
    sensor = env.scene[sensor_cfg.name]
    images = sensor.data.output[data_type]
    if normalize:
        if data_type == "rgb":
            images = images / 255.0
            images = images - jnp.mean(images, axis=(1, 2), keepdims=True)
        elif "distance_to" in data_type or "depth" in data_type:
            far = float(sensor.cfg.clipping_range[1])
            images = jnp.where(images >= far, 0.0, images)
    return images.reshape(images.shape[0], -1)


# Frozen feature extractors (reference observations.py:image_features with
# pretrained ResNet18 / Theia-Tiny downloads). ResNet models run the EXACT
# torchvision inference graph (vision_backbones.py) — with a converted
# checkpoint (tools/convert_vision_weights.py) the features match torch to
# f32 tolerance; without one (this build env has zero egress) the same
# architecture runs deterministic He-init weights. Theia remains a
# fixed-seed stand-in (transformer weights unavailable offline).
_FEATURE_EXTRACTORS: dict = {}


def _frozen_cnn_params(key_shapes, seed):
    # host-side numpy constants: building jnp arrays here would capture live
    # tracers when the extractor is first built inside a jit/eval_shape trace
    import numpy as np

    rng = np.random.RandomState(seed)
    return [
        rng.normal(0.0, np.sqrt(2.0 / np.prod(shp[:-1])), shp).astype(np.float32)
        for shp in key_shapes
    ]


def _get_feature_extractor(model_name: str, H: int, W: int, C: int):
    key = (model_name, H, W, C)
    if key in _FEATURE_EXTRACTORS:
        return _FEATURE_EXTRACTORS[key]
    import jax.lax as lax

    if "resnet" in model_name:
        # exact torchvision graph; 1000-dim logits like the reference's
        # full-model forward (observations.py:501 `model(image_proc)`)
        from .vision_backbones import load_backbone

        apply_fn, out_dim, _pretrained = load_backbone(model_name)

        def extract(x):  # (E, H, W, C) float in [0, 1]
            if x.shape[-1] == 1:  # depth camera variants: replicate to rgb
                x = jnp.repeat(x, 3, axis=-1)
            return apply_fn(x)

    else:  # theia-style: patch embedding + token mixing
        out_dim = 192
        P = 10
        ws = _frozen_cnn_params(
            [(P, P, C, out_dim), (out_dim, out_dim), (out_dim, out_dim)],
            seed=224,
        )

        def extract(x):
            x = lax.conv_general_dilated(
                x, ws[0], window_strides=(P, P), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )  # (E, h, w, D) patch tokens
            E = x.shape[0]
            x = x.reshape(E, -1, out_dim)
            x = jax.nn.gelu(x @ ws[1]) + x
            x = jnp.mean(x, axis=1)  # token pool
            return jax.nn.gelu(x @ ws[2])

    _FEATURE_EXTRACTORS[key] = (extract, out_dim)
    return _FEATURE_EXTRACTORS[key]


def image_features(
    env,
    sensor_cfg: SceneEntityCfg = SceneEntityCfg("tiled_camera"),
    data_type: str = "rgb",
    model_name: str = "resnet18",
    **kwargs,
):
    """Frozen-vision-backbone features of a camera image (reference
    observations.py:image with ResNet18/TheiaTiny extraction)."""
    sensor = env.scene[sensor_cfg.name]
    images = sensor.data.output[data_type] / 255.0
    E, H, W, C = images.shape
    extract, _ = _get_feature_extractor(model_name, H, W, C)
    return extract(images)
