"""Depth-camera cartpole (reference
``direct/cartpole/cartpole_camera_env.py``, Isaac-Cartpole-Depth-Camera-
Direct-v0): the policy observes a depth image of the pole instead of joint
state. The reference renders with RTX; here the ray-caster camera intersects
the cartpole's own geoms analytically (``RayCasterCfg.track_entities``)."""

from __future__ import annotations

import jax.numpy as jnp

from ....sensors import RayCasterCameraCfg, patterns
from ....utils.configclass import configclass
from .cartpole_env import (
    CartpoleDirectEnv,
    CartpoleDirectEnvCfg,
    CartpoleDirectSceneCfg,
)


def build_cartpole_visual_model():
    """Cartpole with collision/visual geoms so rays can hit it (the contact
    pipeline never fires: everything stays 1m+ above ground at rail height).
    Kept separate from the geom-free benchmark model."""
    import numpy as np

    from ....physics.model import (
        GEOM_BOX,
        GEOM_CAPSULE,
        JOINT_PRISMATIC,
        JOINT_REVOLUTE,
        ModelBuilder,
    )

    b = ModelBuilder("cartpole_visual")
    cart = b.add_body(
        "cart", -1, JOINT_PRISMATIC, jnt_axis=(1, 0, 0), mass=1.0,
        inertia=np.eye(3) * 0.1, jnt_name="slider_to_cart",
        limits=(-4.0, 4.0), effort_limit=400.0, velocity_limit=100.0,
    )
    b.add_geom(cart, GEOM_BOX, (0.12, 0.1, 0.1))
    pole = b.add_body(
        "pole", cart, JOINT_REVOLUTE, jnt_axis=(0, 1, 0), mass=1.0,
        com=(0, 0, 0.5), inertia=np.diag([0.0, 1.0 / 12.0, 0.0]),
        jnt_name="cart_to_pole", effort_limit=400.0, velocity_limit=100.0,
    )
    b.add_geom(pole, GEOM_CAPSULE, (0.04, 0.5), pos=(0, 0, 0.5))
    return b.build()


@configclass
class CartpoleDepthCameraSceneCfg(CartpoleDirectSceneCfg):
    robot = CartpoleDirectSceneCfg().robot.replace(
        model=build_cartpole_visual_model
    )
    # camera rides the cart 3 m in front (+y), optical axis looking back (-y)
    depth_camera = RayCasterCameraCfg(
        prim_path="robot/cart",
        offset=RayCasterCameraCfg().offset.replace(
            pos=(0.0, 3.0, 1.0), rot=(0.70710678, 0.0, 0.0, -0.70710678)
        ),
        pattern_cfg=patterns.PinholeCameraPatternCfg(height=40, width=40),
        max_distance=8.0,
        data_types=["distance_to_image_plane"],
        track_entities=["robot"],
    )


@configclass
class CartpoleDepthCameraDirectEnvCfg(CartpoleDirectEnvCfg):
    """Reference CartpoleDepthCameraEnvCfg."""

    scene: CartpoleDepthCameraSceneCfg = CartpoleDepthCameraSceneCfg(
        num_envs=1024, env_spacing=4.0
    )
    observation_space: int = 40 * 40

    def __post_init__(self):
        super().__post_init__()
        self.observation_space = (
            self.scene.depth_camera.pattern_cfg.height
            * self.scene.depth_camera.pattern_cfg.width
        )


class CartpoleDepthCameraDirectEnv(CartpoleDirectEnv):
    cfg: CartpoleDepthCameraDirectEnvCfg

    def _get_observations(self, state):
        sensor = self.scene.sensors["depth_camera"]
        data = sensor.data_view(state.scene.sensors["depth_camera"])
        depth = data.output["distance_to_image_plane"]  # (E, H, W, 1)
        # normalize like the reference (distance clipped to max, mean removed)
        depth = jnp.clip(depth, 0.0, self.cfg.scene.depth_camera.max_distance)
        depth = depth / self.cfg.scene.depth_camera.max_distance
        flat = depth.reshape(depth.shape[0], -1)
        return {"policy": flat - jnp.mean(flat, axis=-1, keepdims=True)}


# ---------------------------------------------------------------------------
# RGB tiled-camera variant (reference direct/cartpole/cartpole_camera_env.py
# CartpoleRGBCameraEnvCfg, Isaac-Cartpole-RGB-Camera-Direct-v0)
# ---------------------------------------------------------------------------

from ....sensors import TiledCameraCfg, TiledCameraOffsetCfg  # noqa: E402


@configclass
class CartpoleRGBCameraSceneCfg(CartpoleDirectSceneCfg):
    tiled_camera = TiledCameraCfg(
        offset=TiledCameraOffsetCfg(
            pos=(-5.0, 0.0, 2.0), rot=(1.0, 0.0, 0.0, 0.0), convention="world"
        ),
        data_types=["rgb"],
        focal_length=24.0,
        horizontal_aperture=20.955,
        clipping_range=(0.1, 20.0),
        width=100,
        height=100,
    )


@configclass
class CartpoleRGBCameraDirectEnvCfg(CartpoleDirectEnvCfg):
    """Reference CartpoleRGBCameraEnvCfg (cartpole_camera_env.py:25)."""

    scene: CartpoleRGBCameraSceneCfg = CartpoleRGBCameraSceneCfg(
        num_envs=1024, env_spacing=20.0
    )
    observation_space: int = 100 * 100 * 3

    def __post_init__(self):
        super().__post_init__()
        cam = self.scene.tiled_camera
        self.observation_space = cam.height * cam.width * 3


class CartpoleRGBCameraDirectEnv(CartpoleDirectEnv):
    cfg: CartpoleRGBCameraDirectEnvCfg

    def _camera_obs(self, state):
        sensor = self.scene.sensors["tiled_camera"]
        data = sensor.data_view(state.scene.sensors["tiled_camera"])
        rgb = data.output["rgb"] / 255.0
        rgb = rgb - jnp.mean(rgb, axis=(1, 2), keepdims=True)
        return rgb

    def _get_observations(self, state):
        rgb = self._camera_obs(state)
        return {"policy": rgb.reshape(rgb.shape[0], -1)}
