"""Camera cartpole variants (reference
``manager_based/classic/cartpole/cartpole_camera_env_cfg.py``): the cartpole
MDP observed through RGB / depth images or frozen-backbone features, rendered
by the batched TPU ray tracer (sensors/tiled_camera.py)."""

from isaaclab_tpu.managers import (
    ObservationGroupCfg as ObsGroup,
    ObservationTermCfg as ObsTerm,
    SceneEntityCfg,
)
from isaaclab_tpu.sensors import TiledCameraCfg, TiledCameraOffsetCfg
from isaaclab_tpu.utils import configclass

from isaaclab_tpu.envs import mdp

from .cartpole_env_cfg import CartpoleEnvCfg, CartpoleSceneCfg

_CAMERA = dict(
    offset=TiledCameraOffsetCfg(
        pos=(-7.0, 0.0, 3.0), rot=(0.9945, 0.0, 0.1045, 0.0),
        convention="world",
    ),
    focal_length=24.0,
    horizontal_aperture=20.955,
    clipping_range=(0.1, 20.0),
    width=100,
    height=100,
)


@configclass
class CartpoleRGBCameraSceneCfg(CartpoleSceneCfg):
    tiled_camera = TiledCameraCfg(data_types=["rgb"], **_CAMERA)


@configclass
class CartpoleDepthCameraSceneCfg(CartpoleSceneCfg):
    tiled_camera = TiledCameraCfg(data_types=["distance_to_camera"], **_CAMERA)


@configclass
class RGBObservationsCfg:
    @configclass
    class RGBCameraPolicyCfg(ObsGroup):
        image = ObsTerm(
            func=mdp.image,
            params={"sensor_cfg": SceneEntityCfg("tiled_camera"), "data_type": "rgb"},
        )

        def __post_init__(self):
            self.enable_corruption = False
            self.concatenate_terms = True

    policy: ObsGroup = RGBCameraPolicyCfg()


@configclass
class DepthObservationsCfg:
    @configclass
    class DepthCameraPolicyCfg(ObsGroup):
        image = ObsTerm(
            func=mdp.image,
            params={
                "sensor_cfg": SceneEntityCfg("tiled_camera"),
                "data_type": "distance_to_camera",
            },
        )

    policy: ObsGroup = DepthCameraPolicyCfg()


@configclass
class ResNet18ObservationCfg:
    @configclass
    class ResNet18FeaturesCameraPolicyCfg(ObsGroup):
        image = ObsTerm(
            func=mdp.image_features,
            params={
                "sensor_cfg": SceneEntityCfg("tiled_camera"),
                "data_type": "rgb",
                "model_name": "resnet18",
            },
        )

    policy: ObsGroup = ResNet18FeaturesCameraPolicyCfg()


@configclass
class TheiaTinyObservationCfg:
    @configclass
    class TheiaTinyFeaturesCameraPolicyCfg(ObsGroup):
        image = ObsTerm(
            func=mdp.image_features,
            params={
                "sensor_cfg": SceneEntityCfg("tiled_camera"),
                "data_type": "rgb",
                "model_name": "theia-tiny-patch16-224-cddsv",
            },
        )

    policy: ObsGroup = TheiaTinyFeaturesCameraPolicyCfg()


@configclass
class CartpoleRGBCameraEnvCfg(CartpoleEnvCfg):
    """Reference ``CartpoleRGBCameraEnvCfg``."""

    scene: CartpoleRGBCameraSceneCfg = CartpoleRGBCameraSceneCfg(
        num_envs=512, env_spacing=20.0
    )
    observations: RGBObservationsCfg = RGBObservationsCfg()


@configclass
class CartpoleDepthCameraEnvCfg(CartpoleEnvCfg):
    """Reference ``CartpoleDepthCameraEnvCfg``."""

    scene: CartpoleDepthCameraSceneCfg = CartpoleDepthCameraSceneCfg(
        num_envs=512, env_spacing=20.0
    )
    observations: DepthObservationsCfg = DepthObservationsCfg()


@configclass
class CartpoleResNet18CameraEnvCfg(CartpoleRGBCameraEnvCfg):
    """Reference ``CartpoleResNet18CameraEnvCfg``."""

    observations: ResNet18ObservationCfg = ResNet18ObservationCfg()


@configclass
class CartpoleTheiaTinyCameraEnvCfg(CartpoleRGBCameraEnvCfg):
    """Reference ``CartpoleTheiaTinyCameraEnvCfg``."""

    observations: TheiaTinyObservationCfg = TheiaTinyObservationCfg()
