"""Shadow-hand vision repose (reference
``direct/shadow_hand/shadow_hand_vision_env.py``,
``Isaac-Repose-Cube-Shadow-Vision-Direct-v0``): the in-hand cube-repose MDP
with a downward-looking camera whose image embedding is appended to both the
policy observation and the asymmetric critic state.

The reference trains a CNN online to regress cube keypoints
(feature_extractor.py) and feeds its 27-d embedding to the policy. Offline
TPU build: a frozen fixed-seed CNN over the rendered RGB+depth provides the
same-dimensional embedding (keypoint-supervised online training would need
the reference's checkpoint infrastructure; frozen random conv features are
the standard stand-in and keep the whole step jit-pure)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ....sensors import TiledCameraCfg, TiledCameraOffsetCfg
from ....utils.configclass import configclass
from .shadow_hand_env import (
    ShadowHandEnv,
    ShadowHandEnvCfg,
    ShadowHandSceneCfg,
)

EMBED_DIM = 27  # reference: vision CNN embedding size


@configclass
class ShadowHandVisionSceneCfg(ShadowHandSceneCfg):
    tiled_camera = TiledCameraCfg(
        offset=TiledCameraOffsetCfg(
            pos=(0.0, -0.35, 1.0), rot=(0.7071, 0.0, 0.7071, 0.0),
            convention="world",
        ),
        data_types=["rgb", "depth"],
        focal_length=24.0,
        horizontal_aperture=20.955,
        clipping_range=(0.1, 20.0),
        width=120,
        height=120,
    )


@configclass
class ShadowHandVisionEnvCfg(ShadowHandEnvCfg):
    """Reference ShadowHandVisionEnvCfg (shadow_hand_vision_env.py:32)."""

    asymmetric_obs: bool = True
    scene: ShadowHandVisionSceneCfg = ShadowHandVisionSceneCfg(
        num_envs=1225, env_spacing=2.0
    )


@configclass
class ShadowHandVisionEnvPlayCfg(ShadowHandVisionEnvCfg):
    """Reference ShadowHandVisionEnvPlayCfg: small eval scene."""

    scene: ShadowHandVisionSceneCfg = ShadowHandVisionSceneCfg(
        num_envs=64, env_spacing=2.0
    )


def _frozen_embed_params(C, seed=27):
    rng = np.random.RandomState(seed)
    shapes = [(8, 8, C, 16), (4, 4, 16, 32), (32, EMBED_DIM)]
    return [
        rng.normal(0.0, np.sqrt(2.0 / np.prod(s[:-1])), s).astype(np.float32)
        for s in shapes
    ]


class ShadowHandVisionEnv(ShadowHandEnv):
    cfg: ShadowHandVisionEnvCfg

    def __init__(self, cfg: ShadowHandVisionEnvCfg, **kwargs):
        super().__init__(cfg, **kwargs)
        self._embed_ws = _frozen_embed_params(C=4)
        self.num_observations += EMBED_DIM
        if self._asymmetric:
            self.num_states += EMBED_DIM

    def _vision_embedding(self, state):
        sensor = self.scene.sensors["tiled_camera"]
        data = sensor.data_view(state.scene.sensors["tiled_camera"])
        rgb = data.output["rgb"] / 255.0  # (E, H, W, 3)
        far = float(self.cfg.scene.tiled_camera.clipping_range[1])
        depth = data.output["depth"] / far  # (E, H, W, 1)
        x = jnp.concatenate([rgb, depth], axis=-1)
        w0, w1, w2 = self._embed_ws
        x = jax.nn.relu(
            jax.lax.conv_general_dilated(
                x, w0, window_strides=(4, 4), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        )
        x = jax.nn.relu(
            jax.lax.conv_general_dilated(
                x, w1, window_strides=(4, 4), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        )
        x = jnp.mean(x, axis=(1, 2))
        return x @ w2

    def _get_observations(self, state):
        obs = super()._get_observations(state)
        emb = self._vision_embedding(state)
        out = dict(obs)
        out["policy"] = jnp.concatenate([obs["policy"], emb], axis=-1)
        if "critic" in obs:
            out["critic"] = jnp.concatenate([obs["critic"], emb], axis=-1)
        return out
