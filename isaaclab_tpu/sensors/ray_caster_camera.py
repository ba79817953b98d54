"""Ray-caster camera (reference ``sensors/ray_caster/ray_caster_camera.py``).

Depth/distance imaging without a renderer: a pinhole ray fan cast against the
terrain height field. Serves the reference's depth-camera observation path on
TPU (RTX cameras are out of scope, SURVEY.md §2.6).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils import math as math_utils
from ..utils.configclass import configclass
from .patterns import PinholeCameraPatternCfg
from .ray_caster import RayCaster, RayCasterCfg, RayCasterState


@configclass
class RayCasterCameraCfg(RayCasterCfg):
    class_type: type = None
    data_types: list = ["distance_to_image_plane"]

    def __post_init__(self):
        self.class_type = RayCasterCamera
        if self.pattern_cfg is None:
            self.pattern_cfg = PinholeCameraPatternCfg()


class RayCasterCameraData:
    def __init__(self, output: dict, pos_w, quat_w):
        self.output = output
        self.pos_w = pos_w
        self.quat_w = quat_w


class RayCasterCamera(RayCaster):
    """Adds image-shaped depth outputs on top of the ray caster."""

    @property
    def image_shape(self):
        p = self.cfg.pattern_cfg
        return (p.height, p.width)

    def data_view(self, state: RayCasterState):
        h, w = self.image_shape
        E = state.ray_hits_w.shape[0]
        output = {"ray_hits_w": state.ray_hits_w.reshape(E, h, w, 3)}
        dist = state.ray_distances.reshape(E, h, w)
        if "distance_to_camera" in self.cfg.data_types:
            output["distance_to_camera"] = dist[..., None]
        if "distance_to_image_plane" in self.cfg.data_types:
            # project euclidean distance onto the camera forward axis (+x of
            # the sensor frame — the pattern's optical axis)
            fwd = math_utils.quat_apply(
                state.quat_w, jnp.array([1.0, 0.0, 0.0])
            )
            rel = state.ray_hits_w - state.pos_w[:, None, :]
            depth = jnp.einsum("enk,ek->en", rel, fwd).reshape(E, h, w)
            output["distance_to_image_plane"] = depth[..., None]
        return RayCasterCameraData(output, state.pos_w, state.quat_w)


RayCasterCameraCfg.class_type = RayCasterCamera
