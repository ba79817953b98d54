"""Marker preset configurations (reference ``markers/config/__init__.py``):
the same named presets, built on the headless prototype shape cfgs."""

from .visualization_markers import (
    ArrowMarkerCfg,
    CuboidMarkerCfg,
    CylinderMarkerCfg,
    FrameMarkerCfg,
    SphereMarkerCfg,
    VisualizationMarkersCfg,
)

RAY_CASTER_MARKER_CFG = VisualizationMarkersCfg(
    prim_path="/Visuals/RayCaster",
    markers={"hit": SphereMarkerCfg(radius=0.02, color=(1.0, 0.0, 0.0))},
)

CONTACT_SENSOR_MARKER_CFG = VisualizationMarkersCfg(
    prim_path="/Visuals/ContactSensor",
    markers={
        "contact": SphereMarkerCfg(radius=0.02, color=(1.0, 0.0, 0.0)),
        "no_contact": SphereMarkerCfg(radius=0.02, color=(0.0, 1.0, 0.0)),
    },
)

DEFORMABLE_TARGET_MARKER_CFG = VisualizationMarkersCfg(
    prim_path="/Visuals/DeformableTarget",
    markers={"target": SphereMarkerCfg(radius=0.02, color=(1.0, 0.5, 0.0))},
)

FRAME_MARKER_CFG = VisualizationMarkersCfg(
    prim_path="/Visuals/FrameMarker",
    markers={"frame": FrameMarkerCfg(scale=(0.5, 0.5, 0.5))},
)

RED_ARROW_X_MARKER_CFG = VisualizationMarkersCfg(
    prim_path="/Visuals/Arrow",
    markers={"arrow": ArrowMarkerCfg(scale=(1.0, 0.5, 0.5),
                                     color=(1.0, 0.0, 0.0))},
)

BLUE_ARROW_X_MARKER_CFG = VisualizationMarkersCfg(
    prim_path="/Visuals/Arrow",
    markers={"arrow": ArrowMarkerCfg(scale=(1.0, 0.5, 0.5),
                                     color=(0.0, 0.0, 1.0))},
)

GREEN_ARROW_X_MARKER_CFG = VisualizationMarkersCfg(
    prim_path="/Visuals/Arrow",
    markers={"arrow": ArrowMarkerCfg(scale=(1.0, 0.5, 0.5),
                                     color=(0.0, 1.0, 0.0))},
)

CUBOID_MARKER_CFG = VisualizationMarkersCfg(
    prim_path="/Visuals/Cuboid",
    markers={"cuboid": CuboidMarkerCfg(size=(0.1, 0.1, 0.1),
                                       color=(1.0, 0.0, 0.0))},
)

POSITION_GOAL_MARKER_CFG = VisualizationMarkersCfg(
    prim_path="/Visuals/PositionGoal",
    markers={
        "target_far": SphereMarkerCfg(radius=0.01, color=(1.0, 0.0, 0.0)),
        "target_near": SphereMarkerCfg(radius=0.01, color=(0.0, 1.0, 0.0)),
        "target_invisible": SphereMarkerCfg(
            radius=0.01, color=(0.5, 0.5, 0.5)
        ),
    },
)

__all__ = [
    "RAY_CASTER_MARKER_CFG",
    "CONTACT_SENSOR_MARKER_CFG",
    "DEFORMABLE_TARGET_MARKER_CFG",
    "FRAME_MARKER_CFG",
    "RED_ARROW_X_MARKER_CFG",
    "BLUE_ARROW_X_MARKER_CFG",
    "GREEN_ARROW_X_MARKER_CFG",
    "CUBOID_MARKER_CFG",
    "POSITION_GOAL_MARKER_CFG",
    "CylinderMarkerCfg",
]
