"""VisualizationMarkers semantics + offline export (reference
``markers/visualization_markers.py:217`` visualize() contract)."""

import os

import numpy as np
import pytest

from isaaclab_tpu.markers import (
    ArrowMarkerCfg,
    SphereMarkerCfg,
    VisualizationMarkers,
    VisualizationMarkersCfg,
)


@pytest.fixture()
def markers():
    return VisualizationMarkers(
        VisualizationMarkersCfg(
            prim_path="/Visuals/test",
            markers={
                "sphere": SphereMarkerCfg(radius=0.1, color=(1, 0, 0)),
                "arrow": ArrowMarkerCfg(scale=(1, 1, 1), color=(0, 1, 0)),
            },
        )
    )


def test_partial_updates_keep_previous(markers):
    t = np.random.randn(5, 3).astype(np.float32)
    markers.visualize(translations=t)
    assert markers.count == 5
    # orientations defaulted to identity
    np.testing.assert_allclose(
        markers.frames[-1]["orientations"][:, 0], 1.0
    )
    # updating only scales keeps translations
    markers.visualize(scales=np.full((5, 3), 2.0))
    np.testing.assert_allclose(markers.frames[-1]["translations"], t)
    np.testing.assert_allclose(markers.frames[-1]["scales"], 2.0)


def test_dynamic_count_and_prototype_indices(markers):
    markers.visualize(translations=np.zeros((4, 3)),
                      marker_indices=np.array([0, 1, 0, 1]))
    assert markers.count == 4
    markers.visualize(translations=np.zeros((2, 3)))
    assert markers.count == 2  # dynamic shrink (reference behavior)
    assert markers.num_prototypes == 2
    with pytest.raises(ValueError):
        markers.visualize(translations=np.zeros((2, 3)),
                          marker_indices=np.array([0, 5]))
    with pytest.raises(ValueError):
        markers.visualize()


def test_mismatched_counts_raise(markers):
    with pytest.raises(ValueError):
        markers.visualize(translations=np.zeros((3, 3)),
                          scales=np.ones((4, 3)))


def test_visibility_gates_updates(markers):
    markers.visualize(translations=np.zeros((3, 3)))
    markers.set_visibility(False)
    assert not markers.is_visible()
    markers.visualize(translations=np.ones((7, 3)))  # dropped
    assert markers.count == 3


def test_obj_export_contains_instances(markers, tmp_path):
    markers.visualize(
        translations=np.array([[0.0, 0.0, 0.0], [1.0, 2.0, 3.0]]),
        marker_indices=np.array([0, 1]),
    )
    v, t, c = markers.instanced_mesh()
    assert len(v) > 0 and len(t) > 0 and len(c) == len(v)
    # second instance's vertices sit near its translation
    path = os.path.join(tmp_path, "markers.obj")
    markers.save_obj(path)
    lines = open(path).read().splitlines()
    n_v = sum(1 for l in lines if l.startswith("v "))
    n_f = sum(1 for l in lines if l.startswith("f "))
    assert n_v == len(v) and n_f == len(t)
    markers.save_npz(os.path.join(tmp_path, "markers.npz"))
    z = np.load(os.path.join(tmp_path, "markers.npz"))
    assert any(k.startswith("translations") for k in z.files)


def test_config_presets_build():
    from isaaclab_tpu.markers import config as marker_cfgs

    for name in marker_cfgs.__all__:
        obj = getattr(marker_cfgs, name)
        if isinstance(obj, VisualizationMarkersCfg):
            m = VisualizationMarkers(obj)
            assert m.num_prototypes >= 1
