"""Mimic datagen end-to-end (reference ``source/isaaclab_mimic/test/
test_generate_dataset.py``: annotate demos -> generate -> consume).

Covers the full data path without an env in the loop (env-state restore for
replay is covered by tests/test_reset_to.py): a synthetic recorded episode
with subtask signals goes through the annotate script, the DataGenInfoPool,
segment-transform generation against a NEW object pose, and the BC trainer
consumes the generated HDF5. The object-relative invariant — the generated
eef segment keeps the same pose relative to the new object as the source
segment had to the source object — is asserted exactly.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pose(pos, yaw=0.0):
    T = np.eye(4)
    c, s = np.cos(yaw), np.sin(yaw)
    T[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    T[:3, 3] = pos
    return T


def _synth_demo(obj_pose, T=30, k=12):
    """Straight-line reach to the object then lift; signal flips at t=k."""
    eef = np.zeros((T, 4, 4))
    start = _pose([0.3, 0.0, 0.4])
    grasp = obj_pose @ _pose([0.0, 0.0, 0.02])
    lift = obj_pose @ _pose([0.0, 0.0, 0.22])
    for t in range(T):
        if t < k:
            a = t / max(k - 1, 1)
            eef[t] = start * (1 - a) + grasp * a  # linear blend is fine here
        else:
            a = (t - k) / max(T - k - 1, 1)
            eef[t] = grasp * (1 - a) + lift * a
    signals = np.zeros((T, 1), np.float32)
    signals[k:] = 1.0
    grip = np.concatenate([np.zeros(k), np.ones(T - k)]).astype(np.float32)
    return eef, signals, grip


@pytest.fixture()
def annotated_dataset(tmp_path):
    from isaaclab_tpu.utils.datasets import HDF5DatasetFileHandler

    src_obj = _pose([0.5, 0.1, 0.02], yaw=0.3)
    eef, signals, grip = _synth_demo(src_obj)
    raw = str(tmp_path / "raw.hdf5")
    h = HDF5DatasetFileHandler()
    h.open_or_create(raw)
    h.write_episode(
        "demo_0",
        {
            "obs/policy/eef_pos": eef.reshape(len(eef), -1),
            "obs/subtask_terms/grasp": signals,
            "actions": grip[:, None],
            "datagen_info/object_pose_cube": src_obj[None].repeat(len(eef), 0).reshape(len(eef), -1),
        },
        success=True,
    )
    h.flush(); h.close()

    annotated = str(tmp_path / "annotated.hdf5")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/imitation_learning/annotate_demos.py"),
         "--input_file", raw, "--output_file", annotated],
        capture_output=True, text=True, timeout=240,
    )
    assert out.returncode == 0, out.stderr
    assert "annotated 1 episodes" in out.stdout
    return annotated, src_obj, eef, grip


def test_annotate_derives_boundaries(annotated_dataset):
    from isaaclab_tpu.utils.datasets import HDF5DatasetFileHandler

    annotated, _, _, _ = annotated_dataset
    h = HDF5DatasetFileHandler(); h.open_or_create(annotated)
    ep = h.load_episode("demo_0")
    # signal flips at t=12 in the synthetic demo
    assert int(np.asarray(ep["datagen_info/subtask_term_grasp"])[0]) == 12


def test_generate_preserves_object_relative_segment(annotated_dataset):
    from isaaclab_tpu.mimic import DataGenerator, DataGenInfoPool
    from isaaclab_tpu.mimic.mimic_env import SubTaskConfig

    annotated, src_obj, eef, grip = annotated_dataset
    pool = DataGenInfoPool()
    pool.add_from_episode(
        eef_poses=eef,
        object_poses={"cube": src_obj},
        subtask_boundaries=[(0, 12), (12, len(eef))],
        gripper_actions=grip,
    )
    gen = DataGenerator(src_demo_datagen_info_pool=pool, noise_scale=0.0)
    new_obj = _pose([0.62, -0.05, 0.02], yaw=-0.5)
    subtasks = [
        SubTaskConfig(object_ref="cube", num_interpolation_steps=0),
        SubTaskConfig(object_ref="cube", num_interpolation_steps=0),
    ]
    traj, grips = gen.generate_trajectory(
        subtasks, {"cube": new_obj}, current_eef_pose=None
    )
    assert traj.shape[0] == len(eef)
    assert grips.shape[0] == len(eef)
    # invariant: eef pose relative to the object is identical in source and
    # generated trajectories (MimicGen's core transform)
    rel_src = np.linalg.inv(src_obj)[None] @ eef
    rel_new = np.linalg.inv(new_obj)[None] @ traj
    np.testing.assert_allclose(rel_new, rel_src, atol=1e-6)
    # gripper schedule carried through
    np.testing.assert_array_equal(grips, grip)


def test_generated_dataset_trains_bc(annotated_dataset, tmp_path):
    """Generated HDF5 feeds the BC trainer (reference robomimic consumption)."""
    annotated, _, _, _ = annotated_dataset
    generated = str(tmp_path / "generated.hdf5")
    out = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts/imitation_learning/generate_dataset.py"),
         "--input_file", annotated, "--output_file", generated,
         "--generation_num_trials", "3"],
        capture_output=True, text=True, timeout=240,
    )
    assert out.returncode == 0, out.stderr
    policy = str(tmp_path / "bc.pkl")
    out = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts/imitation_learning/robomimic/train.py"),
         "--dataset", generated, "--epochs", "2", "--batch_size", "32",
         "--output", policy],
        capture_output=True, text=True, timeout=420,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr
    assert os.path.exists(policy)
