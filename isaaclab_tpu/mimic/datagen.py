"""Data generation (reference ``isaaclab_mimic/datagen/``):
``DataGenerator`` transforms recorded end-effector segments through new object
poses (data_generator.py:29-130); subtask selection strategies
(selection_strategy.py:59-211); ``DataGenInfoPool`` of source demos.
Host-side numpy pipeline over HDF5 episode data.
"""

from __future__ import annotations

import numpy as np

from ..utils import math as math_utils


class DataGenInfoPool:
    """Pool of annotated source demos (reference datagen_info_pool)."""

    def __init__(self):
        self.datagen_infos: list[dict] = []

    def add_from_episode(self, eef_poses: np.ndarray, object_poses: dict,
                         subtask_boundaries: list, gripper_actions: np.ndarray):
        """``eef_poses``: (T, 4, 4); ``object_poses``: name -> (4, 4) at demo
        start; ``subtask_boundaries``: list of (start, end) per subtask."""
        self.datagen_infos.append(
            dict(
                eef_poses=np.asarray(eef_poses),
                object_poses={k: np.asarray(v) for k, v in object_poses.items()},
                subtask_boundaries=list(subtask_boundaries),
                gripper_actions=np.asarray(gripper_actions),
            )
        )

    @property
    def num_demos(self):
        return len(self.datagen_infos)


class SelectionStrategy:
    """Reference ``SelectionStrategy`` base (selection_strategy.py:59)."""

    name = "base"

    def select_source_demo(self, eef_pose, object_pose, src_subtask_datagen_infos):
        raise NotImplementedError


class RandomStrategy(SelectionStrategy):
    """Uniform-random source demo (reference selection_strategy.py random)."""

    name = "random"

    def __init__(self, rng=None):
        self.rng = rng or np.random.default_rng(0)

    def select_source_demo(self, eef_pose, object_pose, src_subtask_datagen_infos):
        return int(self.rng.integers(0, len(src_subtask_datagen_infos)))


class NearestNeighborObjectStrategy(SelectionStrategy):
    """Pick the source demo whose object pose is closest
    (reference selection_strategy.py:121 nearest_neighbor_object)."""

    name = "nearest_neighbor_object"

    def __init__(self, pos_weight: float = 1.0, rot_weight: float = 1.0,
                 nn_k: int = 3, rng=None):
        self.pos_weight = pos_weight
        self.rot_weight = rot_weight
        self.nn_k = nn_k
        self.rng = rng or np.random.default_rng(0)

    def select_source_demo(self, eef_pose, object_pose, src_subtask_datagen_infos):
        target_pos = np.asarray(object_pose)[:3, 3]
        dists = []
        for info in src_subtask_datagen_infos:
            src_pos = info["object_pose"][:3, 3]
            dists.append(np.linalg.norm(target_pos - src_pos))
        order = np.argsort(dists)[: max(1, self.nn_k)]
        return int(self.rng.choice(order))


SELECTION_STRATEGIES = {
    s.name: s for s in (RandomStrategy, NearestNeighborObjectStrategy)
}


class DataGenerator:
    """Segment-transform generation (reference data_generator.py:29-130).

    Core MimicGen operation: a recorded eef segment, expressed relative to its
    subtask's reference object, is replayed through the NEW object pose —
    ``new_eef = new_obj_pose @ inv(src_obj_pose) @ src_eef``.
    """

    def __init__(self, env=None, src_demo_datagen_info_pool: DataGenInfoPool = None,
                 noise_scale: float = 0.0, rng=None):
        self.env = env
        self.pool = src_demo_datagen_info_pool or DataGenInfoPool()
        self.noise_scale = noise_scale
        self.rng = rng or np.random.default_rng(0)

    @staticmethod
    def transform_segment(eef_segment: np.ndarray, src_object_pose: np.ndarray,
                          new_object_pose: np.ndarray) -> np.ndarray:
        """(T, 4, 4) eef poses re-expressed through the new object pose."""
        rel = np.linalg.inv(src_object_pose)[None] @ np.asarray(eef_segment)
        return np.asarray(new_object_pose)[None] @ rel

    @staticmethod
    def interpolate_poses(start: np.ndarray, end: np.ndarray, num_steps: int):
        """SE(3) interpolation between two 4x4 poses (reference
        interpolation through utils math)."""
        import jax.numpy as jnp

        pos1, rot1 = start[:3, 3], start[:3, :3]
        pos2, rot2 = end[:3, 3], end[:3, :3]
        q1 = np.asarray(math_utils.quat_from_matrix(jnp.asarray(rot1)))
        q2 = np.asarray(math_utils.quat_from_matrix(jnp.asarray(rot2)))
        out = []
        for t in np.linspace(0.0, 1.0, num_steps):
            p = pos1 * (1 - t) + pos2 * t
            q = np.asarray(
                math_utils.quat_slerp(jnp.asarray(q1), jnp.asarray(q2), float(t))
            )
            R = np.asarray(math_utils.matrix_from_quat(jnp.asarray(q)))
            pose = np.eye(4)
            pose[:3, :3] = R
            pose[:3, 3] = p
            out.append(pose)
        return np.stack(out)

    def generate_trajectory(self, subtask_cfgs: list, new_object_poses: dict,
                            strategy: SelectionStrategy | None = None,
                            current_eef_pose: np.ndarray | None = None):
        """Generate one augmented eef trajectory through the new scene.

        Returns (T, 4, 4) poses + (T,) gripper actions; the async generation
        loop (reference generation.py:62-192) replays these through the env's
        ``target_eef_pose_to_action``.
        """
        strategy = strategy or RandomStrategy(self.rng)
        if self.pool.num_demos == 0:
            raise ValueError("empty source demo pool")
        segments = []
        grippers = []
        prev_end = current_eef_pose
        for si, sub_cfg in enumerate(subtask_cfgs):
            obj = sub_cfg.object_ref
            new_obj_pose = (
                np.asarray(new_object_poses[obj]) if obj else np.eye(4)
            )
            infos = [
                {
                    "object_pose": d["object_poses"].get(obj, np.eye(4)),
                    "demo": d,
                }
                for d in self.pool.datagen_infos
            ]
            idx = strategy.select_source_demo(prev_end, new_obj_pose, infos)
            demo = infos[idx]["demo"]
            start, end = demo["subtask_boundaries"][si]
            seg = demo["eef_poses"][start:end]
            grip = demo["gripper_actions"][start:end]
            src_obj_pose = infos[idx]["object_pose"]
            if obj is not None:
                seg = self.transform_segment(seg, src_obj_pose, new_obj_pose)
            if self.noise_scale > 0:
                seg = seg.copy()
                seg[:, :3, 3] += self.rng.normal(
                    0, self.noise_scale, seg[:, :3, 3].shape
                )
            # interpolate from previous segment end to this segment start
            if prev_end is not None and sub_cfg.num_interpolation_steps > 0:
                bridge = self.interpolate_poses(
                    prev_end, seg[0], sub_cfg.num_interpolation_steps
                )
                segments.append(bridge)
                grippers.append(np.full(len(bridge), grip[0] if len(grip) else 0.0))
            segments.append(seg)
            grippers.append(grip)
            prev_end = seg[-1]
        return np.concatenate(segments), np.concatenate(grippers)
