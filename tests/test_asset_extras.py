"""RigidObjectCollection + DeformableObject asset tests (reference
``assets/rigid_object_collection/`` and ``assets/deformable_object/``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaaclab_tpu.assets import RigidObjectCfg, RigidObjectCollectionCfg
from isaaclab_tpu.assets.rigid_object import RigidObjectInitStateCfg
from isaaclab_tpu.physics.model import GEOM_SPHERE, JOINT_FREE, ModelBuilder
from isaaclab_tpu.scene import InteractiveScene, InteractiveSceneCfg
from isaaclab_tpu.utils import configclass


def _ball(name, r, m):
    def build():
        b = ModelBuilder(name)
        body = b.add_body(
            "body", -1, JOINT_FREE, mass=m, inertia=np.eye(3) * 0.4 * m * r * r
        )
        b.add_geom(body, GEOM_SPHERE, (r,), friction=0.8)
        return b.build()

    return build


@configclass
class _CollectionSceneCfg(InteractiveSceneCfg):
    objects = RigidObjectCollectionCfg(
        rigid_objects={
            "ball_a": RigidObjectCfg(
                model=_ball("a", 0.1, 1.0),
                init_state=RigidObjectInitStateCfg(pos=(0.0, 0.0, 1.0)),
            ),
            "ball_b": RigidObjectCfg(
                model=_ball("b", 0.2, 2.0),
                init_state=RigidObjectInitStateCfg(pos=(1.0, 0.0, 2.0)),
            ),
        }
    )


class TestRigidObjectCollection:
    @pytest.fixture(scope="class")
    def scene(self):
        return InteractiveScene(_CollectionSceneCfg(num_envs=3, env_spacing=2.0))

    def test_buffers_are_object_batched(self, scene):
        state = jax.jit(scene.init_state)()
        views, _ = scene.data_views(state, 0.01)
        d = views["objects"]
        assert d.object_pos_w.shape == (3, 2, 3)
        assert d.object_state_w.shape == (3, 2, 13)
        np.testing.assert_allclose(
            np.asarray(d.object_pos_w[0, :, 2]), [1.0, 2.0], atol=1e-6
        )

    def test_objects_fall_and_rest_at_radius(self, scene):
        state = jax.jit(scene.init_state)()
        step = jax.jit(lambda s: scene.step_physics(s, 0.01))
        for _ in range(120):
            state = step(state)
        views, _ = scene.data_views(state, 0.01)
        z = np.asarray(views["objects"].object_pos_w[..., 2])
        np.testing.assert_allclose(z[:, 0], 0.1, atol=0.02)
        np.testing.assert_allclose(z[:, 1], 0.2, atol=0.02)

    def test_write_object_pose(self, scene):
        state = jax.jit(scene.init_state)()
        col = scene.rigid_object_collections["objects"]
        poses = jnp.tile(
            jnp.array([[0.0, 0.0, 5.0, 1.0, 0, 0, 0], [0, 1.0, 6.0, 1.0, 0, 0, 0]]),
            (3, 1, 1),
        )
        q = col.write_object_pose_to_sim(state.phys.q, poses)
        state = state._replace(phys=state.phys._replace(q=q))
        views, _ = scene.data_views(state, 0.01)
        np.testing.assert_allclose(
            np.asarray(views["objects"].object_pos_w[0, :, 2]), [5.0, 6.0],
            atol=1e-6,
        )

    def test_find_objects(self, scene):
        col = scene.rigid_object_collections["objects"]
        ids, names = col.find_objects("ball_.*")
        assert names == ["ball_a", "ball_b"]


class TestDeformableObject:
    @pytest.fixture(scope="class")
    def scene(self):
        from isaaclab_tpu.assets import DeformableObjectCfg
        from isaaclab_tpu.physics.soft_body import make_soft_cube

        @configclass
        class SoftSceneCfg(InteractiveSceneCfg):
            cube = DeformableObjectCfg(
                model=lambda: make_soft_cube(
                    size=(0.1, 0.1, 0.1), resolution=3, mass=0.1
                ),
                init_state=DeformableObjectCfg.InitStateCfg(pos=(0.0, 0.0, 0.5)),
            )

        return InteractiveScene(SoftSceneCfg(num_envs=2, env_spacing=2.0))

    def test_falls_and_rests_on_ground(self, scene):
        state = jax.jit(scene.init_state)()
        soft = scene.deformable_objects["cube"]
        step = jax.jit(lambda s: scene.step_physics(s, 1 / 120.0))
        for _ in range(240):  # 2 s
            state = step(state)
        data = soft.data(state.entities["cube"])
        z = np.asarray(data.nodal_pos_w[..., 2])
        assert z.min() > -1e-3, "particles sank through the ground"
        assert z.max() < 0.2, f"cube did not fall: max z {z.max()}"
        # still roughly cube-shaped (constraints held): extents near 0.1
        ext = np.asarray(
            data.nodal_pos_w.max(axis=1) - data.nodal_pos_w.min(axis=1)
        )
        assert np.all(ext < 0.2), f"cube exploded: extents {ext}"
        assert np.all(ext > 0.05), f"cube collapsed: extents {ext}"

    def test_kinematic_target_pins_particles(self, scene):
        state = jax.jit(scene.init_state)()
        soft = scene.deformable_objects["cube"]
        est = state.entities["cube"]
        # pin particle 0 of every env at its start position
        targets = jnp.concatenate(
            [est.pos, jnp.zeros(est.pos.shape[:-1] + (1,))], axis=-1
        )
        targets = targets.at[:, 0, 3].set(1.0)
        est = soft.write_nodal_kinematic_target_to_sim(est, targets)
        state = state._replace(
            entities={**state.entities, "cube": est}
        )
        start0 = np.asarray(est.pos[:, 0])
        step = jax.jit(lambda s: scene.step_physics(s, 1 / 120.0))
        for _ in range(60):
            state = step(state)
        pos = np.asarray(state.entities["cube"].pos)
        np.testing.assert_allclose(pos[:, 0], start0, atol=1e-5)
        # unpinned particles hang below
        assert pos[:, 1:, 2].min() < start0[0, 2] - 0.02


class TestTiledCameraSegmentation:
    """Segmentation annotators (reference replicator semantic/instance
    annotators, camera.py + tiled_camera.py data types)."""

    def test_segmentation_ids(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from isaaclab_tpu.envs import ManagerBasedRLEnv
        from isaaclab_tpu.tasks.manager_based.classic.cartpole.cartpole_camera_env_cfg import (
            CartpoleRGBCameraEnvCfg,
        )

        cfg = CartpoleRGBCameraEnvCfg()
        cfg.scene.num_envs = 2
        cfg.scene.tiled_camera.data_types = [
            "rgb", "semantic_segmentation", "instance_id_segmentation_fast",
        ]
        env = ManagerBasedRLEnv(cfg)
        state = jax.jit(env.init_state)(jax.random.PRNGKey(0))
        cam_state = state.scene.sensors["tiled_camera"]
        sem = np.asarray(cam_state.output["semantic_segmentation"])
        inst = np.asarray(cam_state.output["instance_id_segmentation_fast"])
        E, H, W, _ = sem.shape
        assert sem.dtype in (np.int32, np.int64)
        # the cartpole fills part of the frame: ids beyond background(0)
        # and ground(1) must appear, and ids are body/geom-consistent
        assert sem.max() >= 2, "no robot body visible in semantic ids"
        assert inst.max() >= 2
        # instance ids refine semantic ids: at least as many distinct values
        assert len(np.unique(inst)) >= len(np.unique(sem))

    def test_segmentation_dtype_scan_stable(self):
        """Regression (ADVICE r3): init_state allocated float32 for the
        int32 segmentation outputs, flipping the state pytree dtype after
        the first update and erroring lax.scan-carried rollouts."""
        import jax
        import jax.numpy as jnp

        from isaaclab_tpu.envs import ManagerBasedRLEnv
        from isaaclab_tpu.tasks.manager_based.classic.cartpole.cartpole_camera_env_cfg import (
            CartpoleRGBCameraEnvCfg,
        )

        cfg = CartpoleRGBCameraEnvCfg()
        cfg.scene.num_envs = 2
        cfg.scene.tiled_camera.data_types = [
            "rgb", "semantic_segmentation", "instance_segmentation_fast",
        ]
        env = ManagerBasedRLEnv(cfg)
        state = jax.jit(env.init_state)(jax.random.PRNGKey(0))
        act = jnp.zeros((2, env.action_manager.total_action_dim))

        def body(carry, _):
            s, _out = env.step_state(carry, act)
            return s, None

        # dtype flip between carry-in and carry-out would raise here
        state2, _ = jax.lax.scan(body, state, None, length=2)
        out0 = state.scene.sensors["tiled_camera"].output
        out2 = state2.scene.sensors["tiled_camera"].output
        for k in out0:
            assert out0[k].dtype == out2[k].dtype, k


class TestTiledCameraMotionVectors:
    """motion_vectors annotator (reference camera.py:53, tiled_camera.py:367:
    (E, H, W, 2) image-space motion) — analytic frame-to-frame reprojection."""

    def test_motion_vectors_track_moving_body(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from isaaclab_tpu.envs import ManagerBasedRLEnv
        from isaaclab_tpu.tasks.manager_based.classic.cartpole.cartpole_camera_env_cfg import (
            CartpoleRGBCameraEnvCfg,
        )

        cfg = CartpoleRGBCameraEnvCfg()
        cfg.scene.num_envs = 2
        cfg.scene.tiled_camera.data_types = [
            "rgb", "motion_vectors", "semantic_segmentation",
        ]
        env = ManagerBasedRLEnv(cfg)
        state = jax.jit(env.init_state)(jax.random.PRNGKey(0))
        mv0 = np.asarray(
            state.scene.sensors["tiled_camera"].output["motion_vectors"]
        )
        assert mv0.shape[-1] == 2
        # first rendered frame has no previous pose -> zero flow
        np.testing.assert_allclose(mv0, 0.0)

        # constant push -> the cart accelerates toward the camera (its slide
        # runs along the view axis, so lateral cart flow is ~0) and the POLE
        # swings, producing real vertical image motion on its pixels
        act = jnp.full((2, env.action_manager.total_action_dim), 1.0)
        step = jax.jit(env.step_state)
        for _ in range(8):
            state, _ = step(state, act)
        cam = state.scene.sensors["tiled_camera"]
        mv = np.asarray(cam.output["motion_vectors"])[0]
        sem = np.asarray(cam.output["semantic_segmentation"])[0, ..., 0]
        assert np.isfinite(mv).all()
        pole = sem == sem.max()
        assert sem.max() >= 2 and pole.any(), "pole not visible"
        # the swinging pole must show clear vertical motion (px/frame)
        assert np.abs(mv[..., 1][pole]).max() > 0.5, (
            "no vertical flow on the swinging pole"
        )
        # background/ground pixels see no flow (static camera, static world)
        bg = sem < 2
        assert np.abs(mv[..., 0][bg]).max() < 5e-3  # fp32 reprojection noise
        assert np.abs(mv[..., 1][bg]).max() < 5e-3

    def test_motion_vectors_scan_and_reset(self):
        """Flow state threads through lax.scan and resets clear validity."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from isaaclab_tpu.envs import ManagerBasedRLEnv
        from isaaclab_tpu.tasks.manager_based.classic.cartpole.cartpole_camera_env_cfg import (
            CartpoleRGBCameraEnvCfg,
        )

        cfg = CartpoleRGBCameraEnvCfg()
        cfg.scene.num_envs = 2
        cfg.scene.tiled_camera.data_types = ["rgb", "motion_vectors"]
        env = ManagerBasedRLEnv(cfg)
        state = jax.jit(env.init_state)(jax.random.PRNGKey(0))
        act = jnp.zeros((2, env.action_manager.total_action_dim))

        def body(carry, _):
            s, _out = env.step_state(carry, act)
            return s, None

        state2, _ = jax.lax.scan(body, state, None, length=3)
        assert np.isfinite(
            np.asarray(state2.scene.sensors["tiled_camera"].output[
                "motion_vectors"])
        ).all()
