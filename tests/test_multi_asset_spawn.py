"""Multi-asset random spawn (reference sim/spawners/wrappers/
MultiAssetSpawnerCfg): union model + static per-env variant choice via
contact-candidate masks (sim/spawners.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from isaaclab_tpu.assets import RigidObjectCfg, RigidObjectInitStateCfg
from isaaclab_tpu.physics.model import (
    GEOM_BOX, GEOM_SPHERE, JOINT_FREE, ModelBuilder,
)
from isaaclab_tpu.scene import InteractiveScene, InteractiveSceneCfg
from isaaclab_tpu.sim.spawners import MultiAssetCfg
from isaaclab_tpu.utils.configclass import configclass


def _ball(r, mass):
    def build():
        b = ModelBuilder("ball")
        body = b.add_body("obj", -1, JOINT_FREE, mass=mass,
                          inertia=np.eye(3) * mass * r * r * 0.4)
        b.add_geom(body, GEOM_SPHERE, (r,), friction=0.8)
        return b.build()
    return build


def _box(h, mass):
    def build():
        b = ModelBuilder("box")
        body = b.add_body("obj", -1, JOINT_FREE, mass=mass,
                          inertia=np.eye(3) * mass * h * h / 3)
        b.add_geom(body, GEOM_BOX, (h, h, h), friction=0.8)
        return b.build()
    return build


@configclass
class SceneCfg(InteractiveSceneCfg):
    obj = RigidObjectCfg(
        model=MultiAssetCfg(
            assets=[_ball(0.05, 0.2), _box(0.09, 0.5)],
            random_choice=False,  # round-robin: env0 ball, env1 box, ...
        ),
        init_state=RigidObjectInitStateCfg(pos=(0.0, 0.0, 0.3)),
    )


class TestMultiAssetSpawn:
    def test_each_env_rests_at_its_variants_height(self):
        sc = InteractiveScene(SceneCfg(num_envs=4, env_spacing=2.0))
        # candidate mask exists and gates the union's ground candidates
        assert sc._cand_env_mask is not None
        state = sc.init_state()
        # chosen-variant mass per env
        b0 = sc.slices["obj"].body_start
        m = np.asarray(state.body_params.mass[:, b0])
        np.testing.assert_allclose(m, [0.2, 0.5, 0.2, 0.5])
        step = jax.jit(lambda s: sc.step_physics(s, 1.0 / 120.0))
        for _ in range(240):
            state = step(state)
        z = np.asarray(state.phys.q).reshape(4, -1)[:, 2]
        # ball envs rest at r=0.05, box envs at h=0.09
        np.testing.assert_allclose(z[[0, 2]], 0.05, atol=0.01)
        np.testing.assert_allclose(z[[1, 3]], 0.09, atol=0.01)

    def test_random_choice_deterministic(self):
        from isaaclab_tpu.sim.spawners import choose_variants

        cfg = MultiAssetCfg(assets=[None, None, None], seed=7)
        a = choose_variants(cfg, 64)
        b = choose_variants(cfg, 64)
        np.testing.assert_array_equal(a, b)
        assert set(np.unique(a)) <= {0, 1, 2} and len(np.unique(a)) > 1
