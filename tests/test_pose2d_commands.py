"""Pose-2d command parity: base-frame retargeting + terrain-based goals.

Reference: envs/mdp/commands/pose_2d_command.py (UniformPose2dCommand,
TerrainBasedPose2dCommand) and terrains/utils.py:find_flat_patches.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_flat_patches_are_flat():
    """Generator-side patch sampling rejects sloped/stepped regions."""
    from isaaclab_tpu.terrains.height_field_terrains import (
        FlatPatchSamplingCfg,
        HfPyramidStairsTerrainCfg,
    )
    from isaaclab_tpu.terrains.terrain_generator import (
        TerrainGenerator,
        TerrainGeneratorCfg,
    )

    patch = FlatPatchSamplingCfg(
        num_patches=16, patch_radius=0.3, max_height_diff=0.05
    )
    cfg = TerrainGeneratorCfg(
        seed=3,
        size=(8.0, 8.0),
        num_rows=2,
        num_cols=2,
        horizontal_scale=0.1,
        sub_terrains={
            "stairs": HfPyramidStairsTerrainCfg(
                proportion=1.0,
                step_height_range=(0.1, 0.2),
                step_width=0.3,
                platform_width=2.0,
                flat_patch_sampling={"target": patch},
            )
        },
    )
    gen = TerrainGenerator(cfg)
    assert "target" in gen.flat_patches
    pts = gen.flat_patches["target"]
    assert pts.shape == (2, 2, 16, 3)
    assert np.isfinite(pts).all()
    hs = cfg.horizontal_scale
    # every patch must sit on locally-flat ground: re-check the height window
    for r in range(2):
        for c in range(2):
            for p in pts[r, c]:
                ci = int(p[0] / hs)
                cj = int(p[1] / hs)
                rad = int(np.ceil(0.3 / hs))
                win = gen.heights[
                    max(ci - rad, 0): ci + rad + 1,
                    max(cj - rad, 0): cj + rad + 1,
                ]
                assert win.max() - win.min() <= 0.05 + 1e-6


@pytest.fixture(scope="module")
def nav_env():
    import isaaclab_tpu.tasks  # noqa: F401
    from isaaclab_tpu.envs import ManagerBasedRLEnv
    from isaaclab_tpu.tasks.manager_based.navigation.navigation_env_cfg import (
        NavigationEnvCfg,
    )

    cfg = NavigationEnvCfg()
    cfg.scene.num_envs = 4
    return ManagerBasedRLEnv(cfg)


def test_uniform_pose2d_base_frame(nav_env):
    """Command is (pos_b, heading_b): retargeting the stored world goal into
    the base frame must reproduce the exposed command."""
    env = nav_env
    state = jax.jit(env.init_state)(jax.random.PRNGKey(0))
    act = jnp.zeros((4, env.action_manager.total_action_dim))
    step = jax.jit(env.step_state)
    for _ in range(3):
        state, _ = step(state, act)
    cmd_state = state.commands["pose_command"]
    assert cmd_state.command.shape == (4, 4)
    assert np.isfinite(np.asarray(cmd_state.command)).all()
    pos_w, heading_w = cmd_state.extra
    # goals were sampled inside the configured box around the env origins
    assert np.all(np.abs(np.asarray(pos_w[:, :2])) <= 3.0 + 1e-5)
    # base-frame consistency: |pos_b| == |pos_w - root_pos_w|
    from isaaclab_tpu.utils import math as math_utils

    data_pos = state.scene.phys.q[:, 0:3]  # floating base first in world q
    d_cmd = np.linalg.norm(np.asarray(cmd_state.command[:, :3]), axis=-1)
    d_world = np.linalg.norm(np.asarray(pos_w - data_pos), axis=-1)
    np.testing.assert_allclose(d_cmd, d_world, rtol=1e-4, atol=1e-4)
    del math_utils, heading_w


def test_terrain_based_pose2d_command():
    """Goals come from the env's terrain cell's 'target' flat patches."""
    from isaaclab_tpu.envs import ManagerBasedRLEnv
    from isaaclab_tpu.envs.mdp.commands import TerrainBasedPose2dCommandCfg
    from isaaclab_tpu.tasks.manager_based.navigation.navigation_env_cfg import (
        NavigationEnvCfg,
    )
    from isaaclab_tpu.terrains.height_field_terrains import (
        FlatPatchSamplingCfg,
        HfRandomUniformTerrainCfg,
    )
    from isaaclab_tpu.terrains.terrain_generator import TerrainGeneratorCfg
    from isaaclab_tpu.terrains.terrain_importer import TerrainImporterCfg

    cfg = NavigationEnvCfg()
    cfg.scene.num_envs = 4
    cfg.scene.terrain = TerrainImporterCfg(
        terrain_type="generator",
        terrain_generator=TerrainGeneratorCfg(
            seed=5,
            size=(8.0, 8.0),
            num_rows=2,
            num_cols=2,
            horizontal_scale=0.1,
            sub_terrains={
                "rough": HfRandomUniformTerrainCfg(
                    proportion=1.0,
                    noise_range=(-0.02, 0.02),
                    noise_step=0.01,
                    flat_patch_sampling={
                        "target": FlatPatchSamplingCfg(
                            num_patches=8,
                            patch_radius=0.3,
                            max_height_diff=0.2,
                        )
                    },
                )
            },
        ),
    )
    cfg.commands.pose_command = TerrainBasedPose2dCommandCfg(
        asset_name="robot",
        resampling_time_range=(8.0, 8.0),
        simple_heading=True,
        ranges=TerrainBasedPose2dCommandCfg.Ranges(heading=(-3.14, 3.14)),
    )
    env = ManagerBasedRLEnv(cfg)
    state = jax.jit(env.init_state)(jax.random.PRNGKey(0))
    act = jnp.zeros((4, env.action_manager.total_action_dim))
    state, _ = jax.jit(env.step_state)(state, act)
    cmd_state = state.commands["pose_command"]
    assert cmd_state.command.shape == (4, 4)
    assert np.isfinite(np.asarray(cmd_state.command)).all()
    # each world goal (env-local + cell offset) must be one of that cell's
    # stored patches
    pos_w, _ = cmd_state.extra
    patches = env.scene.terrain.flat_patches["target"]
    off = np.asarray(state.scene.terrain_offsets)
    sub = env.scene.terrain.generator.sub_size
    goals_terrain = np.asarray(pos_w) + off
    for e in range(4):
        r = int(off[e, 0] / sub[0])
        c = int(off[e, 1] / sub[1])
        d = np.linalg.norm(patches[r, c] - goals_terrain[e], axis=-1)
        assert d.min() < 1e-4, f"env {e}: goal not among cell patches ({d.min()})"
