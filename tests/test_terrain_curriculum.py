"""Terrain curriculum: promotion logic + env-to-cell offset wiring
(reference ``velocity/mdp/curriculums.py:26`` terrain_levels_vel +
``terrain_importer`` env-origin updates)."""

import jax.numpy as jnp
import numpy as np

from isaaclab_tpu.envs.mdp.curriculums import terrain_levels_vel
from isaaclab_tpu.managers import SceneEntityCfg


class _Data:
    def __init__(self, pos):
        self.root_pos_w = jnp.asarray(pos)


class _Gen:
    sub_size = (8.0, 8.0)


class _Terrain:
    max_terrain_level = 10
    generator = _Gen()


class _Cmd:
    def __init__(self, cmd):
        self._cmd = jnp.asarray(cmd)

    def get_command(self, name):
        return self._cmd


class _Scene(dict):
    terrain = _Terrain()

    def __getitem__(self, k):
        return dict.__getitem__(self, k)


class _Env:
    max_episode_length_s = 20.0

    def __init__(self, pos, cmd):
        self.scene = _Scene(robot=type("R", (), {"data": _Data(pos)})())
        self.command_manager = _Cmd(cmd)


def test_promote_demote_hold():
    # env0 walked 6 m (> 4 m) -> promote; env1 walked 0.5 m of a required
    # 1 m/s * 20 s = 20 m (-> < 10 m) -> demote; env2 not resetting -> hold
    pos = [[6.0, 0.0, 0.5], [0.5, 0.0, 0.5], [6.0, 0.0, 0.5]]
    cmd = [[0.2, 0.0, 0.0], [1.0, 0.0, 0.0], [1.0, 0.0, 0.0]]
    env = _Env(pos, cmd)
    levels = jnp.asarray([3.0, 3.0, 3.0])
    mask = jnp.asarray([True, True, False])
    new, metric = terrain_levels_vel(env, levels, mask,
                                     asset_cfg=SceneEntityCfg("robot"))
    np.testing.assert_array_equal(np.asarray(new), [4.0, 2.0, 3.0])
    assert 2.9 < float(metric) < 3.1


def test_levels_clip_to_terrain_rows():
    env = _Env([[20.0, 0.0, 0.5]], [[0.1, 0.0, 0.0]])
    levels = jnp.asarray([9.0])
    new, _ = terrain_levels_vel(env, levels, jnp.asarray([True]),
                                asset_cfg=SceneEntityCfg("robot"))
    assert float(new[0]) == 9.0  # clipped at max_terrain_level - 1


def test_apply_terrain_levels_moves_env_offsets():
    """Scene-level wiring: promoted envs get the new row's cell offset."""
    from isaaclab_tpu.scene import InteractiveScene
    from isaaclab_tpu.tasks.manager_based.locomotion.velocity.config.anymal_c.rough_env_cfg import (
        AnymalCRoughEnvCfg,
    )

    cfg = AnymalCRoughEnvCfg()
    cfg.scene.num_envs = 4
    scene = InteractiveScene(cfg.scene, cfg.sim)
    state = scene.init_state()
    assert state.terrain_offsets is not None
    before = np.asarray(state.terrain_offsets)
    levels = jnp.asarray([9.0, 9.0, 9.0, 9.0])
    mask = jnp.asarray([True, False, True, False])
    out = scene.apply_terrain_levels(state, levels, mask)
    after = np.asarray(out.terrain_offsets)
    table = np.asarray(scene.terrain._cell_origins)
    types = np.asarray(scene.terrain.terrain_types)
    # masked envs moved to row 9 of their column; unmasked kept their cell
    np.testing.assert_allclose(after[0], table[9, types[0]], atol=1e-5)
    np.testing.assert_allclose(after[2], table[9, types[2]], atol=1e-5)
    np.testing.assert_allclose(after[1], before[1], atol=1e-5)
    np.testing.assert_allclose(after[3], before[3], atol=1e-5)
