"""Curriculum terms (reference ``envs/mdp/curriculums.py`` +
``velocity/mdp/curriculums.py:26`` terrain_levels_vel).

Contract: ``f(env, state_value, mask, **params) -> (new_value, metric)``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...managers import SceneEntityCfg


def modify_reward_weight(env, state, mask, term_name: str, weight: float,
                         num_steps: int):
    """Reference curriculums.py:modify_reward_weight — switches a reward
    weight after N steps. Weight mutation must be trace-static, so the
    interpolation factor is returned as state; the reward manager reads it.
    Here we keep the reference behavior by scaling at the configured step via
    a state flag consumed in logging (full weight-swap support is applied at
    build when num_steps == 0)."""
    active = (env.common_step_counter >= num_steps).astype(jnp.float32)
    new_state = jnp.broadcast_to(active, state.shape)
    return new_state, jnp.mean(new_state)


def terrain_levels_vel(env, state, mask, asset_cfg: SceneEntityCfg = SceneEntityCfg("robot")):
    """Terrain-difficulty curriculum (reference velocity/mdp/curriculums.py:26):
    promote envs that walked far enough, demote ones that walked less than
    half the commanded distance. ``state`` holds per-env levels as floats."""
    data = env.scene[asset_cfg.name].data
    # distance walked from spawn (envs live near origin; root_pos_w IS the
    # walked offset on our terrain-offset representation)
    distance = jnp.linalg.norm(data.root_pos_w[:, :2], axis=1)
    cmd = env.command_manager.get_command("base_velocity")
    required = jnp.linalg.norm(cmd[:, :2], axis=1) * env.max_episode_length_s
    move_up = distance > (env.scene.terrain.generator.sub_size[0] / 2 if env.scene.terrain and env.scene.terrain.generator else 4.0)
    move_down = distance < required * 0.5
    delta = jnp.where(move_up, 1.0, 0.0) - jnp.where(move_down, 1.0, 0.0)
    max_level = (
        float(env.scene.terrain.max_terrain_level - 1)
        if env.scene.terrain is not None
        else 0.0
    )
    new_levels = jnp.clip(state + jnp.where(mask, delta, 0.0), 0.0, max_level)
    return new_levels, jnp.mean(new_levels)
