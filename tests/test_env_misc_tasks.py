"""Smoke tests over the remaining registered tasks (reference
test_environments.py sweep pattern)."""

import gymnasium as gym
import jax
import jax.numpy as jnp
import pytest

import isaaclab_tpu.tasks  # noqa: F401
from isaaclab_tpu.tasks.utils import parse_env_cfg

SMOKE_TASKS = ["Isaac-Ant-v0", "Isaac-Reach-Franka-v0"]


@pytest.mark.parametrize("task_id", SMOKE_TASKS)
def test_task_steps_finite(task_id):
    cfg = parse_env_cfg(task_id, num_envs=4)
    env = gym.make(task_id, cfg=cfg).unwrapped
    state = jax.jit(env.init_state)(jax.random.PRNGKey(0))
    A = env.action_manager.total_action_dim
    step = jax.jit(env.step_state)
    key = jax.random.PRNGKey(1)
    for i in range(10):
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, (4, A), minval=-1, maxval=1)
        state, (obs, rew, term, trunc, _) = step(state, a)
        assert bool(jnp.all(jnp.isfinite(obs["policy"]))), f"{task_id} step {i}"
        assert bool(jnp.all(jnp.isfinite(rew)))


def test_registry_has_all_families():
    ids = [s for s in gym.registry.keys() if "isaaclab_tpu" in str(gym.spec(s).entry_point)]
    for expected in [
        "Isaac-Cartpole-v0",
        "Isaac-Cartpole-Direct-v0",
        "Isaac-Ant-v0",
        "Isaac-Humanoid-v0",
        "Isaac-Velocity-Flat-Anymal-C-v0",
        "Isaac-Velocity-Rough-Anymal-C-v0",
        "Isaac-Reach-Franka-v0",
        "Hover",
    ]:
        assert expected in ids, f"missing {expected}"


def test_lift_task_object_contacts():
    """Lift env: cube rests on ground; closing the gripper near it engages
    robot-object contact rows (world-merge coupling)."""
    cfg = parse_env_cfg("Isaac-Lift-Cube-Franka-v0", num_envs=2)
    env = gym.make("Isaac-Lift-Cube-Franka-v0", cfg=cfg).unwrapped
    state = jax.jit(env.init_state)(jax.random.PRNGKey(0))
    A = env.action_manager.total_action_dim
    step = jax.jit(env.step_state)
    for _ in range(20):
        state, (obs, rew, term, trunc, _) = step(state, jnp.zeros((2, A)))
    assert bool(jnp.all(jnp.isfinite(obs["policy"])))
    # the cube must have settled on the ground (z ~ half-extent 0.03)
    views, _ = env.scene.data_views(state.scene, env.physics_dt)
    z = views["object"].root_pos_w[:, 2]
    assert bool(jnp.all((z > 0.01) & (z < 0.08))), f"cube z={z}"
