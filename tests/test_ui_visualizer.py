"""ManagerLiveVisualizer + get_active_iterable_terms (reference
ui/widgets/manager_live_visualizer.py:44 + manager_base.py:231)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def env_and_state():
    from isaaclab_tpu.envs import ManagerBasedRLEnv
    from isaaclab_tpu.tasks.manager_based.classic.cartpole.cartpole_env_cfg import (
        CartpoleEnvCfg,
    )

    cfg = CartpoleEnvCfg()
    cfg.scene.num_envs = 4
    env = ManagerBasedRLEnv(cfg)
    state = jax.jit(env.init_state)(jax.random.PRNGKey(0))
    act = jnp.ones((4, env.action_manager.total_action_dim)) * 0.5
    step = jax.jit(env.step_state)
    for _ in range(3):
        state, _ = step(state, act)
    return env, state


def test_manager_iterable_terms(env_and_state):
    env, state = env_and_state
    rew = env.reward_manager.get_active_iterable_terms(state.rewards, 1)
    assert [n for n, _ in rew] == env.reward_manager.active_terms
    assert all(np.isfinite(v).all() for _, v in rew)
    act = env.action_manager.get_active_iterable_terms(state.actions, 0)
    total = sum(len(v) for _, v in act)
    assert total == env.action_manager.total_action_dim
    # the pushed action is visible
    assert abs(act[0][1][0] - 0.5) < 1e-6


def test_live_visualizer_dashboard(env_and_state):
    env, state = env_and_state
    from isaaclab_tpu.ui import EnvLiveVisualizer

    vis = EnvLiveVisualizer(env)
    assert "reward_manager" in vis.visualizers
    assert "action_manager" in vis.visualizers
    act = jnp.ones((4, env.action_manager.total_action_dim)) * 0.1
    step = jax.jit(env.step_state)
    for _ in range(5):
        state, _ = step(state, act)
        vis.update(state)
    out = vis.render()
    assert "reward_manager" in out
    # sparklines drawn for every reward term
    for term in env.reward_manager.active_terms:
        assert term[:28] in out
    # histories accumulated
    plot = next(iter(vis.visualizers["reward_manager"].plots.values()))
    assert plot.series.shape[0] == 5


def test_live_visualizer_term_filter_and_errors(env_and_state):
    env, _ = env_and_state
    from isaaclab_tpu.ui import ManagerLiveVisualizer, ManagerLiveVisualizerCfg

    with pytest.raises(ValueError):
        ManagerLiveVisualizer(
            env.reward_manager,
            ManagerLiveVisualizerCfg(
                manager_name="reward_manager", term_names=["nope"]
            ),
        )


def test_jsonl_stream(env_and_state, tmp_path):
    env, state = env_and_state
    from isaaclab_tpu.ui import EnvLiveVisualizer

    vis = EnvLiveVisualizer(env)
    act = jnp.zeros((4, env.action_manager.total_action_dim))
    state, _ = jax.jit(env.step_state)(state, act)
    vis.update(state)
    p = str(tmp_path / "live.jsonl")
    vis.to_jsonl(p, step=1)
    import json

    rec = json.loads(open(p).read().splitlines()[0])
    assert any(k.startswith("reward_manager/") for k in rec)
