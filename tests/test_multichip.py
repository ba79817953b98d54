"""Data-parallel equivalence (VERDICT r1 weak #10): one PPO training step on
a single device vs sharded over the 8-device mesh must produce the same
parameters (up to collective reduction-order float noise), and the sharded
run must actually shard the env state."""

import jax
import numpy as np
import pytest


def _make(num_envs, steps=2):
    from isaaclab_tpu.envs import ManagerBasedRLEnv
    from isaaclab_tpu.rl import OnPolicyRunner
    from isaaclab_tpu.tasks.manager_based.classic.cartpole.agents.rsl_rl_ppo_cfg import (
        CartpolePPORunnerCfg,
    )
    from isaaclab_tpu.tasks.manager_based.classic.cartpole.cartpole_env_cfg import (
        CartpoleEnvCfg,
    )

    cfg = CartpoleEnvCfg()
    cfg.scene.num_envs = num_envs
    env = ManagerBasedRLEnv(cfg)
    agent_cfg = CartpolePPORunnerCfg()
    agent_cfg.num_steps_per_env = steps
    agent_cfg.algorithm.num_learning_epochs = 1
    agent_cfg.algorithm.num_mini_batches = 1
    return OnPolicyRunner(env, agent_cfg, log_dir=None)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_train_step_equivalence():
    from isaaclab_tpu.parallel import make_mesh, shard_env_pytree

    E = 16
    # single-device reference
    r1 = _make(E)
    s1 = r1.init_train_state(seed=0)
    n1, _ = jax.jit(r1._train_iteration)(s1)

    # 8-way data-parallel
    r2 = _make(E)
    s2 = r2.init_train_state(seed=0)
    mesh = make_mesh(jax.devices()[:8])
    s2 = shard_env_pytree(mesh, s2, E)
    n2, _ = jax.jit(r2._train_iteration)(s2)

    # env state is genuinely sharded over 'data'
    q = n2.env_state.scene.phys.q
    assert any(s == "data" for s in q.sharding.spec if s is not None), (
        f"env state not sharded: {q.sharding}"
    )

    # parameters identical up to psum reduction-order noise
    p1 = jax.device_get(n1.update.params)
    p2 = jax.device_get(n2.update.params)
    flat1 = jax.tree.leaves(p1)
    flat2 = jax.tree.leaves(p2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
