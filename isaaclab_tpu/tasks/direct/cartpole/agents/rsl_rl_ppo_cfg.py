"""PPO runner cfg for direct cartpole (reference
``direct/cartpole/agents/rsl_rl_ppo_cfg.py``: same hyperparameters as the
manager-based cartpole agent)."""

from isaaclab_tpu.rl.rl_cfg import (
    RslRlOnPolicyRunnerCfg,
    RslRlPpoActorCriticCfg,
    RslRlPpoAlgorithmCfg,
)
from isaaclab_tpu.utils.configclass import configclass


@configclass
class CartpoleDirectPPORunnerCfg(RslRlOnPolicyRunnerCfg):
    num_steps_per_env: int = 16
    max_iterations: int = 150
    save_interval: int = 50
    experiment_name: str = "cartpole_direct"
    empirical_normalization: bool = False
    policy: RslRlPpoActorCriticCfg = RslRlPpoActorCriticCfg(
        init_noise_std=1.0,
        actor_hidden_dims=[32, 32],
        critic_hidden_dims=[32, 32],
        activation="elu",
    )
    algorithm: RslRlPpoAlgorithmCfg = RslRlPpoAlgorithmCfg(
        value_loss_coef=1.0,
        use_clipped_value_loss=True,
        clip_param=0.2,
        entropy_coef=0.005,
        num_learning_epochs=5,
        num_mini_batches=4,
        learning_rate=1.0e-3,
        schedule="adaptive",
        gamma=0.99,
        lam=0.95,
        desired_kl=0.01,
        max_grad_norm=1.0,
    )
