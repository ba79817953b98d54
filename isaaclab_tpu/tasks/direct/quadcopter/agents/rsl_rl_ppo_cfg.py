"""Fork UAV agent cfgs (reference direct/quadcopter/agents/rsl_rl_ppo_cfg.py):
standard, recurrent (RNN) and cascade (GuideCa/PPOCA) runners."""

from isaaclab_tpu.rl import (
    RslRlOnPolicyRunnerCfg,
    RslRlPpoActorCriticCascadeCfg,
    RslRlPpoActorCriticCfg,
    RslRlPpoActorCriticRecurrentCfg,
    RslRlPpoAlgorithmCfg,
    RslRlPpoCascadeAlgorithmCfg,
)
from isaaclab_tpu.utils import configclass

_ALGO = dict(
    value_loss_coef=1.0,
    use_clipped_value_loss=True,
    clip_param=0.15,
    entropy_coef=0.005,
    num_learning_epochs=5,
    num_mini_batches=4,
    learning_rate=1.0e-4,
    schedule="adaptive",
    gamma=0.99,
    lam=0.95,
    desired_kl=0.01,
    max_grad_norm=1.0,
)


@configclass
class QuadcopterPPORunnerCfg(RslRlOnPolicyRunnerCfg):
    num_steps_per_env = 24
    max_iterations = 3000
    save_interval = 200
    experiment_name = "quadcopter_rate"
    empirical_normalization = False
    policy = RslRlPpoActorCriticCfg(
        init_noise_std=0.2,
        actor_hidden_dims=[256, 128, 64],
        critic_hidden_dims=[512, 256, 128, 64],
        activation="elu",
    )
    algorithm = RslRlPpoAlgorithmCfg(**_ALGO)


@configclass
class QuadcopterPPORNNRunnerCfg(QuadcopterPPORunnerCfg):
    max_iterations = 10000
    save_interval = 500
    policy = RslRlPpoActorCriticRecurrentCfg(
        init_noise_std=0.2,
        actor_hidden_dims=[256, 128, 64],
        critic_hidden_dims=[512, 256, 128, 64],
        activation="elu",
        rnn_type="lstm",
        rnn_hidden_size=128,
        rnn_num_layers=1,
    )


@configclass
class QuadcopterPPOCascadeRunnerCfg(RslRlOnPolicyRunnerCfg):
    """Reference QuadcopterPPOCascadeRunnerCfg: obs partition
    [lidar 72*5 | state1 6*3 | state2 17*3]."""

    num_steps_per_env = 24
    max_iterations = 20000
    save_interval = 500
    experiment_name = "quadcopter_rate"
    empirical_normalization = False
    policy = RslRlPpoActorCriticCascadeCfg(
        init_noise_std=1.0,
        noise_std_type="scalar",
        lidar_input_dim=72 * 5,
        mlp1_state_dim=6 * 3,
        mlp2_state_dim=17 * 3,
        mlp1_hidden_dims=[128, 64],
        mlp2_hidden_dims=[256, 128, 64],
        mlp1_out_dim=3,
        mlp2_out_dim=64,
        critic_hidden_dims=[512, 256, 128, 64],
        activation="elu",
    )
    algorithm = RslRlPpoCascadeAlgorithmCfg(
        cascade_loss_coef=1.0,
        **{**_ALGO, "learning_rate": 5.0e-4},
    )
