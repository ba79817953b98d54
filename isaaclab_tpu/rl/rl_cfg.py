"""RL configuration dataclasses (reference ``isaaclab_rl/rsl_rl/rl_cfg.py``).

Same hyperparameter surface as the reference (rl_cfg.py:108-179) including the
fork's cascade/PPOCA additions (rl_cfg.py:22-34,166-170), consumed by the
in-repo Flax PPO runner instead of the external rsl-rl-lib.
"""

from __future__ import annotations

from dataclasses import MISSING

from ..utils.configclass import configclass


@configclass
class RslRlPpoActorCriticCfg:
    """Reference ``RslRlPpoActorCriticCfg``."""

    class_name: str = "ActorCritic"
    init_noise_std: float = 1.0
    actor_hidden_dims: list = [256, 256, 128]
    critic_hidden_dims: list = [256, 256, 128]
    activation: str = "elu"
    noise_std_type: str = "scalar"


@configclass
class RslRlPpoActorCriticRecurrentCfg(RslRlPpoActorCriticCfg):
    """Reference ``ActorCriticRecurrent`` cfg."""

    class_name: str = "ActorCriticRecurrent"
    rnn_type: str = "lstm"
    rnn_hidden_size: int = 256
    rnn_num_layers: int = 1


@configclass
class RslRlPpoActorCriticCascadeCfg(RslRlPpoActorCriticCfg):
    """Fork addition (reference rl_cfg.py:22-52): two-stage cascade actor —
    mlp1 (lidar + state1 -> guidance vector), mlp2 (guidance + state2 ->
    action). The obs is partitioned ``[lidar | state1 | state2]``."""

    class_name: str = "ActorCriticCascade"
    lidar_input_dim: int = 0
    mlp1_state_dim: int = 0
    mlp2_state_dim: int = 0
    mlp1_hidden_dims: list = [128, 64]
    mlp2_hidden_dims: list = [256, 128, 64]
    mlp1_out_dim: int = 3
    mlp2_out_dim: int = 64


@configclass
class RslRlPpoAlgorithmCfg:
    """Reference ``RslRlPpoAlgorithmCfg`` (rl_cfg.py:108-164)."""

    class_name: str = "PPO"
    value_loss_coef: float = 1.0
    use_clipped_value_loss: bool = True
    clip_param: float = 0.2
    entropy_coef: float = 0.005
    num_learning_epochs: int = 5
    num_mini_batches: int = 4
    learning_rate: float = 1e-3
    schedule: str = "adaptive"
    gamma: float = 0.99
    lam: float = 0.95
    desired_kl: float = 0.01
    max_grad_norm: float = 1.0
    normalize_advantage_per_mini_batch: bool = False
    rnd_cfg: object = None  # RslRlRndCfg | None
    symmetry_cfg: object = None  # RslRlSymmetryCfg | None


@configclass
class RslRlPpoCascadeAlgorithmCfg(RslRlPpoAlgorithmCfg):
    """Fork's PPOCA variant (reference rl_cfg.py:166-170; fork also names it
    RslRlPpoCaAlgorithmCfg)."""

    class_name: str = "PPOCA"
    cascade_loss_coef: float = 1.0


# fork alias (reference agents import the Ca spelling)
RslRlPpoCaAlgorithmCfg = RslRlPpoCascadeAlgorithmCfg


@configclass
class RslRlOnPolicyRunnerCfg:
    """Reference ``RslRlOnPolicyRunnerCfg`` (rl_cfg.py:179)."""

    seed: int = 42
    device: str = "tpu"
    num_steps_per_env: int = 24
    max_iterations: int = MISSING
    empirical_normalization: bool = False
    policy: RslRlPpoActorCriticCfg = MISSING
    algorithm: RslRlPpoAlgorithmCfg = MISSING
    save_interval: int = 50
    experiment_name: str = MISSING
    run_name: str = ""
    logger: str = "tensorboard"
    resume: bool = False
    load_run: str = ".*"
    load_checkpoint: str = "model_.*.pt"


@configclass
class RslRlRndCfg:
    """Random Network Distillation exploration bonus (reference rsl-rl
    RndCfg consumed via RslRlPpoAlgorithmCfg.rnd_cfg)."""

    weight: float = 0.0  # intrinsic reward weight
    learning_rate: float = 1e-3
    num_outputs: int = 64  # embedding dim
    predictor_hidden_dims: list = [128, 128]
    target_hidden_dims: list = [128, 128]
    # "constant" | "step": weight schedule (reference supports schedules;
    # constant here)
    weight_schedule: str = "constant"


@configclass
class RslRlSymmetryCfg:
    """Symmetry-based data augmentation (reference rsl-rl SymmetryCfg).

    ``data_augmentation_func(obs, actions, env) -> (obs_aug, act_aug)``
    returns mirrored copies stacked on the batch axis."""

    use_data_augmentation: bool = False
    use_mirror_loss: bool = False
    data_augmentation_func: object = None
    mirror_loss_coeff: float = 0.0


@configclass
class RslRlDistillationAlgorithmCfg:
    """Student-teacher distillation (reference rsl-rl Distillation cfg)."""

    class_name: str = "Distillation"
    num_learning_epochs: int = 1
    learning_rate: float = 1e-3
    gradient_length: int = 15
    max_grad_norm: float = 1.0


@configclass
class RslRlDistillationStudentTeacherCfg:
    """Reference ``RslRlDistillationStudentTeacherCfg``."""

    class_name: str = "StudentTeacher"
    init_noise_std: float = 0.1
    student_hidden_dims: list = [256, 256, 128]
    teacher_hidden_dims: list = [256, 256, 128]
    activation: str = "elu"
