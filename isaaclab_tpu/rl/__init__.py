"""RL stack (reference ``source/isaaclab_rl/`` + in-repo rsl-rl replacement)."""

from .networks import (  # noqa: F401
    ActorCritic,
    ActorCriticCascade,
    ActorCriticRecurrent,
    NormalizerState,
)
from .ppo import Transition, compute_gae, ppo_update  # noqa: F401
from .rl_cfg import (  # noqa: F401
    RslRlDistillationAlgorithmCfg,
    RslRlDistillationStudentTeacherCfg,
    RslRlOnPolicyRunnerCfg,
    RslRlPpoActorCriticCascadeCfg,
    RslRlPpoActorCriticCfg,
    RslRlPpoActorCriticRecurrentCfg,
    RslRlPpoAlgorithmCfg,
    RslRlPpoCaAlgorithmCfg,
    RslRlPpoCascadeAlgorithmCfg,
    RslRlRndCfg,
    RslRlSymmetryCfg,
)
from .amp import AmpCfg, AMPOnPolicyRunner  # noqa: F401
from .distillation import DistillationRunner, DistillState  # noqa: F401
from .runner import OnPolicyRunner, TrainState  # noqa: F401
from .vecenv_wrapper import RslRlVecEnvWrapper  # noqa: F401
from .adapters import (  # noqa: F401
    RlGamesVecEnvWrapper,
    Sb3VecEnvWrapper,
    SkrlVecEnvWrapper,
)
from .exporter import (  # noqa: F401
    export_policy_as_jax,
    export_policy_as_jit,
    export_policy_as_onnx,
)
