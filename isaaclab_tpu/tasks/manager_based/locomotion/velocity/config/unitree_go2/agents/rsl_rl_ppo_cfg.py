"""Go2 PPO configs (reference velocity/config/go2/agents)."""

from isaaclab_tpu.utils import configclass

from ...anymal_c.agents.rsl_rl_ppo_cfg import (
    AnymalCFlatPPORunnerCfg,
    AnymalCRoughPPORunnerCfg,
)


@configclass
class Go2RoughPPORunnerCfg(AnymalCRoughPPORunnerCfg):
    experiment_name = "unitree_go2_rough"


@configclass
class Go2FlatPPORunnerCfg(AnymalCFlatPPORunnerCfg):
    experiment_name = "unitree_go2_flat"
