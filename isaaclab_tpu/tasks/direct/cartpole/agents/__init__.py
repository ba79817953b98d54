"""Agent configs for the direct cartpole task (reference
``direct/cartpole/agents/``)."""

from .rsl_rl_ppo_cfg import CartpoleDirectPPORunnerCfg
