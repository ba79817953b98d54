from . import rsl_rl_ppo_cfg  # noqa: F401
