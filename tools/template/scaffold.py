#!/usr/bin/env python
"""External-project scaffolder (reference ``isaaclab.sh --new`` /
``tools/template/``): generates a minimal out-of-tree task package that
registers against isaaclab_tpu."""

import argparse
import os
import sys

TEMPLATE_INIT = '''"""{name}: an external isaaclab_tpu task package."""

import gymnasium as gym

from .{task_module} import {cls_prefix}EnvCfg

gym.register(
    id="{task_id}",
    entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
    disable_env_checker=True,
    kwargs={{"env_cfg_entry_point": {cls_prefix}EnvCfg}},
)
'''

TEMPLATE_ENV = '''"""Task config for {task_id}. Edit the scene/managers to taste."""

from isaaclab_tpu.assets_presets.cartpole import CARTPOLE_CFG
from isaaclab_tpu.envs import ManagerBasedRLEnvCfg, mdp
from isaaclab_tpu.managers import (
    ObservationGroupCfg as ObsGroup,
    ObservationTermCfg as ObsTerm,
    RewardTermCfg as RewTerm,
    TerminationTermCfg as DoneTerm,
)
from isaaclab_tpu.scene import InteractiveSceneCfg
from isaaclab_tpu.utils import configclass


@configclass
class SceneCfg(InteractiveSceneCfg):
    robot = CARTPOLE_CFG


@configclass
class ActionsCfg:
    joint_effort = mdp.JointEffortActionCfg(
        asset_name="robot", joint_names=["slider_to_cart"], scale=100.0
    )


@configclass
class ObservationsCfg:
    @configclass
    class PolicyCfg(ObsGroup):
        joint_pos = ObsTerm(func=mdp.joint_pos_rel)
        joint_vel = ObsTerm(func=mdp.joint_vel_rel)

    policy: PolicyCfg = PolicyCfg()


@configclass
class RewardsCfg:
    alive = RewTerm(func=mdp.is_alive, weight=1.0)


@configclass
class TerminationsCfg:
    time_out = DoneTerm(func=mdp.time_out, time_out=True)


@configclass
class {cls_prefix}EnvCfg(ManagerBasedRLEnvCfg):
    scene: SceneCfg = SceneCfg(num_envs=1024, env_spacing=4.0)
    observations: ObservationsCfg = ObservationsCfg()
    actions: ActionsCfg = ActionsCfg()
    rewards: RewardsCfg = RewardsCfg()
    terminations: TerminationsCfg = TerminationsCfg()
    events = None

    def __post_init__(self):
        self.decimation = 2
        self.episode_length_s = 5.0
        self.sim.dt = 0.005
'''


def main():
    parser = argparse.ArgumentParser(description="Scaffold an external task package.")
    parser.add_argument("name", help="package name, e.g. my_tasks")
    parser.add_argument("--task-id", default=None, help="gym id to register")
    parser.add_argument("--dir", default=".", help="parent directory")
    args = parser.parse_args()
    name = args.name
    task_id = args.task_id or f"Ext-{name.replace('_', '-').title()}-v0"
    cls_prefix = "".join(p.title() for p in name.split("_"))
    pkg = os.path.join(args.dir, name)
    os.makedirs(pkg, exist_ok=True)
    task_module = f"{name}_env_cfg"
    with open(os.path.join(pkg, "__init__.py"), "w") as f:
        f.write(TEMPLATE_INIT.format(
            name=name, task_module=task_module, cls_prefix=cls_prefix,
            task_id=task_id,
        ))
    with open(os.path.join(pkg, f"{task_module}.py"), "w") as f:
        f.write(TEMPLATE_ENV.format(task_id=task_id, cls_prefix=cls_prefix))
    print(f"scaffolded {pkg} registering '{task_id}'")
    print(f"train: ./isaaclab.sh -p scripts/reinforcement_learning/rsl_rl/"
          f"train.py --task {task_id}  (import {name} first)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
