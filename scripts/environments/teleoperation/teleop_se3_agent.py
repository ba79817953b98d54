#!/usr/bin/env python
"""Keyboard SE(3) teleoperation of a manipulation task (reference
``scripts/environments/teleoperation/teleop_se3_agent.py``): device deltas
drive the task's IK arm action; demos can be recorded through the recorder
manager."""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
)

from isaaclab_tpu.app import AppLauncher  # noqa: E402

parser = argparse.ArgumentParser(description="SE(3) keyboard teleop.")
parser.add_argument("--task", type=str, default="Isaac-Lift-Cube-Franka-IK-Rel-v0")
parser.add_argument("--num_envs", type=int, default=1)
parser.add_argument("--teleop_device", type=str, default="keyboard",
                    choices=["keyboard", "gamepad", "spacemouse"])
parser.add_argument("--sensitivity", type=float, default=1.0)
parser.add_argument("--num_steps", type=int, default=0,
                    help="0 = run until interrupted")
AppLauncher.add_app_launcher_args(parser)
args_cli, _ = parser.parse_known_args()
app_launcher = AppLauncher(args_cli)


def main():
    import gymnasium as gym
    import numpy as np

    import isaaclab_tpu.tasks  # noqa: F401
    from isaaclab_tpu.devices import Se3Gamepad, Se3Keyboard, Se3SpaceMouse
    from isaaclab_tpu.tasks.utils import parse_env_cfg

    env_cfg = parse_env_cfg(args_cli.task, num_envs=args_cli.num_envs)
    env = gym.make(args_cli.task, cfg=env_cfg).unwrapped
    device_cls = {
        "keyboard": Se3Keyboard,
        "gamepad": Se3Gamepad,
        "spacemouse": Se3SpaceMouse,
    }[args_cli.teleop_device]
    device = device_cls(
        pos_sensitivity=0.05 * args_cli.sensitivity,
        rot_sensitivity=0.2 * args_cli.sensitivity,
    )
    print(getattr(device, "help_str", "keys: wasdqe move, ijkl rotate, g grip"))
    obs, _ = env.reset()
    A = env.action_manager.total_action_dim
    step = 0
    try:
        while args_cli.num_steps <= 0 or step < args_cli.num_steps:
            adv = device.advance()
            if isinstance(adv, tuple):  # keyboard: (delta6, close_gripper)
                delta = np.concatenate(
                    [np.asarray(adv[0], dtype=np.float32),
                     np.asarray([-1.0 if adv[1] else 1.0], dtype=np.float32)]
                )
            else:
                delta = np.asarray(adv, dtype=np.float32)
            action = np.zeros((env.num_envs, A), dtype=np.float32)
            n = min(A, delta.shape[0])
            action[:, :n] = delta[:n]
            obs, rew, term, trunc, _ = env.step(action)
            step += 1
    except KeyboardInterrupt:
        pass
    env.close()


if __name__ == "__main__":
    main()
