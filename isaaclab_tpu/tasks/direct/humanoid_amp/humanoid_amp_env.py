"""Humanoid AMP env (reference ``direct/humanoid_amp/humanoid_amp_env.py``):
motion-imitation humanoid — the task reward is tiny (alive/forward), the
learning signal comes from the AMP discriminator's style reward computed over
``extras["log"]["amp_obs"]`` windows (consumed by
:class:`isaaclab_tpu.rl.amp.AMPOnPolicyRunner`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ....utils.configclass import configclass
from ..humanoid.humanoid_env import HumanoidDirectEnv, HumanoidDirectEnvCfg
from .motions import ProceduralMotionLoader


@configclass
class HumanoidAmpEnvCfg(HumanoidDirectEnvCfg):
    """Reference HumanoidAmpEnvCfg (walk/run/dance variants via motion_style)."""

    motion_style: str = "walk"
    num_amp_observations: int = 2
    termination_height: float = 0.5
    episode_length_s: float = 10.0


class HumanoidAmpEnv(HumanoidDirectEnv):
    cfg: HumanoidAmpEnvCfg

    def __init__(self, cfg, **kwargs):
        super().__init__(cfg, **kwargs)
        self.motion_loader = ProceduralMotionLoader(
            num_joints=self._robot.num_joints, style=cfg.motion_style,
            dt=self.step_dt,
        )
        self.amp_observation_space = self.motion_loader.frame_dim
        self.amp_observation_size = (
            cfg.num_amp_observations * self.amp_observation_space
        )

    def collect_reference_motions(self, num_samples: int, rng=None):
        """(num_samples, amp_observation_size) reference windows
        (reference humanoid_amp_env.py:175)."""
        return self.motion_loader.sample(
            num_samples, self.cfg.num_amp_observations, rng
        )

    def _init_user_state(self):
        return {
            "amp_buffer": jnp.zeros(
                (
                    self.num_envs,
                    self.cfg.num_amp_observations,
                    self.amp_observation_space,
                )
            ),
        }

    def _amp_frame(self, state):
        data = self._views(state)
        est = state.scene.entities["robot"]
        return jnp.concatenate(
            [
                data.joint_pos,
                data.joint_vel,
                data.root_pos_w[:, 2:3],
                data.root_lin_vel_b,
                data.root_ang_vel_b,
            ],
            axis=-1,
        )

    def step_state(self, state, action):
        state, (obs, reward, died, time_out, extras) = super().step_state(
            state, action
        )
        # shift the AMP window and insert the current frame
        frame = self._amp_frame(state)
        buf = state.user["amp_buffer"]
        buf = jnp.concatenate([frame[:, None], buf[:, :-1]], axis=1)
        state = state._replace(user={**state.user, "amp_buffer": buf})
        extras = dict(extras)
        extras["log"] = {
            **extras.get("log", {}),
            "amp_obs": buf.reshape(self.num_envs, -1),
        }
        return state, (obs, reward, died, time_out, extras)

    def _get_rewards(self, state):
        # tiny task reward; style reward comes from the discriminator
        return jnp.ones(self.num_envs) * 0.1
