"""Multi-agent direct environment (reference ``envs/direct_marl_env.py``).

PettingZoo-parallel-style: per-agent action/obs/reward/done dicts, central
``state()`` (reference :417-432); convertible to single-agent via
:func:`multi_agent_to_single_agent` (reference envs/utils/marl.py).
"""

from __future__ import annotations

from dataclasses import MISSING

import jax
import jax.numpy as jnp

from ..utils.configclass import configclass
from .direct_rl_env import DirectEnvState, DirectRLEnv, DirectRLEnvCfg, _space_dim


@configclass
class DirectMARLEnvCfg(DirectRLEnvCfg):
    """Reference ``DirectMARLEnvCfg``: per-agent spaces."""

    possible_agents: list = MISSING
    action_spaces: dict = MISSING  # agent -> dim
    observation_spaces: dict = MISSING
    observation_space: object = 0  # unused in MARL
    action_space: object = 0


class DirectMARLEnv(DirectRLEnv):
    """Subclasses implement per-agent hooks returning dicts keyed by agent."""

    def __init__(self, cfg: DirectMARLEnvCfg, **kwargs):
        self.possible_agents = list(cfg.possible_agents)
        self.agents = list(cfg.possible_agents)
        cfg.action_space = sum(_space_dim(v) for v in cfg.action_spaces.values())
        cfg.observation_space = sum(
            _space_dim(v) for v in cfg.observation_spaces.values()
        )
        super().__init__(cfg, **kwargs)
        self._action_dims = {
            a: _space_dim(cfg.action_spaces[a]) for a in self.possible_agents
        }

    # -- per-agent hooks --
    def _get_observations(self, state) -> dict:
        """Returns {agent: obs}."""
        raise NotImplementedError

    def _get_rewards(self, state) -> dict:
        raise NotImplementedError

    def _get_dones(self, state):
        """Returns ({agent: terminated}, {agent: time_out})."""
        raise NotImplementedError

    def state(self, env_state) -> jnp.ndarray:
        """Central critic state (reference direct_marl_env.py:417-432)."""
        obs = self._get_observations(env_state)
        return jnp.concatenate(
            [obs[a].reshape(obs[a].shape[0], -1) for a in self.possible_agents],
            axis=-1,
        )

    def _split_actions(self, flat) -> dict:
        out = {}
        idx = 0
        for a in self.possible_agents:
            d = self._action_dims[a]
            out[a] = flat[:, idx : idx + d]
            idx += d
        return out

    def _join_agent_dict(self, d: dict, reduce="or"):
        vals = [d[a] for a in self.possible_agents]
        if reduce == "or":
            out = vals[0]
            for v in vals[1:]:
                out = out | v
            return out
        return jnp.stack(vals, axis=-1)

    def step_state(self, state: DirectEnvState, action):
        """MARL step: action may be a dict or flat; outputs per-agent dicts."""
        if isinstance(action, dict):
            flat = jnp.concatenate(
                [action[a] for a in self.possible_agents], axis=-1
            )
        else:
            flat = action
        key, _ = jax.random.split(state.key)
        state = state._replace(key=key, prev_actions=state.actions)
        state = self._pre_physics_step(state, flat)

        # narrow carry (see direct_rl_env.step_state)
        def _substep(carry, _):
            phys, entities, user = carry
            st = state._replace(
                scene=state.scene._replace(phys=phys, entities=entities),
                user=user,
            )
            st = self._apply_action(st)
            sc = self.scene.step_physics(st.scene, self.physics_dt)
            return (sc.phys, sc.entities, st.user), None

        (phys, entities, user), _ = jax.lax.scan(
            _substep,
            (state.scene.phys, state.scene.entities, state.user),
            None,
            length=int(self.cfg.decimation),
        )
        state = state._replace(
            scene=state.scene._replace(phys=phys, entities=entities),
            user=user,
        )
        state = state._replace(
            scene=self._update_sensors(state.scene),
            episode_length=state.episode_length + 1,
            common_step=state.common_step + 1,
        )
        terminated_d, time_out_d = self._get_dones(state)
        rewards_d = self._get_rewards(state)
        died = self._join_agent_dict(terminated_d)
        time_out = self._join_agent_dict(time_out_d)
        reset_mask = died | time_out
        state = self._reset_idx(state, reset_mask)
        state = state._replace(
            episode_length=jnp.where(reset_mask, 0, state.episode_length)
        )
        obs_d = self._get_observations(state)
        extras = {"log": {}, "time_outs": time_out_d}
        return state, (obs_d, rewards_d, terminated_d, time_out_d, extras)


def multi_agent_to_single_agent(env: DirectMARLEnv):
    """Wrap a MARL env as a single-agent env with concatenated spaces
    (reference envs/utils/marl.py)."""

    class _SingleAgentView:
        def __init__(self, menv):
            self.env = menv
            self.num_envs = menv.num_envs
            self.unwrapped = self

        def __getattr__(self, item):
            return getattr(self.env, item)

        def step_state(self, state, action):
            state, (obs_d, rew_d, term_d, to_d, extras) = self.env.step_state(
                state, action
            )
            obs = jnp.concatenate(
                [obs_d[a] for a in self.env.possible_agents], axis=-1
            )
            rew = sum(rew_d[a] for a in self.env.possible_agents)
            term = self.env._join_agent_dict(term_d)
            to = self.env._join_agent_dict(to_d)
            return state, ({"policy": obs}, rew, term, to, extras)

    return _SingleAgentView(env)
