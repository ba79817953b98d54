"""Direct-workflow RL environment (reference ``envs/direct_rl_env.py``).

Single-file tasks override pure hooks (reference :606-670):
``_setup_scene`` / ``_pre_physics_step`` / ``_apply_action`` /
``_get_observations`` / ``_get_rewards`` / ``_get_dones`` / ``_reset_idx``.
Hooks receive and return explicit state (the TPU-functional recast of the
reference's attribute mutation); per-task scratch lives in ``state.user``.

FORK PARITY: ``_get_dones`` may return either the standard
``(died, time_out)`` or the fork's 5-tuple ``(died, height, lidar, velocity,
time_out)`` with termination-cause telemetry (reference direct_rl_env.py:
366-371 fork change) — extra causes are surfaced in ``extras``.
"""

from __future__ import annotations

from dataclasses import MISSING
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..managers import EventManager, EventManagerState
from ..scene import InteractiveScene, InteractiveSceneCfg, SceneState
from ..sim.simulation_cfg import SimulationCfg
from ..utils.configclass import configclass
from ..utils.noise import NoiseModelCfg


@configclass
class DirectRLEnvCfg:
    """Reference ``DirectRLEnvCfg`` (envs/direct_rl_env_cfg.py)."""

    viewer: object = None
    sim: SimulationCfg = SimulationCfg()
    decimation: int = MISSING
    scene: InteractiveSceneCfg = MISSING
    episode_length_s: float = MISSING
    # spaces: ints (flat dims) or gymnasium space objects
    observation_space: object = MISSING
    action_space: object = MISSING
    state_space: object = 0
    observation_noise_model: NoiseModelCfg = None
    action_noise_model: NoiseModelCfg = None
    events: object = None
    seed: int = None
    rerender_on_reset: bool = False


class DirectEnvState(NamedTuple):
    scene: SceneState
    episode_length: jax.Array
    common_step: jax.Array
    key: jax.Array
    actions: jax.Array  # (E, A) processed actions
    prev_actions: jax.Array
    events: EventManagerState
    noise: dict  # noise-model states
    user: dict  # subclass scratch (must keep a stable pytree structure)


import gymnasium as gym


class DirectRLEnv(gym.Env):
    """Reference ``DirectRLEnv``: same decimated loop (direct_rl_env.py:
    345-359) with masked auto-reset, fully jittable."""

    is_vector_env = True
    metadata = {"render_modes": [None], "isaac_sim_version": "tpu"}

    def __init__(self, cfg: DirectRLEnvCfg, render_mode: str | None = None, **kwargs):
        self.cfg = cfg
        self.render_mode = render_mode
        self.scene = InteractiveScene(cfg.scene, cfg.sim)
        self.num_envs = self.scene.num_envs
        self.physics_dt = float(cfg.sim.dt)
        self.step_dt = float(cfg.sim.dt * cfg.decimation)
        self._seed = cfg.seed if cfg.seed is not None else 0
        self.event_manager = EventManager(cfg.events, self) if cfg.events else None
        self._setup_scene()
        self.num_actions = _space_dim(cfg.action_space)
        self.num_observations = _space_dim(cfg.observation_space)
        self.num_states = _space_dim(cfg.state_space)
        import numpy as _np

        # honor real gymnasium space objects (the reference's space-showcase
        # tasks exercise Box/Discrete/MultiDiscrete/Dict/Tuple spaces —
        # direct_rl_env.py _configure_gym_env_spaces)
        if isinstance(cfg.observation_space, gym.spaces.Space):
            obs_space = cfg.observation_space
        else:
            obs_space = gym.spaces.Box(
                -_np.inf, _np.inf, (self.num_observations,)
            )
        self.single_observation_space = gym.spaces.Dict({"policy": obs_space})
        if isinstance(cfg.action_space, gym.spaces.Space):
            self.single_action_space = cfg.action_space
        else:
            self.single_action_space = gym.spaces.Box(
                -_np.inf, _np.inf, (self.num_actions,)
            )
        self.observation_space = gym.vector.utils.batch_space(
            self.single_observation_space, self.num_envs
        )
        self.action_space = gym.vector.utils.batch_space(
            self.single_action_space, self.num_envs
        )
        self._state: DirectEnvState | None = None
        self._jit_step = None

    # ------------------------------------------------------------------
    @property
    def unwrapped(self):
        return self

    @property
    def max_episode_length_s(self) -> float:
        return float(self.cfg.episode_length_s)

    @property
    def max_episode_length(self) -> int:
        return int(np.ceil(self.max_episode_length_s / self.step_dt))

    def seed(self, seed: int = -1):
        if seed >= 0:
            self._seed = seed
        return self._seed

    # ------------------------------------------------------------------
    # Hooks for subclasses (reference direct_rl_env.py:606-670)
    # ------------------------------------------------------------------
    def _setup_scene(self):
        pass

    def _init_user_state(self) -> dict:
        return {}

    def _pre_physics_step(self, state: DirectEnvState, actions) -> DirectEnvState:
        return state._replace(actions=actions)

    def _apply_action(self, state: DirectEnvState) -> DirectEnvState:
        return state

    def _get_observations(self, state: DirectEnvState) -> dict:
        raise NotImplementedError

    def _get_states(self, state: DirectEnvState):
        """Central critic state (asymmetric actor-critic); default: none."""
        return None

    def _get_rewards(self, state: DirectEnvState):
        raise NotImplementedError

    def _get_dones(self, state: DirectEnvState):
        raise NotImplementedError

    def _reset_idx(self, state: DirectEnvState, mask) -> DirectEnvState:
        key, k_scene = jax.random.split(state.key)
        scene_state = self.scene.reset_state(state.scene, mask, key=k_scene)
        return state._replace(scene=scene_state, key=key)

    # ------------------------------------------------------------------
    def init_state(self, key=None) -> DirectEnvState:
        key = key if key is not None else jax.random.PRNGKey(self._seed)
        k_ev, key = jax.random.split(key)
        scene_state = self.scene.init_state()
        ev_state = (
            self.event_manager.init_state(self.num_envs, k_ev)
            if self.event_manager
            else EventManagerState(interval_time_left={}, last_reset_step={})
        )
        noise = {}
        if self.cfg.action_noise_model:
            noise["action"] = self.cfg.action_noise_model.init_state(
                self.num_envs, self.num_actions
            )
        if self.cfg.observation_noise_model:
            noise["obs"] = self.cfg.observation_noise_model.init_state(
                self.num_envs, self.num_observations
            )
        state = DirectEnvState(
            scene=scene_state,
            episode_length=jnp.zeros(self.num_envs, dtype=jnp.int32),
            common_step=jnp.zeros((), dtype=jnp.int32),
            key=key,
            actions=jnp.zeros((self.num_envs, self.num_actions)),
            prev_actions=jnp.zeros((self.num_envs, self.num_actions)),
            events=ev_state,
            noise=noise,
            user=self._init_user_state(),
        )
        # full reset of all envs via the task hook
        state = self._reset_idx(state, jnp.ones(self.num_envs, dtype=bool))
        state = state._replace(scene=self._update_sensors(state.scene))
        return state

    def _update_sensors(self, scene_state: SceneState) -> SceneState:
        new_sensors = dict(scene_state.sensors)
        for name, sensor in self.scene.sensors.items():
            new_sensors[name] = sensor.update(
                new_sensors.get(name), scene_state, self.step_dt
            )
        return scene_state._replace(sensors=new_sensors)

    # ------------------------------------------------------------------
    def step_state(self, state: DirectEnvState, action):
        """Reference direct_rl_env.py:308-399 order, pure."""
        cfg = self.cfg
        key, k_noise = jax.random.split(state.key)
        state = state._replace(key=key, prev_actions=state.actions)
        if cfg.action_noise_model:
            action = cfg.action_noise_model.apply(
                state.noise["action"], k_noise, action
            )
        state = self._pre_physics_step(state, action)

        # narrow carry: phys + entity states + user (apply-action hooks may
        # update controller/motor states in ``user``, e.g. quadcopter) —
        # everything else in EnvState is loop-invariant and carrying it
        # made XLA copy dozens of unchanged buffers per substep
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
            length=int(cfg.decimation),
        )
        state = state._replace(
            scene=state.scene._replace(phys=phys, entities=entities),
            user=user,
        )
        state = state._replace(scene=self._update_sensors(state.scene))

        state = state._replace(
            episode_length=state.episode_length + 1,
            common_step=state.common_step + 1,
        )

        dones = self._get_dones(state)
        extras = {}
        if isinstance(dones, tuple) and len(dones) == 5:
            died, r_height, r_lidar, r_velocity, time_out = dones
            died = died | r_height | r_lidar | r_velocity
            extras["reset_height"] = r_height
            extras["reset_lidar"] = r_lidar
            extras["reset_velocity"] = r_velocity
        else:
            died, time_out = dones
        reward = self._get_rewards(state)

        reset_mask = died | time_out
        state = self._reset_idx(state, reset_mask)
        state = state._replace(
            episode_length=jnp.where(reset_mask, 0, state.episode_length),
            actions=jnp.where(reset_mask[:, None], 0.0, state.actions),
            prev_actions=jnp.where(reset_mask[:, None], 0.0, state.prev_actions),
        )

        # interval events
        if self.event_manager and "interval" in self.event_manager.available_modes:
            key, sub = jax.random.split(state.key)
            ctx = _DirectCtx(self, state)
            scene_state, ev_state = self.event_manager.apply_interval(
                ctx, state.scene, state.events, sub, self.step_dt
            )
            state = state._replace(scene=scene_state, events=ev_state, key=key)

        obs = self._get_observations(state)
        if cfg.observation_noise_model and "policy" in obs:
            key, k_on = jax.random.split(state.key)
            obs = dict(obs)
            obs["policy"] = cfg.observation_noise_model.apply(
                state.noise["obs"], k_on, obs["policy"]
            )
            state = state._replace(key=key)
        extras["time_outs"] = time_out
        extras["log"] = {}
        return state, (obs, reward, died, time_out, extras)

    # ------------------------------------------------------------------
    # Host-facing gym API
    # ------------------------------------------------------------------
    def reset(self, seed: int | None = None, options: dict | None = None):
        if seed is not None:
            self._seed = seed

        def _reset_impl(key):
            state = self.init_state(key)
            return state, self._get_observations(state)

        self._state, obs = jax.jit(_reset_impl)(jax.random.PRNGKey(self._seed))
        return obs, {}

    def step(self, action):
        if self._state is None:
            self.reset()
        if self._jit_step is None:
            self._jit_step = jax.jit(self.step_state)
        self._state, out = self._jit_step(self._state, jnp.asarray(action))
        return out

    def close(self):
        pass


class _DirectCtx:
    """Minimal context for event terms inside direct envs."""

    def __init__(self, env, state):
        self._env = env
        self.state = state
        self.num_envs = env.num_envs
        self.step_dt = env.step_dt
        views, kin = env.scene.data_views(state.scene, env.physics_dt)
        from .manager_based_env import _SceneView

        self.scene = _SceneView(env.scene, views, state)


def _space_dim(space) -> int:
    if isinstance(space, int):
        return space
    if isinstance(space, gym.spaces.Dict):
        return sum(_space_dim(s) for s in space.spaces.values())
    if isinstance(space, gym.spaces.Tuple):
        return sum(_space_dim(s) for s in space.spaces)
    if isinstance(space, gym.spaces.MultiDiscrete):
        return len(space.nvec)
    if isinstance(space, gym.spaces.Discrete):
        return 1
    if hasattr(space, "shape") and space.shape is not None:
        out = 1
        for s in space.shape:
            out *= s
        return out
    if hasattr(space, "n"):
        return int(space.n)
    raise ValueError(f"Cannot infer dim from space {space}")
