"""Manager-based workflow environments.

TPU-native counterparts of the reference ``ManagerBasedEnv`` /
``ManagerBasedRLEnv`` (``envs/manager_based_env.py``,
``envs/manager_based_rl_env.py``): the whole step — decimated physics loop,
managers, masked auto-reset — compiles to ONE jitted function over an
:class:`EnvState` pytree (the reference's data-dependent ``nonzero()`` partial
reset at manager_based_rl_env.py:215 becomes an unconditional ``where``-masked
reset; SURVEY.md §3.2 TPU note). The host-facing class keeps the gym-style
``step``/``reset`` API by carrying the state internally.
"""

from __future__ import annotations

from dataclasses import MISSING
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..managers import (
    ActionManager,
    ActionManagerState,
    CommandManager,
    CurriculumManager,
    EventManager,
    EventManagerState,
    ObservationManager,
    ObservationManagerState,
    RecorderManager,
    RewardManager,
    RewardManagerState,
    TerminationManager,
)
import gymnasium as gym

from ..scene import InteractiveScene, InteractiveSceneCfg, SceneState
from ..sim.simulation_cfg import SimulationCfg
from ..utils.configclass import configclass


@configclass
class DefaultEventManagerCfg:
    """Empty event cfg (reference manager_based_env.py default)."""

    pass


@configclass
class ManagerBasedEnvCfg:
    """Reference ``ManagerBasedEnvCfg`` (envs/manager_based_env_cfg.py)."""

    viewer: object = None
    sim: SimulationCfg = SimulationCfg()
    decimation: int = MISSING
    scene: InteractiveSceneCfg = MISSING
    observations: object = MISSING
    actions: object = MISSING
    events: object = DefaultEventManagerCfg()
    recorders: object = None
    seed: int = None
    rerender_on_reset: bool = False


@configclass
class ManagerBasedRLEnvCfg(ManagerBasedEnvCfg):
    """Reference ``ManagerBasedRLEnvCfg``."""

    episode_length_s: float = MISSING
    is_finite_horizon: bool = False
    rewards: object = MISSING
    terminations: object = MISSING
    commands: object = None
    curriculum: object = None


class EnvState(NamedTuple):
    """Full per-env-batch dynamic state: one pytree through ``lax.scan``."""

    scene: SceneState
    episode_length: jax.Array  # (E,) int32
    common_step: jax.Array  # () int32
    key: jax.Array  # PRNGKey
    actions: ActionManagerState
    obs: ObservationManagerState
    rewards: RewardManagerState
    commands: dict
    events: EventManagerState
    curriculum: dict
    metrics: dict  # running log values (episodic means etc.)


class EnvContext:
    """The ``env`` object manager term functions receive — a per-trace view
    binding the host env (static cfg/managers) to the current state arrays."""

    def __init__(self, env, state: EnvState, data_views, kin):
        self._env = env
        self.state = state
        self.scene = _SceneView(env.scene, data_views, state)
        self.kin = kin
        self.num_envs = env.num_envs
        self.step_dt = env.step_dt
        self.physics_dt = env.physics_dt
        self.max_episode_length = getattr(env, "max_episode_length", 0)
        self.max_episode_length_s = getattr(env, "max_episode_length_s", 0.0)
        self.episode_length_buf = state.episode_length
        self.common_step_counter = state.common_step
        self.command_manager = _CommandView(env.command_manager, state.commands) \
            if getattr(env, "command_manager", None) else None
        self.action_manager = _ActionView(state.actions)
        self.observation_manager = getattr(env, "observation_manager", None)
        self.device = "tpu"

    @property
    def cfg(self):
        return self._env.cfg


class _SceneView:
    """ctx.scene: __getitem__ returns data views for entities, facades for
    sensors; mirrors reference ``env.scene[...]`` usage in mdp terms."""

    def __init__(self, scene: InteractiveScene, data_views, state: EnvState):
        self._scene = scene
        self._views = data_views
        self._state = state

    def __getitem__(self, name: str):
        if name in self._views:
            return _EntityView(
                self._scene.articulations.get(name)
                or self._scene.rigid_objects.get(name)
                or self._scene.rigid_object_collections.get(name),
                self._views[name],
            )
        if name in self._scene.sensors:
            sensor = self._scene.sensors[name]
            return _SensorView(sensor, self._state.scene.sensors.get(name))
        raise KeyError(name)

    @property
    def env_origins(self):
        return self._scene.env_origins

    @property
    def terrain(self):
        return self._scene.terrain

    @property
    def num_envs(self):
        return self._scene.num_envs


class _EntityView:
    """Pairs an asset facade (static queries) with its current data view."""

    def __init__(self, facade, data):
        self._facade = facade
        self.data = data

    def __getattr__(self, item):
        return getattr(self._facade, item)


class _SensorView:
    def __init__(self, sensor, state):
        self._sensor = sensor
        self._state = state

    @property
    def data(self):
        return self._sensor.data_view(self._state)

    def __getattr__(self, item):
        return getattr(self._sensor, item)


class _CommandView:
    def __init__(self, manager: CommandManager, cmd_state: dict):
        self._manager = manager
        self._state = cmd_state

    def get_command(self, name: str):
        return self._manager.get_command(self._state, name)

    def get_term(self, name: str):
        return self._manager.get_term(name)

    def get_term_state(self, name: str):
        """Full CommandTermState (command + timers + term extras) — used by
        terms that read command-term bookkeeping (e.g. consecutive-success
        counters, reference command_manager metrics)."""
        return self._state[name]


class _ActionView:
    def __init__(self, am_state: ActionManagerState):
        self.action = am_state.action
        self.prev_action = am_state.prev_action


class ManagerBasedEnv(gym.Env):
    """Reference ``ManagerBasedEnv``: scene + obs/action/event managers."""

    is_vector_env = True
    metadata = {"render_modes": [None], "isaac_sim_version": "tpu"}

    def __init__(self, cfg: ManagerBasedEnvCfg, **kwargs):
        self.cfg = cfg
        self.render_mode = None
        self.sim_cfg = cfg.sim
        self.scene = InteractiveScene(cfg.scene, cfg.sim)
        self.num_envs = self.scene.num_envs
        self.physics_dt = float(cfg.sim.dt)
        self.step_dt = float(cfg.sim.dt * cfg.decimation)
        self._seed = cfg.seed if cfg.seed is not None else 0

        self.load_managers()
        self.recorder_manager = RecorderManager(cfg.recorders, self)
        self._state: EnvState | None = None
        self._jit_step = None
        self._jit_reset = None

    # ------------------------------------------------------------------
    def load_managers(self):
        """Reference manager_based_env.py:217 ordering."""
        self.observation_manager = ObservationManager(self.cfg.observations, self)
        self.action_manager = ActionManager(self.cfg.actions, self)
        self.event_manager = EventManager(self.cfg.events, self)

    # ------------------------------------------------------------------
    @property
    def unwrapped(self):
        return self

    @property
    def device(self):
        return "tpu"

    def seed(self, seed: int = -1):
        if seed >= 0:
            self._seed = seed
        return self._seed

    # ------------------------------------------------------------------
    # Pure-functional core
    # ------------------------------------------------------------------
    def make_context(self, state: EnvState) -> EnvContext:
        views, kin = self.scene.data_views(state.scene, self.physics_dt)
        return EnvContext(self, state, views, kin)

    def init_state(self, key=None) -> EnvState:
        key = key if key is not None else jax.random.PRNGKey(self._seed)
        scene_state = self.scene.init_state()
        k_ev, k_st, key = jax.random.split(key, 3)
        ev_state = self.event_manager.init_state(self.num_envs, k_ev)
        state = EnvState(
            scene=scene_state,
            episode_length=jnp.zeros(self.num_envs, dtype=jnp.int32),
            common_step=jnp.zeros((), dtype=jnp.int32),
            key=key,
            actions=self.action_manager.init_state(self.num_envs),
            obs=ObservationManagerState(histories={}, modifier_states={}),
            rewards=RewardManagerState(
                episode_sums=jnp.zeros((self.num_envs, 0))
            ),
            commands={},
            events=ev_state,
            curriculum={},
            metrics={},
        )
        # startup events may randomize default states before anything runs
        ctx = self.make_context(state)
        scene_state = self.event_manager.apply_startup(ctx, state.scene, k_st)
        state = state._replace(scene=scene_state)
        # subclass hook: populate manager states (commands etc.) that
        # observation terms may read
        state = self._init_manager_states(state)
        # update sensors once so first observations are valid
        state = state._replace(scene=self._update_sensors(state.scene))
        # observation state needs a full template ctx for shape discovery
        ctx = self.make_context(state)
        state = state._replace(obs=self.observation_manager.init_state(ctx))
        return state

    def _init_manager_states(self, state: EnvState) -> EnvState:
        """Hook for subclasses to add manager states before obs init."""
        return state

    def _update_sensors(self, scene_state: SceneState) -> SceneState:
        new_sensors = dict(scene_state.sensors)
        for name, sensor in self.scene.sensors.items():
            st = new_sensors.get(name)
            new_sensors[name] = sensor.update(st, scene_state, self.step_dt)
        return scene_state._replace(sensors=new_sensors)

    # ------------------------------------------------------------------
    # Host-facing gym-style API (reference manager_based_env.py:398-412)
    # ------------------------------------------------------------------
    def _reset_impl(self, key):
        state = self.init_state(key)
        ctx = self.make_context(state)
        key, sub = jax.random.split(state.key)
        obs, obs_state = self.observation_manager.compute(ctx, state.obs, sub)
        return state._replace(obs=obs_state, key=key), obs

    def reset(self, seed: int | None = None):
        if seed is not None:
            self._seed = seed
        # jit the whole init path: eager init is hundreds of tiny dispatches
        # (minutes over a remote-TPU tunnel)
        if self._jit_reset is None:
            self._jit_reset = jax.jit(self._reset_impl)
        self._state, obs = self._jit_reset(jax.random.PRNGKey(self._seed))
        return obs, {}

    def reset_to_state(
        self,
        state: EnvState,
        scene_state_dict: dict,
        env_mask=None,
        is_relative: bool = False,
    ) -> tuple[EnvState, dict]:
        """Pure state-based restore (reference ``ManagerBasedEnv.reset_to``,
        manager_based_env.py:317): write a recorded scene state (the dict
        produced by ``scene.get_state``) into masked envs, refresh sensors,
        zero episode counters, and recompute observations."""
        scene_state = self.scene.reset_to(
            state.scene, scene_state_dict, env_mask, is_relative
        )
        scene_state = self._update_sensors(scene_state)
        mask = (
            jnp.ones(self.num_envs, dtype=bool) if env_mask is None else env_mask
        )
        state = state._replace(
            scene=scene_state,
            episode_length=jnp.where(mask, 0, state.episode_length),
        )
        ctx = self.make_context(state)
        key, sub = jax.random.split(state.key)
        obs, obs_state = self.observation_manager.compute(ctx, state.obs, sub)
        return state._replace(obs=obs_state, key=key), obs

    def reset_to(self, scene_state_dict: dict, env_mask=None,
                 is_relative: bool = False):
        """Host-facing restore on the env's live state (reference
        manager_based_env.py:317-371); returns observations."""
        if self._state is None:
            self.reset()
        self._state, obs = jax.jit(
            self.reset_to_state, static_argnames=("is_relative",)
        )(self._state, scene_state_dict, env_mask, is_relative=is_relative)
        return obs, {}

    def step_state(self, state: EnvState, action) -> tuple[EnvState, dict]:
        """Pure: action application + decimated physics + obs (no RL logic)."""
        ctx = self.make_context(state)
        scene_state, am_state = self.action_manager.process_action(
            ctx, state.scene, state.actions, action
        )
        # scan keeps the traced/compiled program size independent of the
        # decimation factor (the reference's inner loop,
        # manager_based_env.py:398). The carry holds ONLY the leaves a
        # substep mutates (phys + entity states) — carrying the full
        # SceneState made XLA copy every loop-invariant leaf (sensors,
        # body_params: dozens of (E, 1) buffers) in and out of the while
        # loop each substep, a measurable slice of the rough-locomotion
        # step in the r4 device trace.
        def _substep(carry, _):
            phys, entities = carry
            ss = scene_state._replace(phys=phys, entities=entities)
            ss = self.action_manager.apply_action(ctx, ss)
            ss = self.scene.step_physics(ss, self.physics_dt)
            return (ss.phys, ss.entities), None

        (phys, entities), _ = jax.lax.scan(
            _substep, (scene_state.phys, scene_state.entities), None,
            length=int(self.cfg.decimation),
        )
        scene_state = scene_state._replace(phys=phys, entities=entities)
        scene_state = self._update_sensors(scene_state)
        state = state._replace(scene=scene_state, actions=am_state)
        ctx = self.make_context(state)
        key, sub = jax.random.split(state.key)
        obs, obs_state = self.observation_manager.compute(ctx, state.obs, sub)
        state = state._replace(obs=obs_state, key=key)
        return state, obs

    def step(self, action):
        if self._state is None:
            self.reset()
        if self._jit_step is None:
            self._jit_step = jax.jit(self.step_state)
        self._state, obs = self._jit_step(self._state, jnp.asarray(action))
        return obs, {}

    def close(self):
        pass
