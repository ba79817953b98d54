"""RL environment (reference ``envs/manager_based_rl_env.py``).

``step`` order mirrors the reference hot loop (manager_based_rl_env.py:153-242)
with the in-step partial reset of done envs replaced by a masked reset —
everything compiles into one function suitable for ``lax.scan`` rollouts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..managers import (
    CommandManager,
    CurriculumManager,
    RewardManager,
    RewardManagerState,
    TerminationManager,
)
from .manager_based_env import (
    EnvContext,
    EnvState,
    ManagerBasedEnv,
    ManagerBasedRLEnvCfg,
)


class ManagerBasedRLEnv(ManagerBasedEnv):
    """Reference ``ManagerBasedRLEnv`` (gym.Env-compatible vector env)."""

    is_vector_env = True

    cfg: ManagerBasedRLEnvCfg

    def __init__(self, cfg: ManagerBasedRLEnvCfg, render_mode: str | None = None, **kwargs):
        self.common_step_counter = 0
        super().__init__(cfg)
        self.render_mode = render_mode
        self._configure_gym_env_spaces()

    def _configure_gym_env_spaces(self):
        """Reference manager_based_rl_env.py:322: spaces from manager dims."""
        import gymnasium as gym
        import numpy as np

        om = self.observation_manager
        self.single_observation_space = gym.spaces.Dict(
            {
                group: gym.spaces.Box(
                    -np.inf, np.inf, om.group_obs_dim(group)
                )
                for group in om.group_names()
            }
        )
        act_dim = self.action_manager.total_action_dim
        self.single_action_space = gym.spaces.Box(-np.inf, np.inf, (act_dim,))
        self.observation_space = gym.vector.utils.batch_space(
            self.single_observation_space, self.num_envs
        )
        self.action_space = gym.vector.utils.batch_space(
            self.single_action_space, self.num_envs
        )

    # ------------------------------------------------------------------
    @property
    def max_episode_length_s(self) -> float:
        return float(self.cfg.episode_length_s)

    @property
    def max_episode_length(self) -> int:
        return int(np.ceil(self.max_episode_length_s / self.step_dt))

    def load_managers(self):
        """Reference manager_based_rl_env.py:109-135 ordering: command first
        (obs terms may reference commands), then base managers, then
        termination/reward/curriculum."""
        self.command_manager = (
            CommandManager(self.cfg.commands, self)
            if self.cfg.commands is not None
            else None
        )
        super().load_managers()
        self.termination_manager = TerminationManager(self.cfg.terminations, self)
        self.reward_manager = RewardManager(self.cfg.rewards, self)
        self.curriculum_manager = (
            CurriculumManager(self.cfg.curriculum, self)
            if self.cfg.curriculum is not None
            else None
        )

    # ------------------------------------------------------------------
    def _init_manager_states(self, state: EnvState) -> EnvState:
        """Populate RL manager states before observation-dim discovery
        (observation terms may read commands)."""
        state = state._replace(
            rewards=self.reward_manager.init_state(self.num_envs),
            commands=(
                self.command_manager.init_state(self.num_envs)
                if self.command_manager
                else {}
            ),
            curriculum=(
                self.curriculum_manager.init_state(self.num_envs)
                if self.curriculum_manager
                else {}
            ),
        )
        # seed the terrain curriculum from the importer's initial level
        # assignment (reference: random levels up to max_init_terrain_level)
        if (
            self.curriculum_manager
            and "terrain_levels" in state.curriculum
            and self.scene.terrain is not None
        ):
            cur = dict(state.curriculum)
            cur["terrain_levels"] = jnp.asarray(
                self.scene.terrain.terrain_levels, dtype=jnp.float32
            )
            state = state._replace(curriculum=cur)
        # initial command resample for all envs
        if self.command_manager:
            ctx = self.make_context(state)
            key, sub = jax.random.split(state.key)
            cmds = self.command_manager.compute(
                ctx, state.commands, sub, 0.0,
                jnp.ones(self.num_envs, dtype=bool),
            )
            state = state._replace(commands=cmds, key=key)
        return state

    # ------------------------------------------------------------------
    # THE hot loop (reference manager_based_rl_env.py:153-242), pure.
    # ------------------------------------------------------------------
    def step_state(self, state: EnvState, action):
        """Returns (new_state, (obs, reward, terminated, truncated, extras))."""
        cfg = self.cfg
        ctx = self.make_context(state)

        # 1. action processing (:173)
        scene_state, am_state = self.action_manager.process_action(
            ctx, state.scene, state.actions, action
        )
        state = state._replace(actions=am_state)

        # 2. decimated sim loop (:182-196) as a scan: compile size stays
        # independent of the decimation factor
        # narrow carry: only the substep-mutated leaves ride the scan (see
        # manager_based_env.step_state — avoids loop-invariant carry copies)
        def _substep(carry, _):
            phys, entities = carry
            ss = scene_state._replace(phys=phys, entities=entities)
            ss = self.action_manager.apply_action(ctx, ss)
            ss = self.scene.step_physics(ss, self.physics_dt)
            return (ss.phys, ss.entities), None

        (phys, entities), _ = jax.lax.scan(
            _substep, (scene_state.phys, scene_state.entities), None,
            length=int(cfg.decimation),
        )
        scene_state = scene_state._replace(phys=phys, entities=entities)
        scene_state = self._update_sensors(scene_state)
        state = state._replace(scene=scene_state)

        # 3. episode bookkeeping (:200-201)
        state = state._replace(
            episode_length=state.episode_length + 1,
            common_step=state.common_step + 1,
        )
        ctx = self.make_context(state)

        # 4. terminations (:203) then rewards (:207)
        terminated, time_outs, term_dict = self.termination_manager.compute(ctx)
        reward, rew_state, _ = self.reward_manager.compute(
            ctx, self.step_dt, state.rewards
        )
        state = state._replace(rewards=rew_state)

        # 5. masked reset of done envs (:215-230 -> _reset_idx :347-392)
        reset_mask = terminated | time_outs
        state, reset_logs = self._masked_reset(state, reset_mask)

        # 6. command update (:233)
        if self.command_manager:
            key, sub = jax.random.split(state.key)
            cmds = self.command_manager.compute(
                self.make_context(state), state.commands, sub, self.step_dt,
                reset_mask,
            )
            state = state._replace(commands=cmds, key=key)

        # 7. interval events (:236)
        key, sub = jax.random.split(state.key)
        ctx = self.make_context(state)
        scene_state, ev_state = self.event_manager.apply_interval(
            ctx, state.scene, state.events, sub, self.step_dt
        )
        state = state._replace(scene=scene_state, events=ev_state, key=key)

        # 8. observations (:239)
        ctx = self.make_context(state)
        key, sub = jax.random.split(state.key)
        obs, obs_state = self.observation_manager.compute(ctx, state.obs, sub)
        state = state._replace(obs=obs_state, key=key)

        extras = {
            "log": reset_logs,
            "episode_termination": term_dict,
            "time_outs": time_outs,
        }
        return state, (obs, reward, terminated, time_outs, extras)

    def _masked_reset(self, state: EnvState, mask):
        """Reference _reset_idx order: curriculum -> scene reset -> events ->
        manager resets -> logs (manager_based_rl_env.py:347-392)."""
        logs = {}
        ctx = self.make_context(state)
        # curriculum
        if self.curriculum_manager:
            cur_state, cur_logs = self.curriculum_manager.compute(
                ctx, state.curriculum, mask
            )
            state = state._replace(curriculum=cur_state)
            logs.update(cur_logs)
            # terrain curriculum: move promoted/demoted envs to their new
            # difficulty row's cell (reference terrain_importer env-origin
            # update driven by terrain_levels_vel)
            if "terrain_levels" in cur_state:
                state = state._replace(
                    scene=self.scene.apply_terrain_levels(
                        state.scene, cur_state["terrain_levels"], mask
                    )
                )
        # scene reset to defaults (key feeds sensor drift resampling)
        key, k_scene = jax.random.split(state.key)
        state = state._replace(key=key)
        scene_state = self.scene.reset_state(state.scene, mask, key=k_scene)
        state = state._replace(scene=scene_state)
        # reset events (randomizations overwrite masked envs' states)
        key, sub = jax.random.split(state.key)
        ctx = self.make_context(state)
        scene_state, ev_state = self.event_manager.apply_reset(
            ctx, state.scene, state.events, sub, mask, state.common_step
        )
        state = state._replace(scene=scene_state, events=ev_state, key=key)
        # manager resets
        rew_state, rew_logs = self.reward_manager.reset(state.rewards, mask)
        logs.update(rew_logs)
        scene_state, am_state = self.action_manager.reset(
            ctx, state.scene, state.actions, mask
        )
        obs_state = self.observation_manager.reset(state.obs, mask)
        # episode length log + zero
        n = jnp.maximum(jnp.sum(mask), 1)
        logs["Episode_Length"] = (
            jnp.sum(jnp.where(mask, state.episode_length, 0)) / n
        )
        logs["reset_count"] = jnp.sum(mask)
        state = state._replace(
            scene=scene_state,
            actions=am_state,
            obs=obs_state,
            rewards=rew_state,
            episode_length=jnp.where(mask, 0, state.episode_length),
        )
        return state, logs

    # ------------------------------------------------------------------
    # Host-facing gym API
    # ------------------------------------------------------------------
    def reset(self, seed: int | None = None, options: dict | None = None):
        obs, info = super().reset(seed)
        return obs, info

    def step(self, action):
        if self._state is None:
            self.reset()
        if self._jit_step is None:
            self._jit_step = jax.jit(self.step_state)
        self._state, out = self._jit_step(self._state, jnp.asarray(action))
        obs, reward, terminated, truncated, extras = out
        if self.recorder_manager.enabled:
            self.recorder_manager.record_post_step(
                self, obs, action, reward, terminated | truncated
            )
            done_ids = np.nonzero(np.asarray(terminated | truncated))[0]
            if done_ids.size:
                self.recorder_manager.record_pre_reset(self, done_ids)
        return obs, reward, terminated, truncated, extras

    def close(self):
        pass
