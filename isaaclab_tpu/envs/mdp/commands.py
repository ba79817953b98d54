"""Command terms (reference ``envs/mdp/commands/``).

``UniformVelocityCommand`` (velocity_command.py), ``UniformPoseCommand``
(pose_command.py), ``UniformPose2dCommand`` / ``TerrainBasedPose2dCommand``
(pose_2d_command.py) — command arrays + resample timers in explicit state.
"""

from __future__ import annotations

from dataclasses import MISSING

import jax
import jax.numpy as jnp

from ...managers import CommandTerm, CommandTermCfg, CommandTermState
from ...utils import math as math_utils
from ...utils.configclass import configclass


@configclass
class UniformVelocityCommandCfg(CommandTermCfg):
    """Reference ``UniformVelocityCommandCfg``."""

    class_type: type = None
    asset_name: str = "robot"
    heading_command: bool = False
    heading_control_stiffness: float = 1.0
    rel_standing_envs: float = 0.0
    rel_heading_envs: float = 1.0

    @configclass
    class Ranges:
        lin_vel_x: tuple = MISSING
        lin_vel_y: tuple = MISSING
        ang_vel_z: tuple = MISSING
        heading: tuple = None

    ranges: Ranges = MISSING

    def __post_init__(self):
        if self.class_type is None:
            self.class_type = UniformVelocityCommand


class UniformVelocityCommand(CommandTerm):
    """SE(2) velocity command (reference velocity_command.py): command is
    (lin_vel_x, lin_vel_y, ang_vel_z) in base frame; optional heading mode
    recomputes ang_vel_z from heading error each step."""

    @property
    def command_dim(self):
        return 3

    def init_state(self, num_envs):
        st = super().init_state(num_envs)
        # extra: (heading_target (E,), is_standing (E,))
        return st._replace(
            extra=(jnp.zeros(num_envs), jnp.zeros(num_envs, dtype=bool))
        )

    def sample(self, env, state, key, mask):
        cfg = self.cfg
        E = state.command.shape[0]
        keys = jax.random.split(key, 5)
        r = cfg.ranges
        vx = jax.random.uniform(keys[0], (E,), minval=r.lin_vel_x[0], maxval=r.lin_vel_x[1])
        vy = jax.random.uniform(keys[1], (E,), minval=r.lin_vel_y[0], maxval=r.lin_vel_y[1])
        wz = jax.random.uniform(keys[2], (E,), minval=r.ang_vel_z[0], maxval=r.ang_vel_z[1])
        new_cmd = jnp.stack([vx, vy, wz], axis=-1)
        cmd = jnp.where(mask[:, None], new_cmd, state.command)
        heading_t, standing = state.extra
        if cfg.heading_command and r.heading is not None:
            h = jax.random.uniform(keys[3], (E,), minval=r.heading[0], maxval=r.heading[1])
            heading_t = jnp.where(mask, h, heading_t)
        stand = jax.random.uniform(keys[4], (E,)) < cfg.rel_standing_envs
        standing = jnp.where(mask, stand, standing)
        return state._replace(command=cmd, extra=(heading_t, standing))

    def update(self, env, state):
        cfg = self.cfg
        heading_t, standing = state.extra
        cmd = state.command
        if cfg.heading_command:
            heading = env.scene[cfg.asset_name].data.heading_w
            err = math_utils.wrap_to_pi(heading_t - heading)
            wz = jnp.clip(
                cfg.heading_control_stiffness * err,
                self.cfg.ranges.ang_vel_z[0],
                self.cfg.ranges.ang_vel_z[1],
            )
            cmd = cmd.at[:, 2].set(wz)
        cmd = jnp.where(standing[:, None], 0.0, cmd)
        return state._replace(command=cmd)


UniformVelocityCommandCfg.class_type = UniformVelocityCommand


@configclass
class NormalVelocityCommandCfg(UniformVelocityCommandCfg):
    """Reference ``NormalVelocityCommandCfg``: gaussian-sampled velocities."""

    class_type: type = None

    @configclass
    class Ranges:
        mean_vel: tuple = MISSING
        std_vel: tuple = MISSING
        zero_prob: tuple = (0.0, 0.0, 0.0)

    ranges: Ranges = MISSING

    def __post_init__(self):
        if self.class_type is None:
            self.class_type = NormalVelocityCommand


class NormalVelocityCommand(UniformVelocityCommand):
    def sample(self, env, state, key, mask):
        r = self.cfg.ranges
        E = state.command.shape[0]
        keys = jax.random.split(key, 2)
        mean = jnp.asarray(r.mean_vel)
        std = jnp.asarray(r.std_vel)
        new_cmd = mean + std * jax.random.normal(keys[0], (E, 3))
        zero = jax.random.uniform(keys[1], (E, 3)) < jnp.asarray(r.zero_prob)
        new_cmd = jnp.where(zero, 0.0, new_cmd)
        cmd = jnp.where(mask[:, None], new_cmd, state.command)
        return state._replace(command=cmd)


NormalVelocityCommandCfg.class_type = NormalVelocityCommand


@configclass
class UniformPoseCommandCfg(CommandTermCfg):
    """Reference ``UniformPoseCommandCfg`` (pose_command.py)."""

    class_type: type = None
    asset_name: str = "robot"
    body_name: str = MISSING
    make_quat_unique: bool = False

    @configclass
    class Ranges:
        pos_x: tuple = MISSING
        pos_y: tuple = MISSING
        pos_z: tuple = MISSING
        roll: tuple = (0.0, 0.0)
        pitch: tuple = (0.0, 0.0)
        yaw: tuple = (0.0, 0.0)

    ranges: Ranges = MISSING

    def __post_init__(self):
        if self.class_type is None:
            self.class_type = UniformPoseCommand


class UniformPoseCommand(CommandTerm):
    """SE(3) pose command in the robot base frame: (x, y, z, qw, qx, qy, qz)."""

    @property
    def command_dim(self):
        return 7

    def init_state(self, num_envs):
        st = super().init_state(num_envs)
        cmd = st.command.at[:, 3].set(1.0)
        return st._replace(command=cmd)

    def sample(self, env, state, key, mask):
        r = self.cfg.ranges
        E = state.command.shape[0]
        keys = jax.random.split(key, 6)
        u = lambda i, rg: jax.random.uniform(keys[i], (E,), minval=rg[0], maxval=rg[1])
        pos = jnp.stack([u(0, r.pos_x), u(1, r.pos_y), u(2, r.pos_z)], -1)
        quat = math_utils.quat_from_euler_xyz(u(3, r.roll), u(4, r.pitch), u(5, r.yaw))
        if self.cfg.make_quat_unique:
            quat = math_utils.quat_unique(quat)
        new_cmd = jnp.concatenate([pos, quat], axis=-1)
        return state._replace(
            command=jnp.where(mask[:, None], new_cmd, state.command)
        )


UniformPoseCommandCfg.class_type = UniformPoseCommand


@configclass
class UniformPose2dCommandCfg(CommandTermCfg):
    """Reference ``UniformPose2dCommandCfg`` (pose_2d_command.py)."""

    class_type: type = None
    asset_name: str = "robot"
    simple_heading: bool = True

    @configclass
    class Ranges:
        pos_x: tuple = MISSING
        pos_y: tuple = MISSING
        heading: tuple = (-3.14159, 3.14159)

    ranges: Ranges = MISSING

    def __post_init__(self):
        if self.class_type is None:
            self.class_type = UniformPose2dCommand


class UniformPose2dCommand(CommandTerm):
    """2D-pose goal (reference pose_2d_command.py:26): a world-frame goal
    position + heading is sampled at resample time, and the exposed command
    is re-targeted to the robot base every step as
    (pos_b x, y, z, heading_b) — 4 dims, matching the reference
    ``command`` property."""

    @property
    def command_dim(self):
        return 4

    def init_state(self, num_envs):
        st = super().init_state(num_envs)
        # extra: (pos_command_w (E, 3), heading_command_w (E,))
        return st._replace(
            extra=(jnp.zeros((num_envs, 3)), jnp.zeros(num_envs))
        )

    def _sample_world_goal(self, env, E, keys):
        """(E, 3) goal positions in the world frame. Uniform box around the
        env origins; z at the robot's default root height."""
        r = self.cfg.ranges
        data = env.scene[self.cfg.asset_name].data
        origins = jnp.asarray(env.scene.env_origins, dtype=jnp.float32)
        x = jax.random.uniform(keys[0], (E,), minval=r.pos_x[0], maxval=r.pos_x[1])
        y = jax.random.uniform(keys[1], (E,), minval=r.pos_y[0], maxval=r.pos_y[1])
        z = data.default_root_state[:, 2]
        return origins + jnp.stack([x, y, z - origins[:, 2]], axis=-1)

    def sample(self, env, state, key, mask):
        cfg = self.cfg
        E = state.command.shape[0]
        keys = jax.random.split(key, 4)
        pos_w, heading_w_cmd = state.extra
        new_pos = self._sample_world_goal(env, E, keys)
        pos_w = jnp.where(mask[:, None], new_pos, pos_w)
        data = env.scene[cfg.asset_name].data
        if cfg.simple_heading:
            # heading points at the target — or away from it, whichever is
            # closer to the current heading (reference pose_2d_command.py:
            # avoids the -pi/pi discontinuity)
            vec = pos_w - data.root_pos_w
            tgt = jnp.arctan2(vec[:, 1], vec[:, 0])
            flipped = math_utils.wrap_to_pi(tgt + jnp.pi)
            cur = data.heading_w
            use_tgt = jnp.abs(math_utils.wrap_to_pi(tgt - cur)) < jnp.abs(
                math_utils.wrap_to_pi(flipped - cur)
            )
            new_h = jnp.where(use_tgt, tgt, flipped)
        else:
            r = cfg.ranges
            new_h = jax.random.uniform(
                keys[3], (E,), minval=r.heading[0], maxval=r.heading[1]
            )
        heading_w_cmd = jnp.where(mask, new_h, heading_w_cmd)
        state = state._replace(extra=(pos_w, heading_w_cmd))
        return self.update(env, state)

    def update(self, env, state):
        """Re-target the world goal into the current base frame (reference
        ``_update_command``)."""
        data = env.scene[self.cfg.asset_name].data
        pos_w, heading_w_cmd = state.extra
        target_vec = pos_w - data.root_pos_w
        pos_b = math_utils.quat_apply_inverse(
            math_utils.yaw_quat(data.root_quat_w), target_vec
        )
        heading_b = math_utils.wrap_to_pi(heading_w_cmd - data.heading_w)
        return state._replace(
            command=jnp.concatenate([pos_b, heading_b[:, None]], axis=-1)
        )


UniformPose2dCommandCfg.class_type = UniformPose2dCommand


@configclass
class TerrainBasedPose2dCommandCfg(UniformPose2dCommandCfg):
    """Reference ``TerrainBasedPose2dCommandCfg`` (commands_cfg.py:233):
    goal positions come from the terrain's 'target' flat patches instead of
    a uniform box."""

    class_type: type = None

    @configclass
    class Ranges:
        heading: tuple = (-3.14159, 3.14159)

    ranges: Ranges = MISSING

    def __post_init__(self):
        if self.class_type is None:
            self.class_type = TerrainBasedPose2dCommand


class TerrainBasedPose2dCommand(UniformPose2dCommand):
    """Samples goals from ``terrain.flat_patches['target']``
    (reference pose_2d_command.py:146): per env, a random valid patch of the
    env's CURRENT terrain cell — cells follow the curriculum, so targets stay
    on the difficulty the env is training on."""

    def __init__(self, cfg, env):
        super().__init__(cfg, env)
        terrain = env.scene.terrain
        patches = (terrain.flat_patches if terrain is not None else {}).get(
            "target"
        )
        if patches is None:
            raise RuntimeError(
                "TerrainBasedPose2dCommand requires terrain flat patches under "
                "'target' — add FlatPatchSamplingCfg(num_patches=..., "
                "patch_radius=..., max_height_diff=...) as "
                "flat_patch_sampling={'target': ...} on the sub-terrain cfgs. "
                f"Found keys: {list(terrain.flat_patches) if terrain else []}"
            )
        self._patches = patches  # (R, C, P, 3) terrain frame, host numpy
        self._sub_size = terrain.generator.sub_size

    def _sample_world_goal(self, env, E, keys):
        patches = jnp.asarray(self._patches)  # (R, C, P, 3)
        R, C, P, _ = patches.shape
        # env's current cell from its terrain offset (cells are origin-packed
        # at (r + 0.5, c + 0.5) * sub_size — invert instead of carrying
        # level/type through the state)
        off = env.state.scene.terrain_offsets
        if off is None:
            off = jnp.asarray(
                env.scene.terrain.env_offsets, dtype=jnp.float32
            )
        row = jnp.clip(
            (off[:, 0] / self._sub_size[0]).astype(jnp.int32), 0, R - 1
        )
        col = jnp.clip(
            (off[:, 1] / self._sub_size[1]).astype(jnp.int32), 0, C - 1
        )
        idx = jax.random.randint(keys[0], (E,), 0, P)
        pts = patches[row, col, idx]  # (E, 3) terrain frame
        # into the env-local frame the robot states live in
        return pts - off


TerrainBasedPose2dCommandCfg.class_type = TerrainBasedPose2dCommand


@configclass
class NullCommandCfg(CommandTermCfg):
    """Reference ``NullCommandCfg``: placeholder when a task has no commands."""

    class_type: type = None
    resampling_time_range: tuple = (1e9, 1e9)

    def __post_init__(self):
        if self.class_type is None:
            self.class_type = NullCommand


class NullCommand(CommandTerm):
    @property
    def command_dim(self):
        return 0

    def sample(self, env, state, key, mask):
        return state


NullCommandCfg.class_type = NullCommand
