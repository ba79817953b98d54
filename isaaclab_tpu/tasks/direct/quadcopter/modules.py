"""UAV rotor + rate-controller stack (fork-specific, reference
``direct/quadcopter/modules/motor.py:3-54`` and ``controller.py:6-60``).

Pure-functional recast: rotor first-order lag state and PID integrator state
live in explicit pytrees; parameters are per-env arrays supporting the fork's
percentage-based domain randomization.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ....utils.configclass import configclass

# UAV_LIDAR rotor parameters (reference motor.py:19-26)
# host numpy: device constants captured by jitted closures force D2H at trace
import numpy as np

ROTOR_DIRECTIONS = np.array([1.0, 1.0, -1.0, -1.0], dtype=np.float32)
ROTOR_FORCE_CONSTANTS = np.full(4, 4.33948e-07, dtype=np.float32)
ROTOR_MAX_VEL = np.full(4, 3800.0, dtype=np.float32)
ROTOR_MOMENT_CONSTANTS = np.full(4, 0.00932, dtype=np.float32)
ROTOR_TAU_UP = np.full(4, 0.0125, dtype=np.float32)
ROTOR_TAU_DOWN = np.full(4, 0.025, dtype=np.float32)


@configclass
class MotorDomainRandomizationCfg:
    """Reference quadcopter_cfg.domain_randomization.motor."""

    enable: bool = False
    force_constants: float = 0.1
    max_rotation_velocities: float = 0.05
    moment_constants: float = 0.1
    tau_up: float = 0.2
    tau_down: float = 0.2


class MotorState(NamedTuple):
    rotor_velocity: jnp.ndarray  # (E, 4)
    force_constants: jnp.ndarray  # (E, 4) randomized
    max_velocities: jnp.ndarray
    moment_constants: jnp.ndarray
    tau_up: jnp.ndarray
    tau_down: jnp.ndarray


class MotorModel:
    """First-order rotor lag + quadratic thrust/drag (reference motor.py)."""

    def __init__(self, num_envs: int, dt: float,
                 dr_cfg: MotorDomainRandomizationCfg | None = None):
        self.num_envs = num_envs
        self.dt = dt
        self.dr_cfg = dr_cfg or MotorDomainRandomizationCfg()

    def init_state(self) -> MotorState:
        E = self.num_envs
        tile = lambda x: jnp.tile(x, (E, 1))
        return MotorState(
            rotor_velocity=jnp.zeros((E, 4)),
            force_constants=tile(ROTOR_FORCE_CONSTANTS),
            max_velocities=tile(ROTOR_MAX_VEL),
            moment_constants=tile(ROTOR_MOMENT_CONSTANTS),
            tau_up=tile(ROTOR_TAU_UP),
            tau_down=tile(ROTOR_TAU_DOWN),
        )

    def step(self, state: MotorState, cmds):
        """(state, thrust (E,4), moment_z (E,4)) — reference
        calculate_rotor_dynamic (motor.py:40-53)."""
        target = jnp.clip(cmds, 0.0, 1.0) * state.max_velocities
        alpha_up = jnp.exp(-self.dt / state.tau_up)
        alpha_down = jnp.exp(-self.dt / state.tau_down)
        alpha = jnp.where(target > state.rotor_velocity, alpha_up, alpha_down)
        vel = jnp.clip(
            state.rotor_velocity + alpha * (target - state.rotor_velocity),
            0.0,
            state.max_velocities,
        )
        thrusts = vel * jnp.abs(vel) * state.force_constants
        moments = thrusts * state.moment_constants * -ROTOR_DIRECTIONS
        return state._replace(rotor_velocity=vel), thrusts, moments

    def reset(self, state: MotorState, key, mask) -> MotorState:
        """Zero rotors; re-randomize parameters for masked envs
        (reference motor.py:56-70)."""
        m = mask[:, None]
        state = state._replace(
            rotor_velocity=jnp.where(m, 0.0, state.rotor_velocity)
        )
        if not self.dr_cfg.enable:
            return state

        def rand(k, base, pct):
            u = jax.random.uniform(
                k, (self.num_envs, 4), minval=-pct, maxval=pct
            )
            return base[None] * (1.0 + u)

        keys = jax.random.split(key, 5)
        c = self.dr_cfg
        return state._replace(
            force_constants=jnp.where(
                m, rand(keys[0], ROTOR_FORCE_CONSTANTS, c.force_constants),
                state.force_constants,
            ),
            max_velocities=jnp.where(
                m, rand(keys[1], ROTOR_MAX_VEL, c.max_rotation_velocities),
                state.max_velocities,
            ),
            moment_constants=jnp.where(
                m, rand(keys[2], ROTOR_MOMENT_CONSTANTS, c.moment_constants),
                state.moment_constants,
            ),
            tau_up=jnp.where(
                m, rand(keys[3], ROTOR_TAU_UP, c.tau_up), state.tau_up
            ),
            tau_down=jnp.where(
                m, rand(keys[4], ROTOR_TAU_DOWN, c.tau_down), state.tau_down
            ),
        )


# UAV_LIDAR rate PID gains (reference controller.py:21-24)
RATE_GAIN_P = np.array([0.028, 0.04, 0.06], dtype=np.float32)
RATE_GAIN_I = np.array([0.2, 0.2, 0.06], dtype=np.float32)
RATE_GAIN_D = np.array([0.0006, 0.0008, 0.0], dtype=np.float32)
RATE_LIM_INT = np.array([0.3, 0.3, 0.3], dtype=np.float32)

# X-configuration mixer (reference controller.py:27-34)
MIXER = np.array(
    [
        [-0.70711, -0.70711, 1.0, 1.0],
        [0.70711, 0.70711, 1.0, 1.0],
        [0.70711, -0.70711, -1.0, 1.0],
        [-0.70711, 0.70711, -1.0, 1.0],
    ],
    dtype=np.float32,
)


class RateControllerState(NamedTuple):
    rate_int: jnp.ndarray  # (E, 3)
    prev_rate_error: jnp.ndarray  # (E, 3)


class RateController:
    """Body-rate PID -> per-rotor commands (reference controller.py:6-60)."""

    def __init__(self, num_envs: int):
        self.num_envs = num_envs

    def init_state(self) -> RateControllerState:
        z = jnp.zeros((self.num_envs, 3))
        return RateControllerState(rate_int=z, prev_rate_error=z)

    def run(self, state: RateControllerState, target_rate, target_thrust,
            current_rate, dt: float):
        """Returns (state, rotor cmds (E, 4)); reference controller.run."""
        rate_error = target_rate - current_rate
        derivative = (rate_error - state.prev_rate_error) / dt
        torque = (
            RATE_GAIN_P * rate_error + state.rate_int - RATE_GAIN_D * derivative
        )
        # integral anti-windup (reference update_integral)
        i_factor = rate_error / jnp.deg2rad(400.0)
        i_factor = jnp.clip(1.0 - i_factor * i_factor, 0.0, 1.0)
        rate_int = jnp.clip(
            state.rate_int + i_factor * RATE_GAIN_I * rate_error * dt,
            -RATE_LIM_INT,
            RATE_LIM_INT,
        )
        rate_int = jnp.where(jnp.isfinite(rate_int), rate_int, state.rate_int)
        new_state = RateControllerState(
            rate_int=rate_int, prev_rate_error=rate_error
        )
        angacc_thrust = jnp.concatenate([torque, target_thrust], axis=1)
        cmd = angacc_thrust @ MIXER.T
        return new_state, cmd

    def reset(self, state: RateControllerState, mask) -> RateControllerState:
        m = mask[:, None]
        return RateControllerState(
            rate_int=jnp.where(m, 0.0, state.rate_int),
            prev_rate_error=jnp.where(m, 0.0, state.prev_rate_error),
        )
