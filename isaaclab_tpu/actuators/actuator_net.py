"""Learned actuator-dynamics models (reference ``actuators/actuator_net.py``).

The reference loads TorchScript nets from Nucleus (``actuator_net.py:45,124``).
This build has zero egress, so the same architectures ship with weights fitted
offline to a documented ANYdrive-like series-elastic model (PD 40/5, DC-motor
saturation, 20 ms lag, Coulomb+viscous friction — ``tools/fit_actuator_net.py``)
committed under ``actuators/data/*.npz``. ``network_file`` loads any such
archive; ``network_params`` injects params directly; with neither, random
init (tests only).
"""

from __future__ import annotations

from dataclasses import MISSING
from typing import NamedTuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.configclass import configclass
from .actuator_base import ActuatorCommand, ActuatorDrive, ActuatorState
from .actuator_pd import DCMotor, DCMotorCfg


class _MLP(nn.Module):
    hidden: tuple = (32, 32, 32)
    act: str = "softsign"

    @nn.compact
    def __call__(self, x):
        a = nn.soft_sign if self.act == "softsign" else nn.relu
        for h in self.hidden:
            x = a(nn.Dense(h)(x))
        return nn.Dense(1)(x)


class _LSTMCell(nn.Module):
    features: int = 8

    @nn.compact
    def __call__(self, carry, x):
        return nn.OptimizedLSTMCell(self.features)(carry, x)




def _load_network_file(path):
    """Load a flat ``key/path -> array`` npz into a nested flax param dict."""
    import numpy as _np
    from flax.traverse_util import unflatten_dict

    data = dict(_np.load(path))
    extras = {k: v for k, v in data.items() if k.startswith("out_proj/")}
    params = unflatten_dict(
        {tuple(k.split("/")): v for k, v in data.items()
         if not k.startswith("out_proj/")}
    )
    return params, extras


def _default_network_file(name):
    import os

    p = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", name)
    return p if os.path.exists(p) else None




class ActuatorNetMLP(DCMotor):
    """MLP over (pos_error, vel) history -> torque
    (reference actuator_net.py:102)."""

    def __init__(self, cfg, joint_names, joint_ids, **kw):
        super().__init__(cfg, joint_names, joint_ids, **kw)
        self.history_len = int(cfg.input_idx[-1] + 1) if cfg.input_idx else 3
        self.input_idx = tuple(cfg.input_idx) if cfg.input_idx else (0, 1, 2)
        self.net = _MLP()
        net_file = cfg.network_file or _default_network_file("anydrive_3_mlp.npz")
        if cfg.network_params is not None:
            self.params = cfg.network_params
        elif net_file is not None:
            self.params, _ = _load_network_file(net_file)
        else:
            # init on the CPU backend + keep numpy: device-array closures
            # force trace-time D2H (degrades tunneled-TPU runtimes)
            with jax.default_device(jax.devices("cpu")[0]):
                p0 = self.net.init(
                    jax.random.PRNGKey(0),
                    jnp.zeros((1, 2 * len(self.input_idx))),
                )
            import numpy as _np

            self.params = jax.tree.map(_np.asarray, p0)
        self.pos_scale = float(cfg.pos_scale)
        self.vel_scale = float(cfg.vel_scale)
        self.torque_scale = float(cfg.torque_scale)

    def init_state(self, num_envs: int):
        n = self.num_joints
        h = self.history_len
        return ActuatorState(
            buffers=(jnp.zeros((num_envs, h, n)), jnp.zeros((num_envs, h, n)))
        )

    def reset(self, state, env_mask):
        pos_h, vel_h = state.buffers
        mask = env_mask.reshape(-1, 1, 1)
        return ActuatorState(
            buffers=(jnp.where(mask, 0.0, pos_h), jnp.where(mask, 0.0, vel_h))
        )

    def compute(self, state, control: ActuatorCommand, q, qd):
        pos_h, vel_h = state.buffers
        err = control.pos_target - q
        pos_h = jnp.concatenate([err[:, None, :], pos_h[:, :-1]], axis=1)
        vel_h = jnp.concatenate([qd[:, None, :], vel_h[:, :-1]], axis=1)
        idx = jnp.asarray(self.input_idx)
        feats = jnp.concatenate(
            [
                pos_h[:, idx] * self.pos_scale,
                vel_h[:, idx] * self.vel_scale,
            ],
            axis=1,
        )  # (envs, 2*k, n)
        x = jnp.moveaxis(feats, 1, 2).reshape(-1, feats.shape[1])
        tau = self.net.apply(self.params, x).reshape(q.shape) * self.torque_scale
        tau = self._clip(tau, qd)
        zeros = jnp.zeros_like(tau)
        return (
            ActuatorState(buffers=(pos_h, vel_h)),
            ActuatorDrive(kp=zeros, kd=zeros, pos_target=zeros, vel_target=zeros, effort=tau),
        )


class ActuatorNetLSTM(DCMotor):
    """LSTM actuator net (reference actuator_net.py:30)."""

    def __init__(self, cfg, joint_names, joint_ids, **kw):
        super().__init__(cfg, joint_names, joint_ids, **kw)
        self.features = int(cfg.hidden_dim)
        self.cell = _LSTMCell(self.features)
        dummy_carry = (
            jnp.zeros((1, self.features)),
            jnp.zeros((1, self.features)),
        )
        import numpy as _np

        net_file = cfg.network_file or _default_network_file(
            "anydrive_3_lstm.npz"
        )
        self.out_proj = _np.zeros((self.features, 1), dtype=_np.float32)
        self.out_bias = _np.zeros((1,), dtype=_np.float32)
        self.out_proj[0, 0] = 1.0
        if cfg.network_params is not None:
            self.params = cfg.network_params
        elif net_file is not None:
            self.params, extras = _load_network_file(net_file)
            if "out_proj/kernel" in extras:
                self.out_proj = extras["out_proj/kernel"].astype(_np.float32)
                self.out_bias = extras["out_proj/bias"].astype(_np.float32)
        else:
            with jax.default_device(jax.devices("cpu")[0]):
                p0 = self.cell.init(
                    jax.random.PRNGKey(0), dummy_carry, jnp.zeros((1, 2))
                )
            self.params = jax.tree.map(_np.asarray, p0)
        self.pos_scale = float(cfg.pos_scale)
        self.vel_scale = float(cfg.vel_scale)
        self.torque_scale = float(cfg.torque_scale)

    def init_state(self, num_envs: int):
        n = self.num_joints * num_envs
        return ActuatorState(
            buffers=(jnp.zeros((n, self.features)), jnp.zeros((n, self.features)))
        )

    def reset(self, state, env_mask):
        c, h = state.buffers
        num_envs = env_mask.shape[0]
        mask = jnp.repeat(env_mask, c.shape[0] // num_envs).reshape(-1, 1)
        return ActuatorState(buffers=(jnp.where(mask, 0.0, c), jnp.where(mask, 0.0, h)))

    def compute(self, state, control: ActuatorCommand, q, qd):
        c, h = state.buffers
        err = (control.pos_target - q).reshape(-1, 1) * self.pos_scale
        vel = qd.reshape(-1, 1) * self.vel_scale
        x = jnp.concatenate([err, vel], axis=-1)
        (c, h), out = self.cell.apply(self.params, (c, h), x)
        tau = (
            (out @ self.out_proj + self.out_bias).reshape(q.shape)
            * self.torque_scale
        )
        tau = self._clip(tau, qd)
        zeros = jnp.zeros_like(tau)
        return (
            ActuatorState(buffers=(c, h)),
            ActuatorDrive(kp=zeros, kd=zeros, pos_target=zeros, vel_target=zeros, effort=tau),
        )


@configclass
class ActuatorNetMLPCfg(DCMotorCfg):
    class_type: type = ActuatorNetMLP
    network_params: object = None
    network_file: str = None  # npz from tools/fit_actuator_net.py
    pos_scale: float = 1.0
    vel_scale: float = 0.1
    torque_scale: float = 80.0
    input_idx: tuple = (0, 1, 2)


@configclass
class ActuatorNetLSTMCfg(DCMotorCfg):
    class_type: type = ActuatorNetLSTM
    network_params: object = None
    network_file: str = None  # npz from tools/fit_actuator_net.py
    hidden_dim: int = 8
    pos_scale: float = 1.0
    vel_scale: float = 0.1
    torque_scale: float = 80.0
