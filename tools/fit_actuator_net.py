#!/usr/bin/env python
"""Fit the ActuatorNet MLP/LSTM weights to a documented ANYdrive-like model.

The reference ships TorchScript actuator nets trained on real ANYdrive 3
telemetry (``anydrive_3_lstm_jit.pt``, reference actuator_net.py:45,124).
This build has zero egress, so instead of converting that checkpoint we fit
the same architectures to a *synthetic but physically documented* series-
elastic actuator model, and commit the fitted weights
(``isaaclab_tpu/actuators/data/anydrive_3_{mlp,lstm}.npz``). The tasks stay
honest: docstrings and README state the weights' provenance.

Ground-truth actuator model (ANYdrive 3 approximation):
  tau_des   = kp * err - kd * qd            (internal PD, kp=40, kd=5 — the
                                             reference ANYDRIVE_3_SIMPLE gains)
  tau_sat   = DC-motor envelope: +-min(effort_limit,
              saturation_effort * (1 -+ qd / vel_limit)) with
              saturation_effort=120, effort_limit=80, vel_limit=7.5
  tau_lag   -> first-order lag, time constant 20 ms (gear + series elasticity)
  tau_out   = tau_lag - 1.2*tanh(qd/0.1) - 0.3*qd   (Coulomb + viscous friction)

Run: python tools/fit_actuator_net.py  (CPU, ~2 min)
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

DT = 0.005
KP, KD = 40.0, 5.0
SAT_EFFORT, EFFORT_LIM, VEL_LIM = 120.0, 80.0, 7.5
LAG_TAU = 0.02
COULOMB, COUL_VEL, VISCOUS = 1.2, 0.1, 0.3
HIST = 3  # MLP history steps (input_idx = (0, 1, 2))


def dc_envelope(tau, qd):
    max_eff = jnp.clip(SAT_EFFORT * (1.0 - qd / VEL_LIM), 0.0, EFFORT_LIM)
    min_eff = jnp.clip(-SAT_EFFORT * (1.0 + qd / VEL_LIM), -EFFORT_LIM, 0.0)
    return jnp.clip(tau, min_eff, max_eff)


def simulate(key, n_traj=4096, T=64):
    """Random smooth (err, qd) trajectories -> ground-truth torque sequences.

    err/qd follow Ornstein-Uhlenbeck processes spanning the regimes seen in
    locomotion training (|err| <~ 1.5 rad, |qd| <~ 12 rad/s).
    """
    k1, k2, k3 = jax.random.split(key, 3)
    err = jnp.zeros((n_traj,))
    qd = jnp.zeros((n_traj,))
    lag = jnp.zeros((n_traj,))
    noise_e = jax.random.normal(k1, (T, n_traj)) * 0.25
    noise_v = jax.random.normal(k2, (T, n_traj)) * 1.5
    # random per-trajectory OU rates for coverage diversity
    th_e = jax.random.uniform(k3, (n_traj,), minval=0.02, maxval=0.3)

    def body(carry, x):
        err, qd, lag = carry
        ne, nv = x
        err = err * (1 - th_e) + ne
        qd = qd * 0.95 + nv
        tau_des = KP * err - KD * qd
        tau_sat = dc_envelope(tau_des, qd)
        alpha = DT / (LAG_TAU + DT)
        lag = lag + alpha * (tau_sat - lag)
        tau_out = lag - COULOMB * jnp.tanh(qd / COUL_VEL) - VISCOUS * qd
        return (err, qd, lag), (err, qd, tau_out)

    _, (errs, qds, taus) = jax.lax.scan(body, (err, qd, lag), (noise_e, noise_v))
    return errs.T, qds.T, taus.T  # (n_traj, T)


def fit_mlp(errs, qds, taus):
    from isaaclab_tpu.actuators.actuator_net import _MLP

    net = _MLP()
    # features at step t: err[t], err[t-1], err[t-2], qd[t], qd[t-1], qd[t-2]
    X, Y = [], []
    for t in range(HIST - 1, errs.shape[1]):
        e = np.stack([errs[:, t - i] for i in range(HIST)], 1)
        v = np.stack([qds[:, t - i] for i in range(HIST)], 1)
        X.append(np.concatenate([e, v], 1))
        Y.append(taus[:, t : t + 1])
    X = jnp.asarray(np.concatenate(X)) / jnp.asarray([1.0] * HIST + [10.0] * HIST)
    Y = jnp.asarray(np.concatenate(Y)) / 80.0  # torque_scale
    params = net.init(jax.random.PRNGKey(0), X[:1])
    opt = optax.adam(3e-3)
    ost = opt.init(params)

    @jax.jit
    def step(params, ost, idx):
        def loss(p):
            return jnp.mean((net.apply(p, X[idx]) - Y[idx]) ** 2)

        l, g = jax.value_and_grad(loss)(params)
        u, ost = opt.update(g, ost)
        return optax.apply_updates(params, u), ost, l

    key = jax.random.PRNGKey(1)
    n = X.shape[0]
    for it in range(2000):
        key, k = jax.random.split(key)
        idx = jax.random.randint(k, (4096,), 0, n)
        params, ost, l = step(params, ost, idx)
        if it % 400 == 0:
            print(f"mlp it={it} mse={float(l):.5f} (torque-normalized)")
    rms = float(jnp.sqrt(l)) * 80.0
    print(f"mlp final torque RMS error ~ {rms:.2f} Nm")
    return params, rms


def fit_lstm(errs, qds, taus):
    from isaaclab_tpu.actuators.actuator_net import _LSTMCell

    feats = 8
    cell = _LSTMCell(feats)
    E, T = errs.shape
    X = jnp.stack([jnp.asarray(errs), jnp.asarray(qds) / 10.0], -1)  # (E,T,2)
    Y = jnp.asarray(taus)[..., None] / 80.0
    c0 = jnp.zeros((E, feats))
    params = cell.init(jax.random.PRNGKey(0), (c0[:1], c0[:1]), X[:1, 0])
    W = jnp.zeros((feats, 1))
    bias = jnp.zeros((1,))
    opt = optax.adam(3e-3)
    ost = opt.init((params, W, bias))

    @jax.jit
    def step(pw, ost):
        def loss(pw):
            p, W, b = pw

            def scan_t(carry, x):
                carry, out = cell.apply(p, carry, x)
                return carry, out @ W + b

            _, pred = jax.lax.scan(scan_t, (c0, c0), jnp.moveaxis(X, 1, 0))
            return jnp.mean((jnp.moveaxis(pred, 0, 1) - Y) ** 2)

        l, g = jax.value_and_grad(loss)(pw)
        u, ost = opt.update(g, ost)
        return optax.apply_updates(pw, u), ost, l

    pw = (params, W, bias)
    for it in range(600):
        pw, ost, l = step(pw, ost)
        if it % 100 == 0:
            print(f"lstm it={it} mse={float(l):.5f}")
    rms = float(jnp.sqrt(l)) * 80.0
    print(f"lstm final torque RMS error ~ {rms:.2f} Nm")
    return pw, rms


def save_flat(path, tree, extra=None):
    from flax.traverse_util import flatten_dict

    flat = {
        "/".join(k): np.asarray(v)
        for k, v in flatten_dict(tree).items()
    }
    if extra:
        flat.update({k: np.asarray(v) for k, v in extra.items()})
    np.savez(path, **flat)
    print(f"wrote {path} ({len(flat)} arrays)")


def main():
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "isaaclab_tpu", "actuators", "data",
    )
    os.makedirs(out_dir, exist_ok=True)
    errs, qds, taus = simulate(jax.random.PRNGKey(42))
    errs, qds, taus = np.asarray(errs), np.asarray(qds), np.asarray(taus)
    mlp_params, mlp_rms = fit_mlp(errs, qds, taus)
    save_flat(os.path.join(out_dir, "anydrive_3_mlp.npz"), mlp_params)
    (lstm_params, W, b), lstm_rms = fit_lstm(errs, qds, taus)
    save_flat(
        os.path.join(out_dir, "anydrive_3_lstm.npz"),
        lstm_params,
        extra={"out_proj/kernel": W, "out_proj/bias": b},
    )
    assert mlp_rms < 8.0 and lstm_rms < 8.0, "fit did not converge"


if __name__ == "__main__":
    main()
