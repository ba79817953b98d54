#!/usr/bin/env python
"""Behavior-cloning trainer over HDF5 demo datasets (reference
``scripts/imitation_learning/robomimic/train.py``). robomimic (torch) is not
in this image; this is a flax/optax BC-MLP with the same dataset contract —
``obs/policy/*`` observations to ``actions`` regression — and the same CLI
shape. Exports an OnPolicyRunner-compatible params pickle."""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))))

parser = argparse.ArgumentParser()
parser.add_argument("--dataset", type=str, required=True)
parser.add_argument("--algo", type=str, default="bc", choices=["bc", "bc_rnn"])
parser.add_argument("--epochs", type=int, default=50)
parser.add_argument("--batch_size", type=int, default=256)
parser.add_argument("--lr", type=float, default=1e-3)
parser.add_argument("--hidden", type=int, nargs="+", default=[256, 256])
parser.add_argument("--output", type=str, default="logs/robomimic/bc_policy.pkl")
args = parser.parse_args()


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from flax import linen as nn

    from isaaclab_tpu.utils.datasets import HDF5DatasetFileHandler

    ds = HDF5DatasetFileHandler()
    ds.open_or_create(args.dataset)
    obs_list, act_list = [], []
    for name in ds.get_episode_names():
        ep = ds.load_episode(name)
        acts = np.asarray(ep["actions"])
        obs_keys = sorted(k for k in ep if k == "obs" or k.startswith("obs/"))
        if not obs_keys:
            continue
        obs = np.concatenate(
            [np.asarray(ep[k]).reshape(acts.shape[0], -1) for k in obs_keys],
            axis=-1,
        )
        obs_list.append(obs)
        act_list.append(acts)
    if not obs_list:
        print("no usable episodes in dataset")
        return 1
    X = np.concatenate(obs_list).astype(np.float32)
    Y = np.concatenate(act_list).astype(np.float32)
    print(f"dataset: {X.shape[0]} transitions, obs {X.shape[1]}, act {Y.shape[1]}")

    class MLP(nn.Module):
        @nn.compact
        def __call__(self, x):
            for h in args.hidden:
                x = nn.elu(nn.Dense(h)(x))
            return nn.Dense(Y.shape[1])(x)

    model = MLP()
    params = model.init(jax.random.PRNGKey(0), X[:1])
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            return jnp.mean((model.apply(p, xb) - yb) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(0)
    n = X.shape[0]
    for epoch in range(args.epochs):
        perm = rng.permutation(n)
        losses = []
        for i in range(0, n - args.batch_size + 1, args.batch_size):
            idx = perm[i : i + args.batch_size]
            params, opt_state, loss = step(params, opt_state, X[idx], Y[idx])
            losses.append(float(loss))
        if epoch % max(1, args.epochs // 10) == 0:
            print(f"epoch {epoch:4d} | bc loss {np.mean(losses):.5f}")
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    with open(args.output, "wb") as f:
        pickle.dump({"params": jax.device_get(params),
                     "hidden": args.hidden,
                     "obs_dim": X.shape[1], "act_dim": Y.shape[1]}, f)
    print(f"saved BC policy -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
