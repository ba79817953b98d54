"""Mesh construction and env-state sharding helpers.

Replaces the reference's torchrun/NCCL rank wiring
(app_launcher.py:646-652, multi_gpu.rst:58-169): build a
``jax.sharding.Mesh`` over all chips, place env-batched pytree leaves with
``PartitionSpec('data')``, keep learner state replicated, and let XLA insert
the psum for gradients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host bootstrap (replaces torchrun env-var rank resolution)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data mesh over all (or the given) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(mesh: Mesh, x, axis_name: str = DATA_AXIS):
    """Place an (E, ...) array sharded over the data axis."""
    spec = P(axis_name, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))


def shard_env_pytree(mesh: Mesh, tree, num_envs: int, axis_name: str = DATA_AXIS):
    """Shard every leaf whose leading dimension equals ``num_envs`` over the
    data axis; replicate everything else (params, optimizer state, scalars)."""

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == num_envs:
            return shard_batch(mesh, x, axis_name)
        return replicate(mesh, x)

    return jax.tree.map(place, tree)
