"""Fixed-size history buffers as functional pytrees.

TPU-native counterparts of the reference buffer classes
(``/root/reference/source/isaaclab/isaaclab/utils/buffers/``): the reference's
``CircularBuffer`` / ``DelayBuffer`` mutate torch tensors in place; here each
buffer is an immutable pytree plus pure ``append``/``reset`` transforms so the
whole history mechanism lives inside ``jit``/``lax.scan``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class CircularBuffer(NamedTuple):
    """Rolling history of the last ``max_len`` appended values.

    Reference: ``utils/buffers/circular_buffer.py``. Layout: ``data`` is
    ``(max_len, batch, ...)`` with slot ``pointer`` = most recent. Until the
    buffer fills, reads repeat the oldest valid entry (matching the
    reference's fill-on-first-append semantics).
    """

    data: jax.Array  # (max_len, batch, ...)
    pointer: jax.Array  # scalar int32, index of most recent entry
    num_pushes: jax.Array  # (batch,) int32 pushes since reset

    @staticmethod
    def create(max_len: int, batch_size: int, shape: tuple, dtype=jnp.float32):
        return CircularBuffer(
            data=jnp.zeros((max_len, batch_size) + tuple(shape), dtype=dtype),
            pointer=jnp.array(-1, dtype=jnp.int32),
            num_pushes=jnp.zeros((batch_size,), dtype=jnp.int32),
        )

    @property
    def max_length(self) -> int:
        return self.data.shape[0]

    def append(self, value: jax.Array) -> "CircularBuffer":
        """Pure append: returns a new buffer with ``value`` as newest entry.

        Envs with ``num_pushes == 0`` (freshly reset) have their whole history
        backfilled with ``value`` (reference circular_buffer.py fill-in).
        """
        max_len = self.data.shape[0]
        ptr = (self.pointer + 1) % max_len
        data = self.data.at[ptr].set(value)
        # Backfill fresh envs so history reads are well-defined post-reset.
        fresh = (self.num_pushes == 0).reshape((-1,) + (1,) * (value.ndim - 1))
        data = jnp.where(fresh[None], value[None], data)
        return CircularBuffer(
            data=data, pointer=ptr, num_pushes=self.num_pushes + 1
        )

    def reset(self, env_mask: jax.Array) -> "CircularBuffer":
        """Mark envs in ``env_mask`` as empty (their next append backfills)."""
        return self._replace(
            num_pushes=jnp.where(env_mask, 0, self.num_pushes)
        )

    def newest(self) -> jax.Array:
        return self.data[jnp.maximum(self.pointer, 0)]

    def history(self) -> jax.Array:
        """Full history ordered oldest->newest: shape (max_len, batch, ...)."""
        max_len = self.data.shape[0]
        idx = (self.pointer + 1 + jnp.arange(max_len)) % max_len
        return self.data[idx]


class DelayBuffer(NamedTuple):
    """Per-env integer-lag delay line (reference ``utils/buffers/delay_buffer.py``).

    Holds the last ``history_length+1`` values; ``compute`` returns the value
    delayed by per-env ``time_lags`` steps (clamped to the valid history).
    """

    circular: CircularBuffer
    time_lags: jax.Array  # (batch,) int32

    @staticmethod
    def create(history_length: int, batch_size: int, shape: tuple, dtype=jnp.float32):
        return DelayBuffer(
            circular=CircularBuffer.create(history_length + 1, batch_size, shape, dtype),
            time_lags=jnp.zeros((batch_size,), dtype=jnp.int32),
        )

    def set_time_lag(self, lags: jax.Array) -> "DelayBuffer":
        max_lag = self.circular.max_length - 1
        return self._replace(time_lags=jnp.clip(lags, 0, max_lag))

    def compute(self, value: jax.Array) -> tuple["DelayBuffer", jax.Array]:
        """Append ``value`` and return the per-env delayed output."""
        circ = self.circular.append(value)
        max_len = circ.max_length
        # Effective lag cannot exceed the number of pushes made so far.
        lag = jnp.minimum(self.time_lags, circ.num_pushes - 1)
        lag = jnp.maximum(lag, 0)
        idx = (circ.pointer - lag) % max_len
        batch = jnp.arange(value.shape[0])
        delayed = circ.data[idx, batch]
        return self._replace(circular=circ), delayed

    def reset(self, env_mask: jax.Array) -> "DelayBuffer":
        return self._replace(circular=self.circular.reset(env_mask))


class TimestampedBuffer(NamedTuple):
    """Value + timestamp pair used for lazy sensor refresh
    (reference ``utils/buffers/timestamped_buffer.py``)."""

    data: jax.Array
    timestamp: jax.Array  # scalar float32

    @staticmethod
    def create(shape: tuple, dtype=jnp.float32):
        return TimestampedBuffer(
            data=jnp.zeros(shape, dtype=dtype),
            timestamp=jnp.array(-1.0, dtype=jnp.float32),
        )

    def update(self, value: jax.Array, t: jax.Array) -> "TimestampedBuffer":
        return TimestampedBuffer(data=value, timestamp=t)

    def is_outdated(self, t: jax.Array) -> jax.Array:
        return self.timestamp < t
