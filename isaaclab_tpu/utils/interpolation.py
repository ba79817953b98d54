"""Linear interpolation (reference ``utils/interpolation/linear_interpolation.py``).

Pure-jnp batched 1-D lookup table used e.g. by the remotized PD actuator's
angle-dependent torque limit.
"""

from __future__ import annotations

import jax.numpy as jnp


class LinearInterpolation:
    """y = interp(x) over a monotonically increasing 1-D table, clamped at the
    ends. ``x`` / ``y`` are fixed device arrays; ``compute`` traces under jit."""

    def __init__(self, x, y):
        import numpy as np

        # host numpy (trace-time constant; device arrays here force D2H)
        self.x = np.asarray(x, dtype=np.float32).reshape(-1)
        self.y = np.asarray(y, dtype=np.float32).reshape(-1)
        if self.x.shape != self.y.shape:
            raise ValueError("x and y must have the same length")

    def compute(self, q):
        return jnp.interp(q, self.x, self.y)
