"""Small-matrix linear algebra, unrolled at trace time.

XLA's generic ``cholesky``/``triangular_solve`` lowers to a slow loop-based
kernel on TPU for tiny batched matrices (measured: 1.0ms per 256-step scan
iteration for (4096, 2, 2) vs 0.1ms elementwise). Articulation mass matrices
are static-size and small (nv = 2..40), so the factorization unrolls into
pure elementwise ops that fuse into the surrounding step kernel.

All functions operate on ONE env's matrices (the engine vmaps over envs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# above this size the unrolled program bloats the HLO; fall back to XLA linalg
MAX_UNROLL = 36


def chol_factor(H):
    """Lower-triangular L with H = L L^T. Unrolled Cholesky-Crout for static
    n <= MAX_UNROLL; XLA cholesky otherwise."""
    n = H.shape[-1]
    if n > MAX_UNROLL:
        return jax.scipy.linalg.cholesky(H, lower=True)
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = H[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]
    rows = [
        jnp.stack([L[i][j] if j <= i else jnp.zeros_like(H[0, 0])
                   for j in range(n)])
        for i in range(n)
    ]
    return jnp.stack(rows)


def chol_solve(L, b):
    """Solve (L L^T) x = b given the lower factor. b: (n,) or (n, m).
    Unrolled substitution for static n <= MAX_UNROLL."""
    n = L.shape[-1]
    if n > MAX_UNROLL:
        return jax.scipy.linalg.cho_solve((L, True), b)
    # forward: L y = b
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i, k] * y[k]
        y[i] = s / L[i, i]
    # backward: L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k, i] * x[k]
        x[i] = s / L[i, i]
    return jnp.stack(x)
