"""Pallas TPU kernel for the APGD contact solve.

The XLA formulation of the APGD loop (:func:`solver.apgd_solve`) re-reads
the (nv, nrows) constraint Jacobian and ``M^-1 J^T`` from HBM on every one
of its ~22 matrix-vector products (6 power iterations + `iterations` APGD
sweeps). This kernel keeps both operands resident in VMEM for a block of
envs and runs the whole accelerated-projected-gradient loop on-chip.

Measured on a v5e chip at Anymal sizes (E=4096, nv=18, nrows=108, 16
iterations): XLA loop 2.16 ms, this kernel 2.52 ms at the largest block
size that fits VMEM (64 envs) — the sequential grid costs more than the
HBM traffic it saves at these operand sizes, so the kernel is OFF by
default and kept as measured infrastructure for larger contact problems
(ISAACLAB_TPU_PALLAS=1 enables it).

Layout: a block of ``BE`` envs per grid program; vectors are (BE, nrows)
(envs on sublanes, constraint rows on lanes — nrows pads to 128), matrices
(BE, nv, nrows). All reductions are lane/sublane VPU reduces; no MXU needed
at these sizes.

Dispatch: :func:`solver.apgd_solve` wraps the pure-XLA implementation in a
``jax.custom_batching.custom_vmap`` whose batch rule calls
:func:`apgd_solve_batched` — the vmapped engine step hits the kernel with
the full env batch while unbatched callers (unit tests, single-env tools)
keep the reference path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def _use_pallas() -> bool:
    if os.environ.get("ISAACLAB_TPU_PALLAS", "0") != "1":
        # default OFF: measured end-to-end the kernel is not faster than the
        # XLA loop at viable block sizes (BE=64: 2.5ms vs 2.2ms standalone;
        # larger blocks exceed VMEM) and the grid serializes against the
        # rest of the step. Kept as infrastructure; enable with
        # ISAACLAB_TPU_PALLAS=1.
        return False
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover - no backend at all
        return False
    # axon = remote-TPU tunnel PJRT plugin; compiles through the same Mosaic
    # toolchain as native tpu
    return backend in ("tpu", "axon")


def _apgd_kernel(ncon, iterations, Jt_ref, MJ_ref, b_ref, diag_ref, act_ref,
                 mu_ref, lam0_ref, out_ref):
    Jt = Jt_ref[:]  # (BE, nv, R)
    MJ = MJ_ref[:]  # (BE, nv, R)
    b = b_ref[:]  # (BE, R)
    act = act_ref[:]  # (BE, R)
    lam0 = lam0_ref[:] * act

    def A_mv(x):
        t = jnp.sum(MJ * (x * act)[:, None, :], axis=2)  # (BE, nv)
        y = jnp.sum(Jt * t[:, :, None], axis=1)  # (BE, R)
        return y * act

    if ncon:
        mu = mu_ref[:]  # (BE, ncon)

        def project(lam):
            lam_n = jnp.maximum(lam[:, :ncon], 0.0)
            t1 = lam[:, ncon : 2 * ncon]
            t2 = lam[:, 2 * ncon : 3 * ncon]
            t_norm = jnp.sqrt(t1 * t1 + t2 * t2)
            max_t = mu * lam_n
            scale = jnp.where(
                t_norm > max_t, max_t / jnp.maximum(t_norm, 1e-9), 1.0
            )
            lam = jnp.concatenate(
                [lam_n, t1 * scale, t2 * scale,
                 jnp.maximum(lam[:, 3 * ncon :], 0.0)],
                axis=1,
            )
            return lam * act

    else:

        def project(lam):
            return jnp.maximum(lam, 0.0) * act

    diag = diag_ref[:]
    if ncon:

        def power_body(_, v):
            av = A_mv(v)
            nrm = jnp.sqrt(jnp.sum(av * av, axis=1, keepdims=True))
            return av / jnp.maximum(nrm, 1e-12)

        nrm0 = jnp.sqrt(jnp.sum(act * act, axis=1, keepdims=True))
        v = act / jnp.maximum(nrm0, 1e-12)
        v = jax.lax.fori_loop(0, 6, power_body, v)
        av = A_mv(v)
        # active-row diag floor only (see solver.apgd_solve: inactive rows
        # carry skewed preconditioned diags that would collapse inv_L)
        L = jnp.maximum(
            jnp.maximum(
                jnp.sqrt(jnp.sum(av * av, axis=1, keepdims=True)),
                jnp.max(diag * act, axis=1, keepdims=True),
            ),
            1e-8,  # all-inactive envs: keep inv_L finite
        )
    else:
        L = 2.0 * jnp.maximum(
            jnp.max(diag * act, axis=1, keepdims=True), 1e-8
        )
    inv_L = 1.0 / (1.1 * L)  # (BE, 1)

    def apgd_body(_, carry):
        lam, y, theta = carry
        g = A_mv(y) + b
        lam_new = project(y - inv_L * g)
        theta_new = 0.5 * (jnp.sqrt(theta**4 + 4.0 * theta**2) - theta**2)
        beta = theta * (1.0 - theta) / (theta**2 + theta_new)
        y_new = lam_new + beta * (lam_new - lam)
        return lam_new, y_new, theta_new

    theta0 = jnp.ones_like(L)
    lam, _, _ = jax.lax.fori_loop(
        0, iterations, apgd_body, (lam0, lam0, theta0)
    )
    out_ref[:] = lam


def apgd_solve_batched(J_t, MinvJT, b, diag, active_f, mu, lam0, ncon,
                       iterations, block_envs: int = 64):
    """Batched APGD via the VMEM-resident Pallas kernel.

    J_t/MinvJT: (E, nv, R); b/diag/active_f/lam0: (E, R); mu: (E, ncon).
    """
    from jax.experimental import pallas as pl

    E, nv, R = J_t.shape
    BE = min(block_envs, E)
    pad = (-E) % BE
    if pad:
        padv = lambda x: jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        J_t, MinvJT, b, diag, active_f, lam0 = map(
            padv, (J_t, MinvJT, b, diag, active_f, lam0)
        )
        mu = padv(mu)
    Ep = E + pad
    mu_in = mu if ncon else jnp.zeros((Ep, 1), J_t.dtype)
    kernel = functools.partial(_apgd_kernel, ncon, iterations)
    lam = pl.pallas_call(
        kernel,
        grid=(Ep // BE,),
        in_specs=[
            pl.BlockSpec((BE, nv, R), lambda i: (i, 0, 0)),
            pl.BlockSpec((BE, nv, R), lambda i: (i, 0, 0)),
            pl.BlockSpec((BE, R), lambda i: (i, 0)),
            pl.BlockSpec((BE, R), lambda i: (i, 0)),
            pl.BlockSpec((BE, R), lambda i: (i, 0)),
            pl.BlockSpec((BE, mu_in.shape[1]), lambda i: (i, 0)),
            pl.BlockSpec((BE, R), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((BE, R), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Ep, R), J_t.dtype),
    )(J_t, MinvJT, b, diag, active_f, mu_in, lam0)
    return lam[:E]


_DISPATCH_CACHE: dict = {}


def _solve_chunk_envs(E: int, nv: int, R: int) -> int:
    """Env-chunk size for the batched APGD solve, 0 = no chunking.

    The APGD fori_loop re-reads its (E, nv, R) operands (J^T and M^-1 J^T)
    on every one of ~22 matrix-vector products. At flat/rough sizes
    (E=8192, nv=18, R=108) the two operands are ~100 MB — larger than VMEM
    — so the latency-hiding scheduler re-stages ~50 MB into scratch every
    substep at ~21 GB/s (the top two slices of the r5 flat device trace).
    Chunking the batch keeps each chunk's operands VMEM-resident across
    the whole iteration — but MEASURED it loses badly: flat@8192 dropped
    169k -> 25.9k env-steps/s with 4x2048 chunks (the sequential chunk
    loop multiplies the APGD loop latency and the slices still stream
    from HBM), and shadow@8192 was neutral. Default is therefore OFF;
    ISAACLAB_TPU_SOLVE_CHUNK=<envs> enables it for experimentation."""
    flag = os.environ.get("ISAACLAB_TPU_SOLVE_CHUNK")
    if flag is not None:
        return int(flag)
    return 0


def _chunked_vmap_solve(xla_fn, args, axis_size):
    """vmap(xla_fn) over the batch, optionally in sequential env chunks
    (lax.map) so the solve's operands stay VMEM-resident. See
    :func:`_solve_chunk_envs`."""
    J_t = args[0]
    _, nv, R = J_t.shape
    chunk = _solve_chunk_envs(axis_size, nv, R)
    if chunk <= 0 or axis_size <= chunk:
        return jax.vmap(xla_fn)(*args)
    pad = (-axis_size) % chunk
    if pad:
        args = [jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
                for a in args]
    C = (axis_size + pad) // chunk

    # chunk via dynamic_slice on the ORIGINAL layout — an (C, chunk, ...)
    # reshape forces a physical transpose copy of every operand per substep
    # (measured as the top copy-starts in the r5 shadow trace)
    def body(_, i):
        ops = [
            jax.lax.dynamic_slice_in_dim(a, i * chunk, chunk, axis=0)
            for a in args
        ]
        return 0, jax.vmap(xla_fn)(*ops)

    _, lam = jax.lax.scan(body, 0, jnp.arange(C))
    lam = lam.reshape((C * chunk,) + lam.shape[2:])
    return lam[:axis_size]


def make_apgd_dispatch(ncon: int, n_lim: int, iterations: int, xla_fn):
    """custom_vmap wrapper: unbatched calls use ``xla_fn`` (the reference
    implementation in solver.py); vmapped calls hit the Pallas kernel when
    on a TPU backend."""
    key = (ncon, n_lim, iterations)
    if key in _DISPATCH_CACHE:
        return _DISPATCH_CACHE[key]

    from jax.custom_batching import custom_vmap

    @custom_vmap
    def dispatch(J_t, MinvJT, b, diag, active_f, mu, lam0):
        return xla_fn(J_t, MinvJT, b, diag, active_f, mu, lam0)

    @dispatch.def_vmap
    def _rule(axis_size, in_batched, J_t, MinvJT, b, diag, active_f, mu, lam0):
        def bcast(x, batched):
            return x if batched else jnp.broadcast_to(
                x[None], (axis_size,) + x.shape
            )

        args = [
            bcast(a, ib)
            for a, ib in zip(
                (J_t, MinvJT, b, diag, active_f, mu, lam0), in_batched
            )
        ]
        if _use_pallas():
            lam = apgd_solve_batched(*args, ncon=ncon, iterations=iterations)
        else:
            lam = _chunked_vmap_solve(xla_fn, args, axis_size)
        return lam, True

    _DISPATCH_CACHE[key] = dispatch
    return dispatch
