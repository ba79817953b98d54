"""Native host-kernel library (C++ via ctypes; the runtime-native component
paralleling the reference's Omniverse/USD + Warp host tooling, SURVEY.md
§2.10). Compiled on first use with g++; every entry point has a NumPy
fallback so the framework degrades gracefully without a toolchain."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "host_kernels.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "libisaaclab_host.so")
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) or (
        os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.rasterize_mesh_to_heightfield.argtypes = [
        f32p, ctypes.c_int64, i32p, ctypes.c_int64,
        f32p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
    ]
    lib.hf_random_uniform.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_uint64,
    ]
    lib.hf_limit_slope.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_float, ctypes.c_int,
    ]
    lib.sdf_from_mesh.argtypes = [
        f32p, ctypes.c_int64, i32p, ctypes.c_int64,
        f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
    ]
    _lib = lib
    return _lib


def rasterize_mesh_to_heightfield(verts, tris, rows, cols, hscale,
                                  origin_x, origin_y, fill=0.0):
    """Triangle soup -> top-surface height field. Native when available."""
    verts = np.ascontiguousarray(verts, dtype=np.float32)
    tris = np.ascontiguousarray(tris, dtype=np.int32)
    out = np.empty((rows, cols), dtype=np.float32)
    lib = get_lib()
    if lib is not None:
        lib.rasterize_mesh_to_heightfield(
            verts, verts.shape[0], tris, tris.shape[0],
            out, rows, cols, hscale, origin_x, origin_y, fill,
        )
        return out
    # NumPy fallback: per-triangle barycentric rasterization
    out[:] = fill
    xs = origin_x + (np.arange(rows) + 0.5) * hscale
    ys = origin_y + (np.arange(cols) + 0.5) * hscale
    for t in tris:
        a, b, c = verts[t[0]], verts[t[1]], verts[t[2]]
        r0 = max(0, int(np.floor((min(a[0], b[0], c[0]) - origin_x) / hscale - 0.5)))
        r1 = min(rows - 1, int(np.ceil((max(a[0], b[0], c[0]) - origin_x) / hscale)))
        c0 = max(0, int(np.floor((min(a[1], b[1], c[1]) - origin_y) / hscale - 0.5)))
        c1 = min(cols - 1, int(np.ceil((max(a[1], b[1], c[1]) - origin_y) / hscale)))
        if r1 < r0 or c1 < c0:
            continue
        d = (b[1] - c[1]) * (a[0] - c[0]) + (c[0] - b[0]) * (a[1] - c[1])
        if abs(d) < 1e-12:
            continue
        px = xs[r0 : r1 + 1][:, None]
        py = ys[c0 : c1 + 1][None, :]
        w0 = ((b[1] - c[1]) * (px - c[0]) + (c[0] - b[0]) * (py - c[1])) / d
        w1 = ((c[1] - a[1]) * (px - a[0]) + (a[0] - c[0]) * (py - a[1])) / d
        w2 = 1.0 - w0 - w1
        inside = (w0 >= -1e-5) & (w1 >= -1e-5) & (w2 >= -1e-5)
        z = w0 * a[2] + w1 * b[2] + w2 * c[2]
        patch = out[r0 : r1 + 1, c0 : c1 + 1]
        out[r0 : r1 + 1, c0 : c1 + 1] = np.where(
            inside, np.maximum(patch, z), patch
        )
    return out


def sdf_from_mesh(verts, tris, nx, ny, nz, origin, spacing):
    """Triangle mesh -> (nx, ny, nz) signed-distance grid (the factory-task
    SDF collision precompute, reference direct/factory SDF meshes). Sign by
    z-ray crossing parity — meshes must be watertight. Native when
    available; the NumPy fallback is exact but chunked (test-scale grids)."""
    verts = np.ascontiguousarray(verts, dtype=np.float32)
    tris = np.ascontiguousarray(tris, dtype=np.int32)
    out = np.empty(nx * ny * nz, dtype=np.float32)
    lib = get_lib()
    if lib is not None:
        lib.sdf_from_mesh(
            verts, verts.shape[0], tris, tris.shape[0], out, nx, ny, nz,
            float(origin[0]), float(origin[1]), float(origin[2]),
            float(spacing),
        )
        return out.reshape(nx, ny, nz)
    # NumPy fallback: vectorized point-triangle distance in chunks + the
    # same z-column ray parity
    a = verts[tris[:, 0]].astype(np.float64)  # (nt, 3)
    b = verts[tris[:, 1]].astype(np.float64)
    c = verts[tris[:, 2]].astype(np.float64)
    gx = origin[0] + spacing * np.arange(nx)
    gy = origin[1] + spacing * np.arange(ny)
    gz = origin[2] + spacing * np.arange(nz)
    pts = np.stack(np.meshgrid(gx, gy, gz, indexing="ij"), axis=-1).reshape(
        -1, 3
    )
    dist = np.empty(pts.shape[0])
    for s in range(0, pts.shape[0], 2048):
        p = pts[s : s + 2048, None, :]  # (m, 1, 3)
        dist[s : s + 2048] = np.sqrt(
            _point_tri_dist2_np(p, a[None], b[None], c[None]).min(axis=1)
        )
    # sign: per-column crossing parity
    sign = np.ones((nx, ny, nz))
    d = (b[:, 1] - c[:, 1]) * (a[:, 0] - c[:, 0]) + (c[:, 0] - b[:, 0]) * (
        a[:, 1] - c[:, 1]
    )
    ok = np.abs(d) > 1e-14
    jx, jy = 7.07e-4 * spacing, 3.33e-4 * spacing  # see sdf_from_mesh (C++)
    for ix in range(nx):
        for iy in range(ny):
            px, py = gx[ix] + jx, gy[iy] + jy
            w0 = (
                (b[:, 1] - c[:, 1]) * (px - c[:, 0])
                + (c[:, 0] - b[:, 0]) * (py - c[:, 1])
            ) / np.where(ok, d, 1.0)
            w1 = (
                (c[:, 1] - a[:, 1]) * (px - a[:, 0])
                + (a[:, 0] - c[:, 0]) * (py - a[:, 1])
            ) / np.where(ok, d, 1.0)
            w2 = 1.0 - w0 - w1
            hit = ok & (w0 >= 0) & (w1 >= 0) & (w2 > 0)
            zs = np.sort(w0[hit] * a[hit, 2] + w1[hit] * b[hit, 2] + w2[hit] * c[hit, 2])
            inside = (np.searchsorted(zs, gz, side="left") % 2) == 1
            sign[ix, iy, inside] = -1.0
    return (sign.reshape(-1) * dist).reshape(nx, ny, nz).astype(np.float32)


def _point_tri_dist2_np(p, a, b, c):
    """Vectorized Ericson closest-point-on-triangle squared distance.
    Shapes broadcast: p (m,1,3), a/b/c (1,nt,3) -> (m,nt)."""
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = np.sum(ab * ap, -1)
    d2 = np.sum(ac * ap, -1)
    bp = p - b
    d3 = np.sum(ab * bp, -1)
    d4 = np.sum(ac * bp, -1)
    cp = p - c
    d5 = np.sum(ab * cp, -1)
    d6 = np.sum(ac * cp, -1)
    vc = d1 * d4 - d3 * d2
    vb = d5 * d2 - d1 * d6
    va = d3 * d6 - d5 * d4
    eps = 1e-30
    v_ab = np.clip(d1 / np.where(np.abs(d1 - d3) > eps, d1 - d3, 1.0), 0, 1)
    w_ac = np.clip(d2 / np.where(np.abs(d2 - d6) > eps, d2 - d6, 1.0), 0, 1)
    w_bc = np.clip(
        (d4 - d3)
        / np.where(np.abs((d4 - d3) + (d5 - d6)) > eps, (d4 - d3) + (d5 - d6), 1.0),
        0,
        1,
    )
    denom = va + vb + vc
    v_in = vb / np.where(np.abs(denom) > eps, denom, 1.0)
    w_in = vc / np.where(np.abs(denom) > eps, denom, 1.0)
    # region select (mirrors the scalar branch cascade)
    q = a + ab * v_in[..., None] + ac * w_in[..., None]  # interior default
    q_bc = b + (c - b) * w_bc[..., None]
    q = np.where(
        ((va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0))[..., None], q_bc, q
    )
    q_ac = a + ac * w_ac[..., None]
    q = np.where(((vb <= 0) & (d2 >= 0) & (d6 <= 0))[..., None], q_ac, q)
    q_ab = a + ab * v_ab[..., None]
    q = np.where(((vc <= 0) & (d1 >= 0) & (d3 <= 0))[..., None], q_ab, q)
    q = np.where(((d6 >= 0) & (d5 <= d6))[..., None], c, q)
    q = np.where(((d3 >= 0) & (d4 <= d3))[..., None], b, q)
    q = np.where(((d1 <= 0) & (d2 <= 0))[..., None], a, q)
    return np.sum((p - q) ** 2, -1)


def hf_limit_slope(hf, max_step, iterations=2):
    """Clamp cell-to-cell height jumps (slope_threshold correction)."""
    hf = np.ascontiguousarray(hf, dtype=np.float32)
    lib = get_lib()
    if lib is not None:
        lib.hf_limit_slope(hf, hf.shape[0], hf.shape[1], max_step, iterations)
        return hf
    for _ in range(iterations):
        hf[:-1] = np.minimum(hf[:-1], hf[1:] + max_step)
        hf[:, :-1] = np.minimum(hf[:, :-1], hf[:, 1:] + max_step)
    return hf
