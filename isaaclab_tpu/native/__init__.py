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
