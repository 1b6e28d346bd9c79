"""Native (C++) host extensions, built on demand via g++ + ctypes.

Replaces the reference stack's native host-side pieces with from-scratch
equivalents (SURVEY.md §2.9b): the pyrender/EGL offscreen renderer becomes
`rasterize_mesh` (rasterizer.cpp).  GPU-side native code (cuRoPE, xFormers)
is replaced by Pallas kernels (ops/pallas/), not host C++.

A pure-numpy fallback keeps everything functional without a toolchain.
"""
from __future__ import annotations

import ctypes
import hashlib
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

import numpy as np

_SRC_DIR = Path(__file__).parent
_lib: Optional[ctypes.CDLL] = None
_build_failed = False
_lap_lib: Optional[ctypes.CDLL] = None
_lap_failed = False


def _compile(src: Path, stem: str) -> ctypes.CDLL:
    tag = hashlib.sha1(src.read_bytes()).hexdigest()[:12]
    out = Path(tempfile.gettempdir()) / f"panst3r_{stem}_{tag}.so"
    if not out.exists():
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", str(src), "-o", str(out)],
            check=True, capture_output=True, timeout=120)
    return ctypes.CDLL(str(out))


def _build() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        lib = _compile(_SRC_DIR / "rasterizer.cpp", "rasterizer")
        lib.rasterize_mesh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32)]
        lib.rasterize_mesh.restype = None
        _lib = lib
    except Exception:
        _build_failed = True
    return _lib


def _build_lap() -> Optional[ctypes.CDLL]:
    global _lap_lib, _lap_failed
    if _lap_lib is not None or _lap_failed:
        return _lap_lib
    try:
        lib = _compile(_SRC_DIR / "lap.cpp", "lap")
        lib.solve_lap.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        lib.solve_lap.restype = ctypes.c_int
        _lap_lib = lib
    except Exception:
        _lap_failed = True
    return _lap_lib


def lap_jv(cost: np.ndarray) -> Optional[tuple]:
    """Exact min-cost assignment (native shortest-augmenting-path solver,
    lap.cpp).  cost: (R, C) dense.  Returns (row_ind, col_ind) covering
    min(R, C) pairs, row_ind ascending — scipy `linear_sum_assignment`
    surface.  None if the native build is unavailable (caller falls back)."""
    lib = _build_lap()
    if lib is None:
        return None
    cost = np.ascontiguousarray(cost, np.float64)
    if np.isnan(cost).any():
        # scipy surface parity: NaN entries are an error (inf = forbidden
        # assignment is allowed and may make the problem infeasible).
        raise ValueError("matrix contains invalid numeric entries")
    R, C = cost.shape
    transpose = R > C
    if transpose:
        cost = np.ascontiguousarray(cost.T)
    nr, nc = cost.shape
    out = np.empty(nr, np.int64)
    rc = lib.solve_lap(
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(nr), ctypes.c_int64(nc),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if rc != 0:
        raise ValueError("cost matrix is infeasible")
    if transpose:
        rows, cols = out, np.arange(nr, dtype=np.int64)
        order = np.argsort(rows)
        return rows[order], cols[order]
    return np.arange(nr, dtype=np.int64), out


def _rasterize_numpy(verts, faces, face_labels, K, H, W):
    """Vectorized-ish numpy fallback (slow; preprocessing only)."""
    depth = np.zeros((H, W), np.float32)
    label = np.zeros((H, W), np.int32)
    fx, cx, fy, cy = K[0, 0], K[0, 2], K[1, 1], K[1, 2]
    tri = verts[faces]                                   # (F, 3, 3)
    z = tri[..., 2]
    ok = (z > 1e-6).all(-1)
    for f in np.nonzero(ok)[0]:
        v = tri[f]
        x = fx * v[:, 0] / v[:, 2] + cx
        y = fy * v[:, 1] / v[:, 2] + cy
        xmin, xmax = int(np.floor(x.min())), int(np.ceil(x.max()))
        ymin, ymax = int(np.floor(y.min())), int(np.ceil(y.max()))
        xmin, xmax = max(xmin, 0), min(xmax, W - 1)
        ymin, ymax = max(ymin, 0), min(ymax, H - 1)
        if xmin > xmax or ymin > ymax:
            continue
        area = (x[1] - x[0]) * (y[2] - y[0]) - (x[2] - x[0]) * (y[1] - y[0])
        if abs(area) < 1e-12:
            continue
        px, py = np.meshgrid(np.arange(xmin, xmax + 1) + 0.5,
                             np.arange(ymin, ymax + 1) + 0.5)
        w0 = ((x[1] - px) * (y[2] - py) - (x[2] - px) * (y[1] - py)) / area
        w1 = ((x[2] - px) * (y[0] - py) - (x[0] - px) * (y[2] - py)) / area
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not inside.any():
            continue
        iz = w0 / v[0, 2] + w1 / v[1, 2] + w2 / v[2, 2]
        zb = np.where(inside, 1.0 / np.maximum(iz, 1e-12), np.inf)
        sub_d = depth[ymin:ymax + 1, xmin:xmax + 1]
        sub_l = label[ymin:ymax + 1, xmin:xmax + 1]
        closer = inside & ((sub_d == 0) | (zb < sub_d))
        sub_d[closer] = zb[closer].astype(np.float32)
        sub_l[closer] = face_labels[f]
    return depth, label


def rasterize_mesh(verts: np.ndarray, faces: np.ndarray,
                   face_labels: np.ndarray, K: np.ndarray,
                   H: int, W: int) -> tuple[np.ndarray, np.ndarray]:
    """Render depth (m) + instance-label maps from a camera-space mesh.

    verts: (N, 3) float32 camera-space; faces: (F, 3) int32;
    face_labels: (F,) int32 (0 = background); K: (3, 3) intrinsics.
    """
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    face_labels = np.ascontiguousarray(face_labels, np.int32)
    Kf = np.ascontiguousarray(K, np.float32)

    lib = _build()
    if lib is None:
        return _rasterize_numpy(verts, faces, face_labels, Kf, H, W)

    depth = np.zeros(H * W, np.float32)
    label = np.zeros(H * W, np.int32)
    lib.rasterize_mesh(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(verts)),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(len(faces)),
        face_labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        Kf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int32(H), ctypes.c_int32(W),
        depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        label.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return depth.reshape(H, W), label.reshape(H, W)
