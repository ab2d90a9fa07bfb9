"""Cubic-spline primitives for the DNDA pipeline.

The reference DNDA is a Python port of a C++ original whose spline is the
classic Forsythe–Malcolm–Moler (FMM) cubic with third-difference end
conditions (reference ``dnda_functions.spline/seval/SPL``, ``:91-251``) —
NOT scipy's not-a-knot or natural spline.  Matching its end conditions is
load-bearing for curvature values near segment ends, so we implement the
same algorithm, vectorized: the tridiagonal system is solved with a Thomas
sweep expressed over numpy arrays (the de-facto standard formulation of
this spline; written from the algorithm, not the reference source).

Evaluation at query points is fully vectorized (searchsorted + Horner) and
also returns the |y''| / (1+y'²)^{3/2} curvature the reference's ``seval``
produces.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SO_PATH = os.path.join(_REPO_ROOT, "native", "libdmvspline.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    """Attach prototypes; raises AttributeError on a stale pre-round .so."""
    dptr = ctypes.POINTER(ctypes.c_double)
    iptr = ctypes.POINTER(ctypes.c_int64)
    i32ptr = ctypes.POINTER(ctypes.c_int32)
    lib.dmv_fmm_spline.restype = ctypes.c_int
    lib.dmv_fmm_spline.argtypes = [ctypes.c_int64] + [dptr] * 5
    lib.dmv_spline_eval.restype = None
    lib.dmv_spline_eval.argtypes = (
        [ctypes.c_int64] + [dptr] * 5 + [ctypes.c_int64] + [dptr] * 3
    )
    lib.dmv_max_curvature.restype = ctypes.c_int
    lib.dmv_max_curvature.argtypes = [ctypes.c_int64, dptr, dptr, dptr]
    lib.dmv_frenet.restype = ctypes.c_int
    lib.dmv_frenet.argtypes = (
        [ctypes.c_int64, dptr, dptr, ctypes.c_int64] + [dptr] * 8
    )
    lib.dmv_frenet_two_pass.restype = ctypes.c_int
    lib.dmv_frenet_two_pass.argtypes = (
        [ctypes.c_int64, dptr, dptr, ctypes.c_int64, ctypes.c_double,
         ctypes.c_int64] + [dptr] * 8 + [iptr]
    )
    lib.dmv_max_curvature_batch.restype = ctypes.c_int
    lib.dmv_max_curvature_batch.argtypes = (
        [ctypes.c_int64, iptr, iptr, dptr, dptr, dptr, i32ptr]
    )
    lib.dmv_frenet_batch.restype = ctypes.c_int
    lib.dmv_frenet_batch.argtypes = (
        [ctypes.c_int64, iptr, iptr, dptr, dptr, ctypes.c_int64]
        + [dptr] * 8 + [i32ptr]
    )
    return lib


def _build(out_path: str) -> bool:
    src = os.path.join(_REPO_ROOT, "native", "dnda_spline.cpp")
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-fPIC", "-shared", src, "-o", out_path],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load_native() -> Optional[ctypes.CDLL]:
    """Native spline/Frenet/curvature kernels (numpy-oracle arithmetic —
    see native/dnda_spline.cpp).

    Staleness handling: the .so is rebuilt BEFORE first load when the
    source is newer (the .so is untracked and can survive from an older
    build), and a symbol-probe failure rebuilds to a unique path —
    re-dlopening the original path would return the already-mapped stale
    image (glibc dedups by pathname)."""
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        src = os.path.join(_REPO_ROOT, "native", "dnda_spline.cpp")
        stale = (
            not os.path.exists(_SO_PATH)
            or (
                os.path.exists(src)
                and os.path.getmtime(src) > os.path.getmtime(_SO_PATH)
            )
        )
        if stale and not _build(_SO_PATH):
            _lib_failed = True
            return None
        try:
            _lib = _bind(ctypes.CDLL(_SO_PATH))
            return _lib
        except OSError:
            _lib_failed = True
            return None
        except AttributeError:
            # stale symbols despite mtimes (e.g. clock skew): rebuild to a
            # unique path — the original pathname is already mapped
            alt = f"{_SO_PATH}.{os.getpid()}"
            try:
                if _build(alt):
                    _lib = _bind(ctypes.CDLL(alt))
                    os.replace(alt, _SO_PATH)  # fresh build wins next time
                    return _lib
            except Exception:
                pass
            finally:
                if os.path.exists(alt) and _lib is None:
                    os.remove(alt)
            _lib_failed = True
            return None


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def max_curvature_native(x: np.ndarray, y: np.ndarray) -> Optional[float]:
    """Native chord-rotate + fit + curvature-max (paths._max_curvature);
    None → caller should fall back to the numpy path."""
    lib = _load_native()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, float)
    y = np.ascontiguousarray(y, float)
    out = ctypes.c_double()
    rc = lib.dmv_max_curvature(len(x), _dptr(x), _dptr(y), ctypes.byref(out))
    if rc != 0:
        return None
    return out.value


def frenet_native(pts: np.ndarray, m_equal: int):
    """Native uniform-arc resample (frenet.cartesian_to_frenet); returns
    the same tuple, or None → numpy fallback."""
    lib = _load_native()
    if lib is None:
        return None
    pts = np.ascontiguousarray(pts, float)
    n = pts.shape[0]
    px = np.ascontiguousarray(pts[:, 0])
    py = np.ascontiguousarray(pts[:, 1])
    m1 = m_equal + 1
    tx, ty = np.empty(m1), np.empty(m1)
    bx, cx, by, cy = np.empty(m1), np.empty(m1), np.empty(m1), np.empty(m1)
    ua, al = ctypes.c_double(), ctypes.c_double()
    rc = lib.dmv_frenet(
        n, _dptr(px), _dptr(py), m_equal,
        _dptr(tx), _dptr(ty), _dptr(bx), _dptr(cx), _dptr(by), _dptr(cy),
        ctypes.byref(ua), ctypes.byref(al),
    )
    if rc != 0:
        return None
    trans = np.column_stack([tx, ty])
    s_grid = np.arange(m_equal + 1) * ua.value
    return ua.value, al.value, trans, bx, cx, by, cy, s_grid


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _concat_batch(xs_list, ys_list):
    ns = np.array([len(x) for x in xs_list], np.int64)
    off = np.zeros(len(ns), np.int64)
    np.cumsum(ns[:-1], out=off[1:])
    xs = np.ascontiguousarray(np.concatenate(xs_list), float)
    ys = np.ascontiguousarray(np.concatenate(ys_list), float)
    return ns, off, xs, ys


def max_curvature_batch_native(xs_list, ys_list):
    """K paths' :func:`max_curvature_native` in ONE ctypes crossing (the
    per-call marshaling dominates at cluster-generation call counts).

    Returns a list of floats (entries ``None`` where the native kernel
    reported an error — the caller dispatches those through the scalar
    path, preserving its numpy-fallback/raise semantics exactly), or
    ``None`` when the library is unavailable."""
    lib = _load_native()
    if lib is None or not xs_list:
        return None
    ns, off, xs, ys = _concat_batch(xs_list, ys_list)
    k_out = np.empty(len(ns))
    rc = np.zeros(len(ns), np.int32)
    lib.dmv_max_curvature_batch(
        len(ns), _iptr(ns), _iptr(off), _dptr(xs), _dptr(ys), _dptr(k_out),
        rc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return [float(k) if r == 0 else None for k, r in zip(k_out, rc)]


def frenet_batch_native(xs_list, ys_list, m_equal: int):
    """K paths' :func:`frenet_native` at a SHARED ``m_equal`` in ONE ctypes
    crossing.  Returns raw batch arrays
    ``(ua (K,), al (K,), tx, ty, bx, cx, by, cy  — each (K, m_equal+1), rc
    (K,) int32)`` so the caller consumes them batched without per-path
    restacking; rows with ``rc != 0`` are uninitialized and must be filled
    through the scalar dispatch (preserving its fallback/raise semantics).
    Returns ``None`` when the library is unavailable."""
    lib = _load_native()
    if lib is None or not xs_list:
        return None
    ns, off, xs, ys = _concat_batch(xs_list, ys_list)
    k, m1 = len(ns), m_equal + 1
    tx, ty = np.empty((k, m1)), np.empty((k, m1))
    bx, cx = np.empty((k, m1)), np.empty((k, m1))
    by, cy = np.empty((k, m1)), np.empty((k, m1))
    ua, al = np.empty(k), np.empty(k)
    rc = np.zeros(k, np.int32)
    lib.dmv_frenet_batch(
        k, _iptr(ns), _iptr(off), _dptr(xs), _dptr(ys), m_equal,
        _dptr(tx), _dptr(ty), _dptr(bx), _dptr(cx), _dptr(by), _dptr(cy),
        _dptr(ua), _dptr(al),
        rc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return ua, al, tx, ty, bx, cx, by, cy, rc


def frenet_two_pass_native(pts: np.ndarray, m_coarse: int, unit_len: float):
    """Fused coarse-measure → fine-resample Frenet pass (ONE ctypes
    crossing instead of two scalar :func:`frenet_native` calls — the
    per-frame hot path of ``core.prepare_frame``).

    Returns ``(unit_arc, arc_len, trans, bx, cx, by, cy, s_grid, m_equal)``
    — the fine-pass tuple plus the chosen ``m_equal`` — or ``None`` when
    the library is unavailable or the kernel rejects the input (caller
    falls back to the two scalar dispatches, preserving their semantics;
    ``m_equal`` there is ``round(arc_len / unit_len)``, which the kernel
    matches via ties-to-even ``nearbyint``)."""
    lib = _load_native()
    if lib is None:
        return None
    pts = np.ascontiguousarray(pts, float)
    px = np.ascontiguousarray(pts[:, 0])
    py = np.ascontiguousarray(pts[:, 1])
    cap = max(4 * pts.shape[0], 512)
    tx, ty = np.empty(cap + 1), np.empty(cap + 1)
    bx, cx = np.empty(cap + 1), np.empty(cap + 1)
    by, cy = np.empty(cap + 1), np.empty(cap + 1)
    ua, al = ctypes.c_double(), ctypes.c_double()
    m_eq = ctypes.c_int64()
    rc = lib.dmv_frenet_two_pass(
        pts.shape[0], _dptr(px), _dptr(py), m_coarse, unit_len, cap,
        _dptr(tx), _dptr(ty), _dptr(bx), _dptr(cx), _dptr(by), _dptr(cy),
        ctypes.byref(ua), ctypes.byref(al), ctypes.byref(m_eq),
    )
    if rc != 0:
        return None
    m1 = m_eq.value + 1
    trans = np.column_stack([tx[:m1], ty[:m1]])
    s_grid = np.arange(m1) * ua.value
    return (ua.value, al.value, trans, bx[:m1], cx[:m1], by[:m1], cy[:m1],
            s_grid, m_eq.value)


def fmm_spline_coeffs(x: np.ndarray, y: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """FMM cubic-spline coefficients (b, c, d) at the knots.

    s(t) = y_i + b_i·w + c_i·w² + d_i·w³ for w = t − x_i on [x_i, x_{i+1}].
    Requires strictly increasing x.  n = 2 degenerates to a line.
    """
    x = np.ascontiguousarray(x, float)
    y = np.ascontiguousarray(y, float)
    n = len(x)
    if n < 2:
        raise ValueError("need at least 2 points")
    if not np.all(np.diff(x) > 0):
        raise ValueError("x must be strictly increasing")

    lib = _load_native()
    if lib is not None:
        dptr = ctypes.POINTER(ctypes.c_double)
        b = np.empty(n)
        c = np.empty(n)
        d = np.empty(n)
        rc = lib.dmv_fmm_spline(
            n,
            x.ctypes.data_as(dptr), y.ctypes.data_as(dptr),
            b.ctypes.data_as(dptr), c.ctypes.data_as(dptr),
            d.ctypes.data_as(dptr),
        )
        if rc == 0:
            return b, c, d
        raise ValueError(f"native spline failed with code {rc}")

    b = np.zeros(n)
    c = np.zeros(n)
    d = np.zeros(n)
    if n == 2:
        b[:] = (y[1] - y[0]) / (x[1] - x[0])
        return b, c, d

    h = np.diff(x)  # (n-1,)
    # tridiagonal: diag, rhs
    diag = np.zeros(n)
    rhs = np.zeros(n)
    diag[1:-1] = 2.0 * (h[:-1] + h[1:])
    slope = np.diff(y) / h
    rhs[1:-1] = np.diff(slope)

    # FMM end conditions (third differences)
    diag[0] = -h[0]
    diag[-1] = -h[-1]
    if n == 3:
        rhs[0] = 0.0
        rhs[-1] = 0.0
    else:
        c3 = np.diff(slope)  # second slope differences
        rhs[0] = (c3[1] / (x[3] - x[1]) - c3[0] / (x[2] - x[0])) * h[0] ** 2 / (
            x[3] - x[0]
        )
        rhs[-1] = -(
            c3[-1] / (x[-1] - x[-3]) - c3[-2] / (x[-2] - x[-4])
        ) * h[-1] ** 2 / (x[-1] - x[-4])

    # Thomas forward elimination (sub/super diagonals are h)
    cp = np.zeros(n)  # modified diag
    dp = np.zeros(n)  # modified rhs
    cp[0] = diag[0]
    dp[0] = rhs[0]
    for i in range(1, n):
        m = h[i - 1] / cp[i - 1]
        cp[i] = diag[i] - m * h[i - 1]
        dp[i] = rhs[i] - m * dp[i - 1]
    sigma = np.zeros(n)
    sigma[-1] = dp[-1] / cp[-1]
    for i in range(n - 2, -1, -1):
        sigma[i] = (dp[i] - h[i] * sigma[i + 1]) / cp[i]

    c = sigma
    b[:-1] = slope - h * (c[1:] + 2.0 * c[:-1])
    d[:-1] = (c[1:] - c[:-1]) / h
    b[-1] = slope[-1] + h[-1] * (c[-2] + 2.0 * c[-1])
    c = 3.0 * c
    d[-1] = d[-2]
    return b, c, d


def spline_eval(
    x: np.ndarray,
    y: np.ndarray,
    b: np.ndarray,
    c: np.ndarray,
    d: np.ndarray,
    u: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """Evaluate the spline and its |curvature| at points u (vectorized
    equivalent of the reference's ``seval`` loop)."""
    u = np.asarray(u, float)
    idx = np.clip(np.searchsorted(x, u, side="right") - 1, 0, len(x) - 2)
    w = u - x[idx]
    d1 = 3 * d[idx] * w**2 + 2 * c[idx] * w + b[idx]
    d2 = 6 * d[idx] * w + 2 * c[idx]
    curvature = np.abs(d2) / (1 + d1**2) ** 1.5
    val = y[idx] + w * (b[idx] + w * (c[idx] + w * d[idx]))
    return val, curvature


def spline_curvature(x: np.ndarray, y: np.ndarray, u: np.ndarray) -> np.ndarray:
    """Max-curvature helper: fit + evaluate curvature at u."""
    b, c, d = fmm_spline_coeffs(x, y)
    _, k = spline_eval(x, y, b, c, d, u)
    return k
