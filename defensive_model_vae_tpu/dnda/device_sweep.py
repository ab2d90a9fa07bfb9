"""Device-resident DNDA collision sweep (SAT + first-hit + SV prediction).

Batched JAX port of the per-frame host kernels in :mod:`.collision`
(reference ``Generate_surVehicle_Traj``/``Collison_Detection``,
``dnda_functions.py:1343-1616``), per the SURVEY §2 native-equivalents
directive: the path × step × vehicle separating-axis sweep as one batched
tensor op over (frames × paths × ego-points × vehicles × 4 axes).

All frames of an episode (or a whole SUT sweep) are padded to static
bucketed shapes and processed in 256-frame chunks: one jitted vmapped
program per chunk (dispatched from Python — a scan over chunks lets XLA
hoist chunk-invariant broadcasts into a whole-batch allocation).  The
data-dependent parts of DNDA (path-cluster lengthening, Frenet resampling)
stay on the host in :func:`..dnda.core.prepare_frame`.

Precision: the ceil-based first-hit window bookkeeping always runs in
float64 (``jax.enable_x64`` scope) — its integer boundaries are
rounding-sensitive; the SAT geometry runs in ``sat_dtype`` (float32
default, halving the host↔device transfer).  Both precisions are
validated index-identical to the numpy oracle in :mod:`.collision` on the
full real-episode corpus (``tests/test_dnda.py``).
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence

import numpy as np

import jax
import jax.numpy as jnp


def _predict_rects(sur: jnp.ndarray, t: jnp.ndarray):
    """(V, 9) vehicle rows → corner component arrays
    (rx0..rx3, ry0..ry3), each (V, T+1).

    Vectorized port of ``collision.predict_surrounding_rectangles``
    (reference ``:1343-1451``) including the stop-on-reversal freeze, the
    ``arctan(vy/vx)`` heading convention (not atan2), and the
    stationary-vehicle special case ``heading + 1.57``.  Components (not a
    (V, T+1, 2, 4) tensor) keep the minor dims large for TPU tiling.
    """
    x0, y0, length, width = sur[:, 0], sur[:, 1], sur[:, 2], sur[:, 3]
    sx, sy, ax, ay, hdg = sur[:, 4], sur[:, 5], sur[:, 6], sur[:, 7], sur[:, 8]

    vx = sx[:, None] + ax[:, None] * t[None, :]  # (V, T+1)
    vy = sy[:, None] + ay[:, None] * t[None, :]
    sp2 = vx**2 + vy**2
    dots = vx[:, :-1] * vx[:, 1:] + vy[:, :-1] * vy[:, 1:]
    stop_at = jnp.concatenate(
        [jnp.zeros_like(sp2[:, :1], dtype=bool), (dots <= 0) | (sp2[:, 1:] == 0)],
        axis=1,
    )
    any_stop = stop_at.any(axis=1)
    j_stop = jnp.argmax(stop_at, axis=1)  # first stop step (>=1 when any)
    idx = jnp.arange(t.shape[0])
    frozen = any_stop[:, None] & (idx[None, :] >= j_stop[:, None])
    t_freeze = t[jnp.maximum(j_stop - 1, 0)]  # (V,)
    t_eff = jnp.where(frozen, t_freeze[:, None], t[None, :])

    x = x0[:, None] + sx[:, None] * t_eff + 0.5 * ax[:, None] * t_eff**2
    y = y0[:, None] + sy[:, None] * t_eff + 0.5 * ay[:, None] * t_eff**2

    vx_safe = jnp.where(vx == 0, 1.0, vx)
    theta_free = jnp.where(vx == 0, 1.5708, jnp.arctan(vy / vx_safe))
    theta_free = theta_free.at[:, 0].set(
        jnp.where(sp2[:, 0] == 0, hdg + 1.57, theta_free[:, 0])
    )
    # per-branch freeze (see collision.predict_surrounding_rectangles —
    # the reference's vx==0 branch assigns 1.5708 even on frozen steps):
    # forward-fill theta from the last "set" step
    override = (vx == 0) & (sp2 != 0)
    set_mask = (~frozen) | override
    set_mask = set_mask.at[:, 0].set(True)
    fill = jax.lax.cummax(
        jnp.where(set_mask, idx[None, :], -1), axis=1
    )
    theta = jnp.take_along_axis(theta_free, fill, axis=1)

    half_l, half_w = (length / 2)[:, None], (width / 2)[:, None]  # (V, 1)
    base_x = (half_l, -half_l, -half_l, half_l)
    base_y = (-half_w, -half_w, half_w, half_w)
    c, s = jnp.cos(theta), jnp.sin(theta)  # (V, T+1)
    # R @ base + pos, written per component (same a·b + c·d arithmetic as
    # the numpy einsum): rx = c·bx − s·by + x, ry = s·bx + c·by + y
    rx = tuple(c * bx + -s * by + x for bx, by in zip(base_x, base_y))
    ry = tuple(s * bx + c * by + y for bx, by in zip(base_x, base_y))
    return rx + ry


def _sat_components(a_xy, b_xy) -> jnp.ndarray:
    """Separating-axis overlap test, same math as ``collision.sat_collision``
    (reference ``:1526-1616``), expressed over scalar component arrays so
    every intermediate keeps the LARGE dims (paths × points) in the minor
    axes — corner-matrix-shaped tensors with trailing (2, 4) dims tile to
    (…, 4, 128) on TPU, a 32× memory blowup at sweep batch sizes.

    a_xy / b_xy: tuples (x0..x3, y0..y3) of corner coordinate arrays; the
    two sides broadcast against each other.  Returns boolean overlap array.
    """
    ax, ay = a_xy
    bx, by = b_xy
    # edge vectors (the reference's check axes): a1, a2, b1, b2
    axes = (
        (ax[1] - ax[0], ay[1] - ay[0]),
        (ax[2] - ax[1], ay[2] - ay[1]),
        (bx[1] - bx[0], by[1] - by[0]),
        (bx[2] - bx[1], by[2] - by[1]),
    )
    # half-edge vectors used for the projection radius (0.5 * check)
    halves = [(0.5 * ex, 0.5 * ey) for ex, ey in axes]

    cvx = (bx[1] + bx[3]) / 2 - (ax[1] + ax[3]) / 2
    cvy = (by[1] + by[3]) / 2 - (ay[1] + ay[3]) / 2

    separated = None
    for ex, ey in axes:
        norm = jnp.sqrt(ex**2 + ey**2)
        safe = jnp.where(norm == 0, 1.0, norm)
        ux, uy = ex / safe, ey / safe  # division, matching the numpy oracle
        radius = None
        for hx, hy in halves:
            term = jnp.abs(ux * hx + uy * hy)
            radius = term if radius is None else radius + term
        sep = jnp.abs(ux * cvx + uy * cvy) > radius
        separated = sep if separated is None else separated | sep
    return ~separated


def _frame_sweep(
    frame, *, n_time: int, time_step: float, time_horizon: float,
    sat_dtype=None,
):
    """One frame: ego corner sweeps + (V, 9) vehicles → (P,) first-hit
    collision indices, mirroring ``collision.collision_indices``
    (reference scan ``:1491-1524``).

    ``sat_dtype``: dtype for the SAT geometry tensors (the big arrays).
    The ceil-based window bookkeeping always stays in f64 — its integer
    boundaries are far more rounding-sensitive than the rectangle-overlap
    booleans.  f32 SAT is validated against the f64/numpy oracle on the
    full real-episode corpus in tests/test_dnda.py."""
    ego_rects, unit_arc, speed, sur, veh_mask, n_pts = frame
    # ego_rects layout: (2, 4, P, N) — xy component × corner × path × point
    P, N = ego_rects.shape[2], ego_rects.shape[3]
    t = jnp.arange(n_time + 1) * time_step

    sur_comp = _predict_rects(sur, t)  # 8 × (V, T+1)

    jgrid = jnp.arange(n_time + 1)
    # same evaluation order as the numpy oracle: ceil(speed * j * dt / u)
    bounds = jnp.ceil(speed * jgrid[None, :] * time_step / unit_arc[:, None])
    n_idx = jnp.arange(N)
    j_of_n = jnp.sum(
        n_idx[None, :, None] >= bounds[:, None, :], axis=-1
    ) - 1  # (P, N): last j with bounds[j] <= n
    # points past a path's real length don't exist in the host scan
    checked = (
        (j_of_n >= 0)
        & (j_of_n < n_time)
        & (n_idx[None, :] < bounds[:, -1:])
        & (n_idx[None, :] < n_pts[:, None])
    )
    j_clip = jnp.clip(j_of_n, 0, n_time)
    bj = jnp.take_along_axis(bounds, j_clip, axis=1)
    in_window = checked & (n_idx[None, :] >= bj)

    # corner component arrays: ego (P, N) per corner, sur gathered to
    # (V, P, N) per corner — keeps (P, N) minor for TPU tiling
    jc = j_clip.reshape(-1)
    cast = (lambda a: a.astype(sat_dtype)) if sat_dtype is not None else (lambda a: a)
    ego_c = tuple(cast(ego_rects[0, k]) for k in range(4)) + tuple(
        cast(ego_rects[1, k]) for k in range(4)
    )
    sur_c = tuple(
        cast(jnp.take(rc, jc, axis=1).reshape(-1, P, N)) for rc in sur_comp
    )
    hit_v = _sat_components(
        (ego_c[:4], ego_c[4:]),
        (sur_c[:4], sur_c[4:]),
    )  # (V, P, N)
    hits = (hit_v & veh_mask[:, None, None]).any(axis=0) & in_window  # (P, N)

    any_hit = hits.any(axis=1)
    first = jnp.argmax(hits, axis=1)
    default = jnp.ceil(speed * time_horizon / unit_arc).astype(jnp.int32)
    return jnp.where(any_hit, first - 1, default)


_CHUNK = 256  # frames processed in parallel per device step (memory bound)


@partial(
    jax.jit, static_argnames=("n_time", "time_step", "time_horizon", "sat_dtype")
)
def _sweep_chunk(frames, *, n_time, time_step, time_horizon, sat_dtype):
    """One fixed-size chunk of frames, fully parallel on device."""
    body = jax.vmap(
        partial(
            _frame_sweep, n_time=n_time, time_step=time_step,
            time_horizon=time_horizon, sat_dtype=sat_dtype,
        )
    )
    return body(frames)


def _sweep_batch(frames, *, n_time, time_step, time_horizon, sat_dtype, mesh=None):
    """Chunked sweep: the per-chunk program is jitted once (stable padded
    shapes); chunks dispatch from Python so XLA cannot hoist chunk-invariant
    broadcasts into one whole-batch allocation (observed 34 GB under a
    single lax.map-of-vmap program).

    With a ``jax.sharding.Mesh``, each chunk's frame axis is sharded over
    the mesh 'data' axis — frames are independent, so the sweep scales
    embarrassingly across chips with zero collectives.
    """
    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        sharding = NamedSharding(mesh, PartitionSpec("data"))
    F = frames[0].shape[0]
    outs = []
    for k in range(0, F, _CHUNK):
        # slice on the HOST (frames stay numpy): slicing jnp arrays here
        # would eagerly compile one dynamic_slice executable per array per
        # chunk offset (~0.4 s each, below the persistent-cache write
        # threshold) — tens of seconds of uncacheable compile per process
        chunk = tuple(np.ascontiguousarray(a[k : k + _CHUNK]) for a in frames)
        if sharding is not None:
            chunk = tuple(jax.device_put(a, sharding) for a in chunk)
        outs.append(
            _sweep_chunk(
                chunk, n_time=n_time, time_step=time_step,
                time_horizon=time_horizon, sat_dtype=sat_dtype,
            )
        )
    return np.concatenate([np.asarray(o) for o in outs], axis=0)


def sweep_frames_device(
    ego_rects_per_frame: Sequence[List[np.ndarray]],
    unit_arcs_per_frame: Sequence[Sequence[float]],
    speeds: Sequence[float],
    sur_per_frame: Sequence[np.ndarray],
    time_horizon: float,
    time_step: float,
    sat_dtype: str = "float32",
    mesh=None,
) -> List[np.ndarray]:
    """Run the SAT collision sweep for many frames in one device program.

    Args:
        ego_rects_per_frame: per frame, list over usable paths of
            (N_i, 2, 4) rectangle sweeps.
        unit_arcs_per_frame: per frame, per-path uniform arc steps.
        speeds: per-frame ego speed.
        sur_per_frame: per frame, (V_f, 9) surrounding-vehicle rows in the
            frame's rotated coordinate system (may be empty).

    Returns: per frame, (P_f,) int collision indices — identical to
    ``collision.collision_indices`` run frame by frame.
    """
    F0 = len(ego_rects_per_frame)
    if F0 == 0:
        return []
    n_time = int(time_horizon / time_step)
    P = max(max((len(r) for r in ego_rects_per_frame), default=1), 1)
    N = max(
        max((e.shape[0] for rects in ego_rects_per_frame for e in rects), default=1), 1
    )
    V = max(
        max((np.atleast_2d(s).shape[0] if np.asarray(s).size else 0 for s in sur_per_frame), default=1),
        1,
    )
    # bucket the padded shapes so repeat sweeps (and the persistent
    # compilation cache) reuse one compiled program
    _up = lambda v, m: ((v + m - 1) // m) * m
    P, V, N = _up(P, 8), _up(V, 8), _up(N, 128)
    F = _up(F0, _CHUNK)

    # ego layout (F, 2, 4, P, N): xy × corner × path × point — large dims
    # minor so the TPU (8, 128) tiling doesn't pad tiny trailing axes.
    # The ego corners feed ONLY the SAT geometry, so they are cast to
    # sat_dtype on the host — halves the tunnel transfer in the f32 case.
    ego = np.zeros((F, 2, 4, P, N), dtype=np.dtype(sat_dtype))
    arcs = np.ones((F, P))  # pad with 1.0 to keep divisions finite
    npts = np.zeros((F, P), dtype=np.int32)
    spd = np.zeros(F)
    spd[:F0] = np.asarray(speeds, float)
    sur = np.zeros((F, V, 9))
    vmask = np.zeros((F, V), dtype=bool)
    for f in range(F0):
        for p, r in enumerate(ego_rects_per_frame[f]):
            # r: (n, 2, 4) → (2, 4, n); replicate the last rectangle into
            # the padding to keep the SAT math NaN-free (masked anyway)
            rt = np.transpose(r, (1, 2, 0))
            ego[f, :, :, p, : r.shape[0]] = rt
            npts[f, p] = r.shape[0]
            if 0 < r.shape[0] < N:
                ego[f, :, :, p, r.shape[0]:] = rt[:, :, -1:]
            # r.shape[0] == 0 leaves the all-zeros padding: npts masks every
            # point out and the SAT safe-norm keeps zeros NaN-free, so the
            # path returns the no-collision default like the host oracle
        arcs[f, : len(unit_arcs_per_frame[f])] = np.asarray(
            unit_arcs_per_frame[f], float
        )
        s = np.atleast_2d(np.asarray(sur_per_frame[f], float))
        if s.size:
            sur[f, : s.shape[0]] = s
            vmask[f, : s.shape[0]] = True

    from ..utils.cache import enable_persistent_cache

    enable_persistent_cache()
    sdt = jnp.dtype(sat_dtype)
    with jax.enable_x64():
        # host numpy in, per-chunk transfer inside _sweep_batch (see the
        # host-slicing note there)
        ci = _sweep_batch(
            (ego, arcs, spd, sur, vmask, npts),
            n_time=n_time,
            time_step=time_step,
            time_horizon=time_horizon,
            sat_dtype=None if sdt == jnp.float64 else sdt,
            mesh=mesh,
        )
    return [
        ci[f, : len(ego_rects_per_frame[f])].astype(int) for f in range(F0)
    ]
