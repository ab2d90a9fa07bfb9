"""Metric-layer tests: synthetic golden cases + published-value parity."""

import glob

import numpy as np
import pytest

from defensive_model_vae_tpu.data import (
    collect_csv_files,
    get_human_and_bv_trajectories,
    trim_human_trajectory,
)
from defensive_model_vae_tpu.metrics import (
    build_stv_surface,
    extract_velocities,
    human_stv_data,
    human_velocities,
    model_stv_data,
    rmse_frequency,
    rmse_frequency_trajcount,
    spatiotemporal_plane_rmse,
    subsample_points,
    surface_rmse,
    velocity_js_divergence,
)

from conftest import REFERENCE_ROOT, requires_reference

TOWN = {
    "sce1": "StaticBlindTown05",
    "sce2": "DynamicBlindTown05",
    "sce3": "PredictableMovementTown05",
    "sce4": "UnpredictableMovementTown04",
}


def _load_shipped(key):
    trajs = [
        np.load(f)
        for f in sorted(
            glob.glob(
                str(REFERENCE_ROOT / f"results/GeneratedData/tracked_trajectory_{key}_*.npy")
            )
        )
    ]
    humans = []
    for c in collect_csv_files(str(REFERENCE_ROOT / "DefensiveData" / TOWN[key])):
        h, _, _ = get_human_and_bv_trajectories(c, key)
        if h is not None:
            humans.append(trim_human_trajectory(h, key))
    return trajs, humans


# ---------------------------------------------------------------------------
# synthetic golden tests
# ---------------------------------------------------------------------------

def test_js_divergence_bounds():
    rng = np.random.default_rng(0)
    a = rng.normal(10, 1, 5000)
    assert velocity_js_divergence(a, a) < 1e-6  # identical → 0
    b = rng.normal(30, 1, 5000)  # disjoint → 1 (base-2 JS upper bound)
    assert velocity_js_divergence(a, b) > 0.98


def test_velocity_extraction():
    # constant-speed diagonal track: v = sqrt(2) everywhere
    t = np.arange(5, dtype=float)
    traj = np.column_stack([t, t, t])  # [x, y, t]
    v = human_velocities([traj])
    assert v.shape == (5,)
    assert np.allclose(v, np.sqrt(2))
    # zero-dt segment repeats the previous value
    traj2 = np.array([[0, 0, 0.0], [1, 0, 1.0], [2, 0, 1.0], [3, 0, 2.0]])
    v2 = human_velocities([traj2])
    assert np.isclose(v2[1], 1.0)  # dt=0 → repeat previous

    tracked = [np.column_stack([t, t, t, 3 * np.ones(5)])]
    assert np.allclose(extract_velocities(tracked), 3.0)


def test_subsample_points():
    xy = np.random.default_rng(0).normal(size=(500, 2))
    s = subsample_points(xy, 150)
    assert s.shape == (150, 2)
    assert np.allclose(s[0], xy[0]) and np.allclose(s[-1], xy[-1])
    small = subsample_points(xy[:100], 150)
    assert small.shape == (100, 2)


def test_rmse_frequency_synthetic():
    # identical point sets → 0
    pts = np.random.default_rng(1).uniform([-197, 45], [-190, 75], (200, 2))
    assert rmse_frequency(pts, pts, "sce1") == 0.0
    # k extra points in one occupied cell → sqrt(k²/n)
    base = np.tile([[-195.5, 50.5]], (3, 1))
    more = np.tile([[-195.5, 50.5]], (7, 1))
    val = rmse_frequency(more, base, "sce1")
    assert np.isclose(val, 4.0)  # one cell, diff 4


def test_rmse_frequency_trajcount_synthetic():
    # one track visiting a cell many times still counts once
    loop = np.tile([[-195.5, 50.5, 0.0]], (50, 1))
    single = np.array([[-195.5, 50.5, 0.0]])
    assert rmse_frequency_trajcount([loop], [single], "sce1") == 0.0


def test_stv_surface_and_rmse():
    # constant-speed tracks → (unsmoothed-mean = v) surface; smoothing with
    # 'nearest' preserves a constant field exactly
    t = np.linspace(0, 10, 100)
    coords = [t * 2]
    times = [t]
    vs = [np.full_like(t, 5.0)]
    _, _, surf = build_stv_surface(coords, times, vs)
    occupied = surf > 0
    assert occupied.any()
    r, n = surface_rmse(surf, surf)
    assert r == 0.0 and n == surf.size
    r2, n2 = surface_rmse(surf, np.zeros_like(surf), include_zero_velocity=False)
    assert n2 == int((surf != 0).sum())


def test_plane_rmse_synthetic():
    # identical clouds → 0; constant offset d → d
    t = np.linspace(0, 5, 60)
    human = [np.column_stack([t, t, t])]
    model_states = [np.column_stack([t, t, np.zeros_like(t), np.ones_like(t)])]
    # model times use arange * dt(sce1)=0.02 → different time base; use a
    # scenario-consistent model track instead
    n = len(t)
    mt = np.arange(n) * 0.02
    model = [np.column_stack([np.interp(mt, t, t), np.interp(mt, t, t),
                              np.zeros(n), np.ones(n)])]
    r, errs = spatiotemporal_plane_rmse(human, model, "sce1")
    assert np.isfinite(r) and len(errs) > 0

    model_off = [m + np.array([3.0, 4.0, 0, 0]) for m in model]
    r_off, _ = spatiotemporal_plane_rmse(human, model_off, "sce1")
    assert r_off > r


# ---------------------------------------------------------------------------
# published-value parity on shipped artifacts
# ---------------------------------------------------------------------------

@requires_reference
def test_js_divergence_published_exact():
    # sce2: published 0.112286; sce3 published (n=66 run) 0.127377 —
    # both reproduce exactly (results/ModelValidation/JS_divergence.txt)
    trajs, humans = _load_shipped("sce2")
    js = velocity_js_divergence(extract_velocities(trajs), human_velocities(humans))
    assert np.isclose(js, 0.112286, atol=5e-7)

    trajs, humans = _load_shipped("sce3")
    js = velocity_js_divergence(extract_velocities(trajs), human_velocities(humans))
    assert np.isclose(js, 0.127377, atol=5e-7)


@requires_reference
@pytest.mark.parametrize(
    "key,axis,pub_inc,pub_exc",
    [
        ("sce2", "x", 1.41293849, 1.55854868),
        ("sce3", "y", 2.89808723, 3.28143761),
        ("sce4", "y", 3.89329095, 4.17855121),
    ],
)
def test_surface_rmse_published_exact(key, axis, pub_inc, pub_exc):
    """Reproduces the published '0211' surface-RMSE values to ~1e-6."""
    trajs, humans = _load_shipped(key)
    mc, mt, mv = model_stv_data(trajs, key, axis=axis)
    hc, ht, hv = human_stv_data(humans, axis=axis)
    allc = np.concatenate(mc + hc)
    allt = np.concatenate(mt + ht)
    cr, tr = (allc.min(), allc.max()), (allt.min(), allt.max())
    _, _, ms = build_stv_surface(mc, mt, mv, coord_range=cr, time_range=tr)
    _, _, hs = build_stv_surface(hc, ht, hv, coord_range=cr, time_range=tr)
    r_inc, _ = surface_rmse(ms, hs, True)
    r_exc, _ = surface_rmse(ms, hs, False)
    assert np.isclose(r_inc, pub_inc, atol=1e-5)
    assert np.isclose(r_exc, pub_exc, atol=1e-5)


@requires_reference
def test_rmse_frequency_published():
    # The published values were computed at grid_size=0.5 (the reference
    # main's setting, ``Distribution.py:511``): sce2 reproduces EXACTLY;
    # the others land within small bands (their runs predate the shipped
    # csv/human sets — e.g. sce4's corpus has one stale window).
    trajs, humans = _load_shipped("sce2")
    assert np.isclose(
        rmse_frequency_trajcount(trajs, humans, "sce2", 0.5), 1.685821, atol=1e-6
    )
    for key, pub, tol in [("sce1", 2.440675, 0.15), ("sce3", 6.838131, 0.7),
                          ("sce4", 9.168905, 0.15)]:
        trajs, humans = _load_shipped(key)
        val = rmse_frequency_trajcount(trajs, humans, key, 0.5)
        assert abs(val - pub) <= tol, (key, val)


@requires_reference
@pytest.mark.parametrize("key", ["sce1", "sce2", "sce3", "sce4"])
def test_plane_rmse_differential_vs_live_reference(key):
    """Plane-centroid RMSE matches the reference function run LIVE on the
    shipped GeneratedData + humans (``Spatial_Distribution.py:1357-1429``
    at the 0.5 s interval of the :1354 call site).

    This pins the sce4 'anomaly' (≈74 even on the reference's own data):
    the large value is inherent to the reference metric — sce4's
    human-extraction mask (50 m radius, Tools.py:160) and its generation
    start mask (40 m + yaw) put the two point clouds ~56 m apart already in
    the first time slice, and the gap grows as short model traces end while
    long human tracks continue.  Not a defect in this implementation."""
    import contextlib
    import io
    import sys

    sys.path.insert(0, str(REFERENCE_ROOT))
    try:
        import Distribution as RD
        import Spatial_Distribution as RS
    finally:
        sys.path.pop(0)

    model_name = f"vae_offset_{key}_cond_ld8_epoch3000.pth"
    csvs = collect_csv_files(str(REFERENCE_ROOT / "DefensiveData" / TOWN[key]))
    shipped = [
        np.load(f)
        for f in sorted(
            glob.glob(
                str(REFERENCE_ROOT / f"results/GeneratedData/tracked_trajectory_{key}_*.npy")
            )
        )
    ]
    with contextlib.redirect_stdout(io.StringIO()):
        ref_humans = RD.load_human_trajectories(csvs, model_name)
        ref_val, ref_errs = RS.compute_spatiotemporal_plane_rmse(
            ref_humans, shipped, model_name, time_interval=0.5
        )

    _, humans = _load_shipped(key)
    val, errs = spatiotemporal_plane_rmse(humans, shipped, key)
    assert np.isclose(val, ref_val, atol=1e-9), (key, val, ref_val)
    assert np.allclose(errs, ref_errs, atol=1e-9)
