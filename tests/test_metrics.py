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
    extract_coordinates,
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

from defensive_model_vae_tpu import scenarios as _sc

# scenario → town mapping comes from the registry (CLAUDE.md: no per-
# scenario constants outside scenarios.py)
TOWN = {k: _sc.get(k).town for k in _sc.REGISTRY}


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
    # zero-dt segment repeats the previous value.  The previous speed
    # (3.0) deliberately differs from the zero-dt segment's displacement
    # (1.0 — what the dt→1.0 placeholder division would yield), so a
    # regression that drops the carry cannot pass
    traj2 = np.array([[0, 0, 0.0], [3, 0, 1.0], [4, 0, 1.0], [5, 0, 2.0]])
    v2 = human_velocities([traj2])
    assert np.isclose(v2[0], 3.0)
    assert np.isclose(v2[1], 3.0)  # dt=0 → repeat previous (not 1.0)

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
    # sce2 reproduces the published value EXACTLY at the reference main's
    # grid_size=0.5 (``Distribution.py:511``).  The sce1/sce3/sce4 published
    # cells are NOT reproducible from the shipped tree — not even by the
    # reference's own code (see the live differentials below and the
    # published-cell disposition table in PARITY.md); those cells are pinned
    # against the LIVE reference instead in
    # test_rmse_frequency_trajcount_live_differential.
    trajs, humans = _load_shipped("sce2")
    assert np.isclose(
        rmse_frequency_trajcount(trajs, humans, "sce2", 0.5), 1.685821, atol=1e-6
    )


# ---------------------------------------------------------------------------
# published-cell disposition: live differentials for the non-reproducible cells
#
# Every number in results/ModelValidation/JS_divergence.txt is either
# reproduced EXACTLY from the shipped artifacts (tests above) or proven
# non-reproducible FROM THE SHIPPED TREE — the reference's own code, run live
# on its own shipped GeneratedData + DefensiveData, yields different values.
# For those cells the live reference IS the oracle, and this framework is
# pinned against it to 1e-9.  Full disposition table: PARITY.md
# "Published-cell disposition".  Mechanism evidence for the drift:
#   * sce1 — the shipped GeneratedData was regenerated with the ego_y>=40
#     start mask AFTER the published metric runs (the stale-artifact fork
#     pinned in test_data.py::test_sce1_start_conditions_match_published_artifacts);
#     none of the six published sce1 cells reproduce, and the two published
#     sce1 JS lines are even mutually inconsistent across log bases
#     (0.092139/ln2 = 0.132929 != 0.131582), i.e. they come from two
#     different pre-shipped runs.  By contrast sce3's base-e/base-2 pair IS
#     one run (0.134692 * ln2 = 0.093362 ~= 0.093361).
#   * sce4 — the human corpus today has 134 CSVs for 135 shipped traces
#     (orphan pinned below); the published run predates the CSV loss.
#   * sce3 — the published RMSE_frequency cells predate the n=66
#     regeneration (only the "sample number=66" JS line was recomputed,
#     and it reproduces exactly — test_js_divergence_published_exact).
# ---------------------------------------------------------------------------


def _ref_modules():
    import contextlib
    import io
    import sys

    sys.path.insert(0, str(REFERENCE_ROOT))
    try:
        with contextlib.redirect_stdout(io.StringIO()):
            import Distribution as RD
            import Spatial_Distribution as RS
    finally:
        sys.path.pop(0)
    return RD, RS


def _ref_humans(RD, key):
    import contextlib
    import io

    csvs = collect_csv_files(str(REFERENCE_ROOT / "DefensiveData" / TOWN[key]))
    model_name = f"vae_offset_{key}_cond_ld8_epoch3000.pth"
    with contextlib.redirect_stdout(io.StringIO()):
        return RD.load_human_trajectories(csvs, model_name)


@requires_reference
def test_human_velocities_cross_track_carry_matches_live_reference():
    """The reference's ``calculate_human_velocities`` keeps ONE shared
    velocity list across tracks (``Distribution.py:258-295``), so a track
    whose FIRST segment has dt <= 1e-6 inherits the PREVIOUS track's last
    speed rather than 0 — pinned against the reference run live."""
    RD, _ = _ref_modules()
    a = np.array([[0.0, 0.0, 0.0], [3.0, 4.0, 1.0], [6.0, 8.0, 2.0]])
    b = np.array([[1.0, 1.0, 5.0], [2.0, 1.0, 5.0], [2.0, 5.0, 6.0]])
    ours = human_velocities([a, b])
    ref = RD.calculate_human_velocities([a, b])
    np.testing.assert_allclose(ours, ref, atol=1e-12)
    # track b's zero-dt first segment carries track a's last speed (5 m/s)
    assert ours[3] == 5.0


@requires_reference
@pytest.mark.parametrize("key,published", [("sce1", 0.131582), ("sce4", 0.041909)])
def test_js_divergence_live_differential_open_cells(key, published):
    """The sce1/sce4 published JS cells (JS_divergence.txt:3,34) do not
    reproduce from the shipped tree; this pins our whole JS pipeline
    (velocity extraction + base-2 JS, ``Distribution.py:195-296,299-333``)
    against the reference run live on the shipped artifacts."""
    from scipy.stats import entropy

    RD, _ = _ref_modules()
    trajs, humans = _load_shipped(key)
    ref_humans = _ref_humans(RD, key)

    # velocity arrays are elementwise identical to the reference's
    ref_gen_v = RD.extract_velocities_from_trajectories(trajs)
    ref_hum_v = RD.calculate_human_velocities(ref_humans)
    np.testing.assert_allclose(extract_velocities(trajs), ref_gen_v, atol=1e-12)
    np.testing.assert_allclose(human_velocities(humans), ref_hum_v, atol=1e-12)

    # live-reference JS (transcribing Distribution.py:311-333 on the arrays)
    v_min = min(ref_gen_v.min(), ref_hum_v.min())
    v_max = max(ref_gen_v.max(), ref_hum_v.max())
    bins = np.linspace(v_min, v_max, 50)
    hg, _ = np.histogram(ref_gen_v, bins=bins)
    hh, _ = np.histogram(ref_hum_v, bins=bins)
    hg = hg / (hg.sum() + 1e-10)
    hh = hh / (hh.sum() + 1e-10)
    M = 0.5 * (hg + hh)
    eps = 1e-10
    ref_js = 0.5 * (
        entropy(hg + eps, M + eps, base=2) + entropy(hh + eps, M + eps, base=2)
    )

    ours = velocity_js_divergence(extract_velocities(trajs), human_velocities(humans))
    assert np.isclose(ours, ref_js, atol=1e-9), (key, ours, ref_js)
    # …and the live value is NOT the published one: the published cell
    # predates the shipped artifacts (sce1: ~0.12727, sce4: ~0.041545).
    assert abs(ref_js - published) > 2e-4, (key, ref_js, published)


@requires_reference
@pytest.mark.parametrize(
    "key,published",
    [("sce1", 2.440675), ("sce3", 6.838131), ("sce4", 9.168905)],
)
def test_rmse_frequency_trajcount_live_differential(key, published):
    """Trajectory-count RMSE_frequency pinned against the reference's
    ``calculate_rmse_frequency_new`` (``Spatial_Distribution.py:433-492``)
    run live on the shipped artifacts, for the cells whose published values
    predate the shipped tree (live: sce1 ~2.3179, sce3 ~6.1713, sce4 ~9.0400)."""
    import contextlib
    import io

    RD, RS = _ref_modules()
    trajs, humans = _load_shipped(key)
    model_name = f"vae_offset_{key}_cond_ld8_epoch3000.pth"
    with contextlib.redirect_stdout(io.StringIO()):
        ref_val = RS.calculate_rmse_frequency_new(
            trajs, _ref_humans(RD, key), model_name, grid_size=0.5
        )
    ours = rmse_frequency_trajcount(trajs, humans, key, 0.5)
    assert np.isclose(ours, ref_val, atol=1e-9), (key, ours, ref_val)
    assert abs(ref_val - published) > 0.05, (key, ref_val, published)


@requires_reference
@pytest.mark.parametrize("key,published", [("sce1", 14.45), ("sce3", 6.012807)])
def test_rmse_frequency_point_count_live_differential(key, published):
    """Point-count ('old method') RMSE_frequency (``Spatial_Distribution.py:94-161``
    with the <=150-point subsampler ``:18-91``) pinned against the reference
    run live at both grid sizes.  The published cells (JS_divergence.txt:4,25)
    match NEITHER grid size on the shipped artifacts (live @0.5: sce1
    ~14.7079, sce3 ~5.5094) — they predate the shipped tree like the other
    open cells.  The subsampler is deterministic here: its random top-up only
    fires when linspace indices collide, which needs n<2*150 points and every
    track in these corpora avoids the colliding range."""
    import contextlib
    import io

    RD, RS = _ref_modules()
    trajs, humans = _load_shipped(key)
    model_name = f"vae_offset_{key}_cond_ld8_epoch3000.pth"
    ref_humans = _ref_humans(RD, key)
    with contextlib.redirect_stdout(io.StringIO()):
        ref_gc = RS.extract_coordinates_from_trajectories(trajs)
        ref_hc = RS.extract_human_coordinates(ref_humans)
    ours_gc = extract_coordinates(trajs)
    ours_hc = extract_coordinates(humans)
    np.testing.assert_allclose(ours_gc, ref_gc, atol=1e-12)
    np.testing.assert_allclose(ours_hc, ref_hc, atol=1e-12)
    for grid in (0.5, 1.0):
        with contextlib.redirect_stdout(io.StringIO()):
            ref_val = RS.calculate_rmse_frequency(ref_gc, ref_hc, model_name, grid_size=grid)
        ours = rmse_frequency(ours_gc, ours_hc, key, grid)
        assert np.isclose(ours, ref_val, atol=1e-9), (key, grid, ours, ref_val)
        assert abs(ref_val - published) > 0.2, (key, grid, ref_val, published)


@requires_reference
def test_surface_rmse_sce1_live_differential():
    """Neither published sce1 surface-RMSE pair (first run 2.96752272/
    3.45551705, '0211' 2.22687781/2.36965596 — JS_divergence.txt:6-10)
    reproduces from the shipped GeneratedData: the reference's own surface
    pipeline (``Spatial_Distribution.py:708-932,1540-1583``) run live yields
    ~1.1606/1.6114 (axis='y', the travel axis, per the last-edited main at
    ``Distribution.py:615``).  The shipped sce1 traces were regenerated
    (y>=40 mask) after the published runs and never re-measured — they score
    BETTER than both published runs.  Our pipeline matches the live
    reference to 1e-9 (sce2/3/4 additionally match the published 0211 cells
    exactly — test_surface_rmse_published_exact)."""
    RD, RS = _ref_modules()
    key, axis = "sce1", "y"
    trajs, humans = _load_shipped(key)
    model_name = f"vae_offset_{key}_cond_ld8_epoch3000.pth"
    ref_humans = _ref_humans(RD, key)

    rmc, rmt, rmv = RS._prepare_model_stv_data(trajs, model_name, axis=axis)
    rhc, rht, rhv = RS._prepare_human_stv_data(ref_humans, axis=axis)
    coord_range, time_range = RS._calculate_unified_axes_ranges(rmc, rmt, rhc, rht)
    _, _, ref_ms = RS._build_surface_from_stv(
        rmc, rmt, rmv, coord_range=coord_range, time_range=time_range
    )
    _, _, ref_hs = RS._build_surface_from_stv(
        rhc, rht, rhv, coord_range=coord_range, time_range=time_range
    )
    ref_inc, _ = RS.calculate_surface_rmse(ref_ms, ref_hs, True)
    ref_exc, _ = RS.calculate_surface_rmse(ref_ms, ref_hs, False)

    mc, mt, mv = model_stv_data(trajs, key, axis=axis)
    hc, ht, hv = human_stv_data(humans, axis=axis)
    allc = np.concatenate(mc + hc)
    allt = np.concatenate(mt + ht)
    cr, tr = (allc.min(), allc.max()), (allt.min(), allt.max())
    _, _, ms = build_stv_surface(mc, mt, mv, coord_range=cr, time_range=tr)
    _, _, hs = build_stv_surface(hc, ht, hv, coord_range=cr, time_range=tr)
    r_inc, _ = surface_rmse(ms, hs, True)
    r_exc, _ = surface_rmse(ms, hs, False)

    assert np.isclose(r_inc, ref_inc, atol=1e-9), (r_inc, ref_inc)
    assert np.isclose(r_exc, ref_exc, atol=1e-9), (r_exc, ref_exc)
    # the live values sit far from BOTH published pairs
    for pub_inc, pub_exc in [(2.96752272, 3.45551705), (2.22687781, 2.36965596)]:
        assert abs(ref_inc - pub_inc) > 0.5
        assert abs(ref_exc - pub_exc) > 0.5


@requires_reference
def test_sce4_orphan_trace_pinned():
    """Exactly one shipped sce4 trace has no source CSV in the shipped tree
    — tracked_trajectory_sce4_exp69_2.npy (its exp_69_*_2.csv is absent from
    all three maneuver folders).  This is the same stale-135th-entry story
    pinned for the sce4 training windows in test_data.py, and the mechanism
    behind the sce4 JS/trajcount published-cell drift: the published run had
    135 human CSVs.  Dropping the orphan does NOT recover the published
    values either (JS ~0.0411 vs published 0.041909; trajcount ~9.078 vs
    9.168905) — the lost CSV's human track is unrecoverable."""
    import os
    import re

    csvs = collect_csv_files(str(REFERENCE_ROOT / "DefensiveData" / TOWN["sce4"]))
    csv_keys = set()
    for c in csvs:
        m = re.match(r"exp_(\d+)_control_.*_(\d+)\.csv", os.path.basename(c))
        assert m is not None, f"unexpected CSV name: {os.path.basename(c)}"
        csv_keys.add((m.group(1), m.group(2)))
    trace_files = sorted(
        glob.glob(
            str(REFERENCE_ROOT / "results/GeneratedData/tracked_trajectory_sce4_*.npy")
        )
    )
    orphans = []
    for f in trace_files:
        m = re.match(r"tracked_trajectory_sce4_exp(\d+)_(\d+)\.npy", os.path.basename(f))
        assert m is not None, f"unexpected trace name: {os.path.basename(f)}"
        if (m.group(1), m.group(2)) not in csv_keys:
            orphans.append(os.path.basename(f))
    assert orphans == ["tracked_trajectory_sce4_exp69_2.npy"]

    matched = [np.load(f) for f in trace_files
               if os.path.basename(f) not in orphans]
    _, humans = _load_shipped("sce4")
    js = velocity_js_divergence(extract_velocities(matched), human_velocities(humans))
    assert abs(js - 0.041909) > 2e-4
    tc = rmse_frequency_trajcount(matched, humans, "sce4", 0.5)
    assert abs(tc - 9.168905) > 0.05


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

    RD, RS = _ref_modules()
    model_name = f"vae_offset_{key}_cond_ld8_epoch3000.pth"
    shipped, humans = _load_shipped(key)
    with contextlib.redirect_stdout(io.StringIO()):
        ref_humans = _ref_humans(RD, key)
        ref_val, ref_errs = RS.compute_spatiotemporal_plane_rmse(
            ref_humans, shipped, model_name, time_interval=0.5
        )

    val, errs = spatiotemporal_plane_rmse(humans, shipped, key)
    assert np.isclose(val, ref_val, atol=1e-9), (key, val, ref_val)
    assert np.allclose(errs, ref_errs, atol=1e-9)
