"""DNDA tests: spline/Frenet/SAT golden cases, property tests, and full
DA/RL values pinned from live differential runs against the reference
implementation (which matched to full printed precision)."""

import math

import numpy as np
import pytest

from defensive_model_vae_tpu.dnda import (
    Road,
    SurroundingVehicle,
    Vehicle,
    baseline_for,
    cartesian_to_frenet,
    drivable_area_risk_level,
    fmm_spline_coeffs,
    predict_surrounding_rectangles,
    process_episode,
    sat_collision,
    shoelace_area,
)
from defensive_model_vae_tpu.dnda.spline import spline_eval

from conftest import REFERENCE_ROOT, requires_reference


# ---------------------------------------------------------------------------
# spline
# ---------------------------------------------------------------------------

def test_spline_interpolates_knots():
    x = np.array([0.0, 1.0, 2.5, 4.0, 6.0])
    y = np.array([1.0, -1.0, 0.5, 2.0, 1.5])
    b, c, d = fmm_spline_coeffs(x, y)
    vals, _ = spline_eval(x, y, b, c, d, x)
    assert np.allclose(vals, y, atol=1e-12)


def test_spline_reproduces_cubic_exactly():
    # FMM end conditions make the spline exact on cubics
    x = np.linspace(0, 5, 8)
    y = 2 * x**3 - x**2 + 3 * x - 1
    b, c, d = fmm_spline_coeffs(x, y)
    u = np.linspace(0, 5, 100)
    vals, _ = spline_eval(x, y, b, c, d, u)
    assert np.allclose(vals, 2 * u**3 - u**2 + 3 * u - 1, atol=1e-8)


def test_spline_two_points_linear():
    b, c, d = fmm_spline_coeffs(np.array([0.0, 2.0]), np.array([1.0, 5.0]))
    assert np.allclose(b, 2.0) and np.allclose(c, 0) and np.allclose(d, 0)


def test_spline_curvature_of_parabola():
    # y = x² → y''=2, curvature at x=0 is 2
    x = np.linspace(-2, 2, 9)
    y = x**2
    b, c, d = fmm_spline_coeffs(x, y)
    _, k = spline_eval(x, y, b, c, d, np.array([0.0]))
    assert np.isclose(k[0], 2.0, rtol=1e-2)


# ---------------------------------------------------------------------------
# frenet
# ---------------------------------------------------------------------------

def test_frenet_straight_line():
    pts = np.column_stack([np.linspace(0, 50, 200), np.zeros(200)])
    unit, arc, trans, bx, cx, by, cy, s = cartesian_to_frenet(pts, 50)
    assert np.isclose(arc, 50.0, atol=1e-6)
    assert np.isclose(unit, 1.0, atol=1e-6)
    assert np.allclose(trans[:, 1], 0.0, atol=1e-9)
    # d/ds x = 1 along a unit-speed straight line
    assert np.allclose(bx, 1.0, atol=1e-6)
    assert np.allclose(by, 0.0, atol=1e-6)


def test_frenet_rotation_invariance():
    t = np.linspace(0, 1, 150)
    pts = np.column_stack([30 * t, 5 * np.sin(4 * t)])
    ang = 0.7
    R = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
    _, arc1, *_ = cartesian_to_frenet(pts, 40)
    _, arc2, *_ = cartesian_to_frenet(pts @ R.T, 40)
    assert np.isclose(arc1, arc2, rtol=1e-6)


# ---------------------------------------------------------------------------
# SAT collision
# ---------------------------------------------------------------------------

def _rect(cx, cy, L, W, theta):
    base = np.array(
        [[L / 2, -L / 2, -L / 2, L / 2], [-W / 2, -W / 2, W / 2, W / 2]]
    )
    c, s = np.cos(theta), np.sin(theta)
    R = np.array([[c, -s], [s, c]])
    return R @ base + np.array([[cx], [cy]])


def test_sat_basic():
    a = _rect(0, 0, 4, 2, 0)
    assert sat_collision(a, _rect(3, 0, 4, 2, 0))  # overlapping
    assert not sat_collision(a, _rect(10, 0, 4, 2, 0))  # far apart
    assert not sat_collision(a, _rect(0, 5, 4, 2, 0))  # separated in y


def test_sat_rotated_and_symmetry():
    a = _rect(0, 0, 4, 2, 0.3)
    b = _rect(2.5, 1.0, 4, 2, -0.8)
    assert sat_collision(a, b) == sat_collision(b, a)
    # diagonal corner case: rotated rect near but not touching
    c = _rect(4.2, 2.6, 4, 2, np.pi / 4)
    assert sat_collision(a, c) == sat_collision(c, a)


def test_sat_batched_matches_scalar():
    rng = np.random.default_rng(0)
    A = np.stack([_rect(*rng.uniform(-3, 3, 2), 4, 2, rng.uniform(-3, 3)) for _ in range(64)])
    B = np.stack([_rect(*rng.uniform(-3, 3, 2), 4, 2, rng.uniform(-3, 3)) for _ in range(64)])
    batch = sat_collision(A, B)
    scalar = np.array([sat_collision(A[i], B[i]) for i in range(64)])
    assert np.array_equal(batch, scalar)
    assert batch.any() and not batch.all()  # non-trivial mix


def test_shoelace():
    assert np.isclose(shoelace_area([0, 4, 4, 0], [0, 0, 3, 3]), 12.0)
    assert np.isclose(shoelace_area([0, 1, 2], [0, 1, 0]), 1.0)


# ---------------------------------------------------------------------------
# surrounding-vehicle prediction
# ---------------------------------------------------------------------------

def test_sur_prediction_constant_velocity():
    v = SurroundingVehicle(x=0, y=0, length=4, width=2, speed_x=10, speed_y=0)
    rects = predict_surrounding_rectangles([v], 3.0, 0.1)
    assert rects.shape == (1, 31, 2, 4)
    centers_x = rects[0, :, 0, :].mean(axis=1)
    assert np.allclose(centers_x, 10 * np.arange(31) * 0.1, atol=1e-9)


@requires_reference
def test_sur_prediction_differential_vs_live_reference():
    """Rect-for-rect parity of the constant-acceleration prediction vs the
    REFERENCE ``Generate_surVehicle_Traj`` run live, over a fuzz family
    that includes at-rest vehicles with pure lateral acceleration — the
    case where the reference's ``vx == 0`` heading branch fires even while
    the stop-flag is set (``dnda_functions.py:1405-1420``): the predicted
    rectangle ROTATES to 1.5708 after the freeze instead of holding the
    pre-stop heading."""
    import sys

    sys.path.insert(0, str(REFERENCE_ROOT / "SUT_Testing/tools"))
    try:
        from dnda_functions import Generate_surVehicle_Traj, surVehicle
    finally:
        sys.path.pop(0)

    rng = np.random.default_rng(17)
    cases = []
    # at-rest + pure-y acceleration (the divergence family)
    cases.append(dict(x=3.0, y=-1.0, speed_x=0.0, speed_y=0.0,
                      acc_x=0.0, acc_y=1.29, heading=-2.893))
    # at-rest + pure-x acceleration, and decelerating-to-reversal with
    # vx crossing zero mid-horizon
    cases.append(dict(x=0.0, y=0.0, speed_x=0.0, speed_y=0.0,
                      acc_x=0.7, acc_y=0.0, heading=0.4))
    cases.append(dict(x=5.0, y=2.0, speed_x=2.0, speed_y=-1.0,
                      acc_x=-2.0, acc_y=1.0, heading=0.1))
    for _ in range(40):
        at_rest = rng.random() < 0.4
        sp = 0.0 if at_rest else rng.uniform(0, 12)
        ang = rng.uniform(-np.pi, np.pi)
        cases.append(dict(
            x=rng.uniform(-20, 20), y=rng.uniform(-10, 10),
            speed_x=sp * np.cos(ang), speed_y=sp * np.sin(ang),
            acc_x=rng.choice([0.0, rng.uniform(-3, 3)]),
            acc_y=rng.choice([0.0, rng.uniform(-3, 3)]),
            heading=rng.uniform(-np.pi, np.pi),
        ))

    for kw in cases:
        ref_out = []
        Generate_surVehicle_Traj(
            [surVehicle(length=4.0, width=2.0, **kw)], ref_out, 3.0, 0.1,
            0, False, "",
        )
        ref_rects = np.asarray(ref_out[0])  # (T+1, 2, 4)
        ours = predict_surrounding_rectangles(
            [SurroundingVehicle(length=4.0, width=2.0, **kw)], 3.0, 0.1
        )[0]
        assert np.allclose(ours, ref_rects, atol=1e-9), kw


def test_sur_prediction_stops_on_reversal():
    # decelerating vehicle freezes when velocity would reverse
    v = SurroundingVehicle(x=0, y=0, length=4, width=2, speed_x=5, acc_x=-5)
    rects = predict_surrounding_rectangles([v], 3.0, 0.1)
    centers_x = rects[0, :, 0, :].mean(axis=1)
    # never moves backwards past its stopping point (~2.5 m)
    assert centers_x.max() <= 2.5 + 1e-6
    assert np.isclose(centers_x[-1], centers_x.max())
    assert np.all(np.diff(centers_x) >= -1e-9)


# ---------------------------------------------------------------------------
# full DA/RL — values pinned from live differential runs vs the reference
# (see commit message; reference matched to all printed digits)
# ---------------------------------------------------------------------------

def _frame(ego_kwargs, sv_rows, baseline_wiggle=False):
    n_base = 600
    bx = np.arange(n_base) * 0.25 - 20.0
    wy = 0.5 * np.sin(bx / 30) if baseline_wiggle else np.zeros(n_base)
    baseline = np.column_stack([bx, wy])
    road = Road(False, 2, 2, 3.5, 9.8)
    ego = Vehicle(length=7.2, width=2.3, lane_posi=1, **ego_kwargs)
    return drivable_area_risk_level(3.0, 0.1, road, ego, baseline, np.asarray(sv_rows), 400)


def _ego(x, y, speed, rel, acc):
    return dict(
        x=x, y=y, speed_x=speed * math.cos(rel), speed_y=speed * math.sin(rel),
        speed=speed, absolute_theta=0.0, acc=acc, init_q=y, relative_theta=rel,
    )


def test_da_rl_pinned_straight():
    # trial 1 of the differential run: ref DA=42.6688, RL=0.767949
    da, rl = _frame(
        _ego(0.17449996586169148, 0.8701448475755365, 13.158535541215322,
             -0.04972614998298519, 1.4296171063502774),
        [[16.0141393484983, 1.7887666332953127, 4.0, 2.0,
          -1.946066276384646, 0.0, 0.0, 0.0, 0.0]],
    )
    assert np.isclose(da, 42.6688, atol=1e-3)
    assert np.isclose(rl, 0.767949, atol=1e-5)


def test_da_rl_no_obstacle_is_safe():
    da, rl = _frame(_ego(0.0, 0.0, 10.0, 0.0, 0.0), np.zeros((0, 9)))
    assert rl == 0.0
    assert da > 0


def test_rl_bounds_property():
    rng = np.random.default_rng(3)
    for _ in range(5):
        ego = _ego(
            rng.uniform(-2, 2), rng.uniform(-1, 1), rng.uniform(5, 15),
            rng.uniform(-0.05, 0.05), rng.uniform(-2, 2),
        )
        sv = [[rng.uniform(10, 40), rng.uniform(-2, 2), 4.0, 2.0,
               rng.uniform(-3, 3), 0.0, 0.0, 0.0, 0.0]]
        da, rl = _frame(ego, sv, baseline_wiggle=bool(rng.integers(2)))
        assert 0.0 <= rl <= 1.0
        assert da >= 0.0


def test_rl_increases_with_blocking():
    ego = _ego(0.0, 0.0, 10.0, 0.0, 0.0)
    # wall of stopped vehicles directly ahead
    far = [[60.0, 0.0, 4.0, 2.0, 0.0, 0.0, 0.0, 0.0, 0.0]]
    near = [[12.0, y, 4.0, 2.0, 0.0, 0.0, 0.0, 0.0, 0.0] for y in (-3.0, 0.0, 3.0)]
    _, rl_far = _frame(ego, far)
    _, rl_near = _frame(ego, near)
    assert rl_near > rl_far


@requires_reference
def test_episode_driver_first_frames():
    """First scored frames of a real SUT episode match the reference driver
    (validated live; all-zero DNDA over the initial approach)."""
    csv = REFERENCE_ROOT / "SUT_Testing/collected_data/DEF_StaticBlindTown05_1.csv"
    res = process_episode(str(csv), "sce1", max_frames=6)
    assert res.frames == [30, 40, 50, 60, 70, 80]
    assert np.allclose(res.dnda, 0.0)


def test_baselines_shapes():
    for key in ("sce1", "sce2", "sce3", "sce4"):
        b = baseline_for(key)
        assert b.ndim == 2 and b.shape[1] == 2 and len(b) > 1000


@requires_reference
@pytest.mark.parametrize(
    "key,town,oracle",
    [
        ("sce1", "StaticBlindTown05", "ref_dnda_frames.npy"),
        ("sce2", "DynamicBlindTown05", "ref_dnda_DynamicBlindTown05.npy"),
        ("sce3", "PredictableMovementTown05", "ref_dnda_PredictableMovementTown05.npy"),
        ("sce4", "UnpredictableMovementTown04", "ref_dnda_UnpredictableMovementTown04.npy"),
    ],
)
def test_episode_driver_full_golden(key, town, oracle):
    """Full-episode parity across ALL four scenarios: fixtures/oracle holds
    per-frame DNDA values produced by RUNNING the reference driver on the
    DEF_* episodes (423 scored frames total, covering the DNDA=1 early
    stop, the single-lane path special case, and 3-lane geometry).
    Bit-level match."""
    from conftest import FIXTURES

    ref = np.load(FIXTURES / "oracle" / oracle)
    csv = REFERENCE_ROOT / f"SUT_Testing/collected_data/DEF_{town}_1.csv"
    res = process_episode(str(csv), key)
    mine = dict(zip(res.frames, res.dnda))
    assert len(ref) == len(res.frames)
    for frame, val in ref:
        assert int(frame) in mine, frame
        assert np.isclose(mine[int(frame)], val, atol=1e-9), (frame, val)


@requires_reference
def test_da_rl_differential_fuzz_vs_live_reference():
    """Run the REFERENCE implementation live on randomized frames and
    require exact DA/RL agreement (beyond the pinned constants above)."""
    import contextlib, io, sys

    sys.path.insert(0, str(REFERENCE_ROOT / "SUT_Testing/tools"))
    try:
        from dnda_functions import DrivableArea_RiskLevel_Calculation as ref_calc
        from DNDA import Road as RefRoad, Vehicle as RefVehicle
    finally:
        sys.path.pop(0)

    rng = np.random.default_rng(42)
    n_base = 600
    bx = np.arange(n_base) * 0.25 - 20.0
    for trial in range(6):
        wiggle = (0.4 * np.sin(bx / 25) if trial % 2 else np.zeros(n_base))
        baseline = np.column_stack([bx, wiggle])
        ego_kwargs = dict(
            x=float(rng.uniform(-2, 2)), y=float(rng.uniform(-1, 1)),
            length=7.2, width=2.3,
            speed=float(rng.uniform(5, 15)),
            acc=float(rng.uniform(-2, 2)),
            lane_posi=1, absolute_theta=0.0,
            relative_theta=float(rng.uniform(-0.05, 0.05)),
        )
        ego_kwargs["speed_x"] = ego_kwargs["speed"] * math.cos(ego_kwargs["relative_theta"])
        ego_kwargs["speed_y"] = ego_kwargs["speed"] * math.sin(ego_kwargs["relative_theta"])
        ego_kwargs["init_q"] = ego_kwargs["y"]
        n_sv = int(rng.integers(1, 3))
        sv = []
        for _ in range(n_sv):
            sv += [float(ego_kwargs["x"] + rng.uniform(12, 40)),
                   float(ego_kwargs["y"] + rng.uniform(-3, 3)), 4.0, 2.0,
                   float(rng.uniform(-4, 4)), 0.0,
                   float(rng.uniform(-1, 1)), 0.0, 0.0]

        with contextlib.redirect_stdout(io.StringIO()):
            da_r, rl_r = ref_calc(
                3.0, 0.1,
                RefRoad(cross_centerline=False, lane_num=2, lane_egodirect=2,
                        lane_width=3.5, maxAbsoluteAcc=9.8),
                RefVehicle(**ego_kwargs),
                baseline.ravel().tolist(), n_base, sv, n_sv,
                1, False, False, 400, "", "",
            )
        da_m, rl_m = drivable_area_risk_level(
            3.0, 0.1, Road(False, 2, 2, 3.5, 9.8), Vehicle(**ego_kwargs),
            baseline, np.asarray(sv).reshape(n_sv, 9), 400,
        )
        # DA is a shoelace sum over thousands of corner products; the
        # vectorized accumulation order differs from the reference's Python
        # loop at ~1e-7 relative.  RL (the published DNDA metric) is exact.
        assert np.isclose(da_m, da_r, rtol=1e-6), (trial, da_m, da_r)
        assert np.isclose(rl_m, rl_r, rtol=1e-9, atol=1e-9), (trial, rl_m, rl_r)


@requires_reference
def test_overbudget_acc_quirk_matches_live_reference():
    """|ego.acc| > max_absolute_acc: the reference computes np.sqrt(neg) →
    nan and min(1/6, nan) returns 1/6 (dnda_functions.py:610-616), scoring
    the frame with the steering-limit curvature.  Our guarded branch must
    reproduce that exactly instead of dividing by zero (round-1 behavior
    crashed here and silently dropped the frame)."""
    import contextlib
    import io
    import sys
    import warnings

    sys.path.insert(0, str(REFERENCE_ROOT / "SUT_Testing/tools"))
    try:
        from dnda_functions import DrivableArea_RiskLevel_Calculation as ref_calc
        from DNDA import Road as RefRoad, Vehicle as RefVehicle
    finally:
        sys.path.pop(0)

    n_base = 600
    bx = np.arange(n_base) * 0.25 - 20.0
    baseline = np.column_stack([bx, np.zeros(n_base)])
    ego_kwargs = dict(
        x=0.5, y=0.2, length=7.2, width=2.3,
        speed=10.0, acc=12.0,  # hard-braking spike beyond the 9.8 budget
        lane_posi=1, absolute_theta=0.0, relative_theta=0.02,
    )
    ego_kwargs["speed_x"] = ego_kwargs["speed"] * math.cos(0.02)
    ego_kwargs["speed_y"] = ego_kwargs["speed"] * math.sin(0.02)
    ego_kwargs["init_q"] = ego_kwargs["y"]
    sv = [20.0, 0.5, 4.0, 2.0, -2.0, 0.0, 0.0, 0.0, 0.0]

    with contextlib.redirect_stdout(io.StringIO()), warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # sqrt(neg) → nan
        da_r, rl_r = ref_calc(
            3.0, 0.1,
            RefRoad(cross_centerline=False, lane_num=2, lane_egodirect=2,
                    lane_width=3.5, maxAbsoluteAcc=9.8),
            RefVehicle(**ego_kwargs),
            baseline.ravel().tolist(), n_base, sv, 1,
            1, False, False, 400, "", "",
        )
    da_m, rl_m = drivable_area_risk_level(
        3.0, 0.1, Road(False, 2, 2, 3.5, 9.8), Vehicle(**ego_kwargs),
        baseline, np.asarray(sv).reshape(1, 9), 400,
    )
    assert np.isclose(da_m, da_r, rtol=1e-6), (da_m, da_r)
    assert np.isclose(rl_m, rl_r, rtol=1e-9, atol=1e-9), (rl_m, rl_r)


def test_score_directory_empty_dir(tmp_path):
    """A directory with no episode-pattern CSVs writes a header-only
    summary instead of crashing on rows[0]."""
    from defensive_model_vae_tpu.dnda import score_directory

    (tmp_path / "exp_11_control_Town05_3.csv").write_text("frame,id\n1,0\n")
    rows = score_directory(tmp_path, out_csv=str(tmp_path / "summary.csv"))
    assert rows == []
    lines = (tmp_path / "summary.csv").read_text().strip().splitlines()
    assert lines == ["model,scenario,trial,max_dnda,frames,file_path"]


@requires_reference
def test_score_directory(tmp_path):
    import shutil

    src = REFERENCE_ROOT / "SUT_Testing/collected_data"
    for name in ("DEF_StaticBlindTown05_1.csv", "IDM_StaticBlindTown05.csv",
                 "description.txt"):
        if (src / name).exists():
            shutil.copy(src / name, tmp_path / name)
    from defensive_model_vae_tpu.dnda import score_directory

    rows = score_directory(
        tmp_path, out_csv=str(tmp_path / "summary.csv"),
        processes=2, max_frames=3,
    )
    # only the trial-suffixed episode matches the reference's name pattern;
    # description.txt and the un-suffixed file are skipped like the reference
    assert len(rows) == 1
    assert rows[0]["model"] == "DEF" and rows[0]["trial"] == 1
    assert 0.0 <= rows[0]["max_dnda"] <= 1.0
    assert (tmp_path / "summary.csv").exists()


def test_native_spline_matches_python():
    """The C++ Thomas-sweep solver must agree with the Python path to the
    last ulp (the golden parity tests above run through whichever is
    active; this pins the two against each other directly)."""
    import defensive_model_vae_tpu.dnda.spline as sp

    if sp._load_native() is None:
        pytest.skip("native spline unavailable (no toolchain)")
    rng = np.random.default_rng(1)
    for n in (2, 3, 4, 7, 51, 400):
        x = np.sort(rng.uniform(0, 100, n)) + np.arange(n) * 1e-3
        y = rng.normal(size=n)
        bn, cn, dn = sp.fmm_spline_coeffs(x, y)
        lib, failed = sp._lib, sp._lib_failed
        sp._lib, sp._lib_failed = None, True
        try:
            bp, cp, dp = sp.fmm_spline_coeffs(x, y)
        finally:
            sp._lib, sp._lib_failed = lib, failed
        for a, b in ((bn, bp), (cn, cp), (dn, dp)):
            # ulp-scale drift accumulates through the length-n recurrence
            assert np.allclose(a, b, rtol=1e-11, atol=1e-13)


def test_device_sweep_empty_path_matches_host():
    """A (0, 2, 4) rectangle sweep (zero usable points) must not crash the
    device packing and must return the host oracle's no-collision default
    ceil(v·H/u) — the documented FramePrep contract allows N_i = 0 even
    though generate_ego_cluster never produces it (seg >= 10)."""
    from conftest import straight_rect_sweep

    from defensive_model_vae_tpu.dnda.core import FramePrep, sweep_frames

    preps = [
        FramePrep(
            ego_rects=[np.zeros((0, 2, 4)), straight_rect_sweep(40)],
            usable=[0, 1], unit_arc_paths=[1.0, 1.0], k_maxes=[0.01, 0.01],
            sur_array=np.array([[15.0, 0.0, 4.0, 2.0, 0, 0, 0, 0, 0]], float),
            ego_speed=8.0, time_horizon=3.0, time_step=0.1,
        )
    ]
    ci_d = sweep_frames(preps, device=True)
    ci_h = sweep_frames(preps, device=False)
    assert np.array_equal(ci_d[0], ci_h[0])
    assert ci_d[0][0] == int(np.ceil(8.0 * 3.0 / 1.0))


def test_native_batch_wrappers_match_scalar():
    """The batched ctypes entry points (one crossing per frame's whole path
    cluster — ``dmv_max_curvature_batch`` / ``dmv_frenet_batch`` /
    ``dmv_frenet_two_pass``) must equal the scalar dispatches BIT-FOR-BIT:
    the C++ side invokes the same scalar kernels in path order, and the
    Python side must not perturb inputs while concatenating."""
    import defensive_model_vae_tpu.dnda.spline as sp

    if sp._load_native() is None:
        pytest.skip("native spline unavailable (no toolchain)")

    rng = np.random.default_rng(3)
    paths = []
    for n in (60, 101, 140):
        x = np.linspace(0.0, n * 0.9, n) + rng.normal(0, 1e-3, n)
        y = 2.0 * np.sin(x / 25.0) + rng.normal(0, 1e-3, n)
        paths.append((x, y))
    xs = [p[0] for p in paths]
    ys = [p[1] for p in paths]

    ks = sp.max_curvature_batch_native(xs, ys)
    for k, x, y in zip(ks, xs, ys):
        assert k == sp.max_curvature_native(x, y)

    ua, al, tx, ty, bx, cx, by, cy, rc = sp.frenet_batch_native(xs, ys, 100)
    assert not rc.any()
    for i, (x, y) in enumerate(zip(xs, ys)):
        u0, a0, tr, b0, c0, b1, c1, sg = sp.frenet_native(
            np.column_stack([x, y]), 100
        )
        assert u0 == ua[i] and a0 == al[i]
        assert np.array_equal(tr[:, 0], tx[i]) and np.array_equal(tr[:, 1], ty[i])
        for got, ref in ((bx[i], b0), (cx[i], c0), (by[i], b1), (cy[i], c1)):
            assert np.array_equal(got, ref)

    pts = np.column_stack(paths[1])
    fused = sp.frenet_two_pass_native(pts, 50, 1.0)
    assert fused is not None
    _, arc, *_ = sp.frenet_native(pts, 50)
    m = round(arc / 1.0)
    assert fused[8] == m
    ref = sp.frenet_native(pts, m)
    assert fused[0] == ref[0] and fused[1] == ref[1]
    assert np.array_equal(fused[2], ref[2])
    for j in (3, 4, 5, 6, 7):
        assert np.array_equal(fused[j], ref[j])


def test_drivable_area_matches_original_per_point_loops():
    """The vectorized polygon stitching must reproduce the original
    per-point append loops exactly — INCLUDING the preserved quirk that a
    neighbor's ci == -1 (collision at the first rectangle) wraps to the
    LAST rectangle via Python negative indexing (``rects[-1]``)."""
    from defensive_model_vae_tpu.dnda.risk import drivable_area

    def oracle(usable_num, ego_rects, ci):
        # the pre-vectorization loops, verbatim
        px, py, collided = [], [], []
        for i in range(usable_num):
            if ci[i] < 0:
                collided.append(True)
                continue
            collided.append(False)
            rects = ego_rects[i]
            if i == 0:
                if usable_num == 1:
                    for j in range(ci[i] + 1):
                        px.append(rects[j][0, 1]); py.append(rects[j][1, 1])
                    px.append(rects[ci[i]][0, 0]); py.append(rects[ci[i]][1, 0])
                    for j in range(ci[i], -1, -1):
                        px.append(rects[j][0, 3]); py.append(rects[j][1, 3])
                    continue
                for j in range(ci[i] + 1):
                    px.append(rects[j][0, 1]); py.append(rects[j][1, 1])
                px.append(rects[ci[i]][0, 0]); py.append(rects[ci[i]][1, 0])
                if ci[i] > ci[i + 1]:
                    for j in range(ci[i], ci[i + 1] - 1, -1):
                        px.append(rects[j][0, 3]); py.append(rects[j][1, 3])
            if 0 < i < usable_num - 1:
                if ci[i] > ci[i - 1]:
                    for j in range(ci[i - 1], ci[i] + 1):
                        px.append(rects[j][0, 0]); py.append(rects[j][1, 0])
                    if ci[i] > ci[i + 1]:
                        for j in range(ci[i], ci[i + 1] - 1, -1):
                            px.append(rects[j][0, 3]); py.append(rects[j][1, 3])
                else:
                    if ci[i] > ci[i + 1]:
                        for j in range(ci[i], ci[i + 1] - 1, -1):
                            px.append(rects[j][0, 3]); py.append(rects[j][1, 3])
                    elif ci[i] == ci[i + 1]:
                        px.append(rects[ci[i]][0, 3]); py.append(rects[ci[i]][1, 3])
            if i == usable_num - 1 and usable_num > 1:
                if ci[i] > ci[i - 1]:
                    for j in range(ci[i - 1], ci[i] + 1):
                        px.append(rects[j][0, 0]); py.append(rects[j][1, 0])
                for j in range(ci[i], -1, -1):
                    px.append(rects[j][0, 3]); py.append(rects[j][1, 3])
                px.append(rects[0][0, 2]); py.append(rects[0][1, 2])
        if usable_num == 0 or all(collided):
            return 0.0
        return shoelace_area(px, py)

    rng = np.random.default_rng(11)
    rects3 = [rng.normal(size=(9, 2, 4)) for _ in range(3)]
    cases = [
        [-1, 5, 7], [5, -1, 7], [5, 7, -1], [-1, -1, 4], [7, 5, 2],
        [2, 5, 7], [3, 3, 3], [0, 0, 0], [8, 0, 8], [-1, -1, -1],
    ]
    for ci in cases:
        got = drivable_area(3, rects3, np.asarray(ci))
        want = oracle(3, rects3, np.asarray(ci))
        assert got == want, ci
    for ci in ([4], [-1], [0], [8]):
        got = drivable_area(1, rects3[:1], np.asarray(ci))
        assert got == oracle(1, rects3[:1], np.asarray(ci)), ci


def test_cluster_batch_helpers_match_per_path():
    """``_paths_xy_full`` row slices and the batched ``_rect_sweep`` must be
    bit-identical to the per-path helpers they replace in
    ``generate_ego_cluster``."""
    from defensive_model_vae_tpu.dnda.frenet import way_from_baseline
    from defensive_model_vae_tpu.dnda.paths import (
        _path_xy, _paths_xy_full, _rect_sweep,
    )

    rng = np.random.default_rng(5)
    base = np.column_stack(
        [np.linspace(0, 80, 90), 1.5 * np.sin(np.linspace(0, 3, 90))]
    )
    way, unit_arc, _, s_grid = way_from_baseline(base, 80)
    profs = [
        (rng.normal(0, 1e-4), rng.normal(0, 1e-2), rng.normal(0, 0.1), rng.normal())
        for _ in range(5)
    ]
    segs = [20, 35, 50, 65, 80]
    xf, yf = _paths_xy_full(way, s_grid, profs)
    for j, (prof, seg) in enumerate(zip(profs, segs)):
        x1, y1 = _path_xy(way, s_grid, seg, *prof)
        assert np.array_equal(xf[j, : seg + 1], x1)
        assert np.array_equal(yf[j, : seg + 1], y1)

    theta = rng.normal(0, 1.0, (3, 41))
    px = rng.normal(0, 10.0, (3, 41))
    py = rng.normal(0, 10.0, (3, 41))
    batched = _rect_sweep(px, py, theta, 7.2, 2.3)
    for j in range(3):
        single = _rect_sweep(px[j], py[j], theta[j], 7.2, 2.3)
        assert np.array_equal(batched[j], single)


@requires_reference
@pytest.mark.parametrize("sat_dtype", ["float64", "float32"])
def test_device_sweep_matches_host_on_real_episode(sat_dtype):
    """The batched device collision sweep (device_sweep.py) produces
    IDENTICAL frames and RL values to the frame-by-frame numpy path on a
    real SUT episode, in both SAT precisions.  (On the full 21-episode
    corpus both dtypes are row-identical to the host pool — validated at
    integration time; this is the CI-sized pin.)"""
    from defensive_model_vae_tpu.dnda.calculator import (
        _finalize_episode,
        prepare_episode,
    )
    from defensive_model_vae_tpu.dnda.core import sweep_frames

    csv = REFERENCE_ROOT / "SUT_Testing/collected_data/DEF_StaticBlindTown05_1.csv"
    frames, preps = prepare_episode(str(csv), "sce1", max_frames=40)
    host = _finalize_episode(frames, preps, sweep_frames(preps, device=False))
    dev = _finalize_episode(
        frames, preps, sweep_frames(preps, device=True, sat_dtype=sat_dtype)
    )
    assert host.frames == dev.frames
    assert np.array_equal(np.asarray(host.dnda), np.asarray(dev.dnda))


def test_device_sweep_synthetic_shapes():
    """Padding/bucketing edge cases: empty vehicle list, differing path
    counts per frame, and point counts below the bucket size."""
    from defensive_model_vae_tpu.dnda.core import FramePrep, sweep_frames

    from conftest import straight_rect_sweep as rect_sweep

    preps = [
        FramePrep(
            ego_rects=[rect_sweep(60, 0.0), rect_sweep(45, 0.0)],
            usable=[0, 1], unit_arc_paths=[1.0, 1.3],
            k_maxes=[0.01, 0.02],
            sur_array=np.array([[20.0, 0.0, 4.0, 2.0, 0.0, 0.0, 0.0, 0.0, 0.0]]),
            ego_speed=10.0, time_horizon=3.0, time_step=0.1,
        ),
        FramePrep(
            ego_rects=[rect_sweep(60, 0.0)],
            usable=[0], unit_arc_paths=[1.0], k_maxes=[0.01],
            sur_array=np.zeros((0, 9)),  # no vehicles → default indices
            ego_speed=5.0, time_horizon=3.0, time_step=0.1,
        ),
    ]
    host = sweep_frames(preps, device=False)
    dev = sweep_frames(preps, device=True)
    for h, d in zip(host, dev):
        assert np.array_equal(h, d), (h, d)
    # stationary vehicle at x=20 blocks the path: first hit before index 20
    assert host[0][0] < 20
    # vehicle-free frame returns the ceil(speed*horizon/u) default
    assert host[1][0] == int(np.ceil(5.0 * 3.0 / 1.0))


def test_device_sweep_fuzz_vs_host():
    """Randomized frames (varying path counts, point counts, vehicle
    counts, speeds, accelerating/reversing vehicles) — device sweep must
    match the host scan index-for-index in both SAT precisions."""
    from defensive_model_vae_tpu.dnda.core import FramePrep, sweep_frames

    rng = np.random.default_rng(7)

    def rand_path_rects(n):
        # curving path of rectangles with random heading drift
        th = np.cumsum(rng.normal(0, 0.05, n))
        x = np.cumsum(np.cos(th)); y = np.cumsum(np.sin(th))
        L, W = 4.8, 2.0
        base = np.array([[L/2, -L/2, -L/2, L/2], [-W/2, -W/2, W/2, W/2]])
        c, s = np.cos(th), np.sin(th)
        R = np.stack([np.stack([c, -s], -1), np.stack([s, c], -1)], axis=-2)
        r = np.einsum("nij,jk->nik", R, base)
        r += np.stack([x, y], axis=1)[:, :, None]
        return r

    preps = []
    for _ in range(25):
        n_paths = int(rng.integers(1, 9))
        n_veh = int(rng.integers(0, 7))
        sur = np.zeros((n_veh, 9))
        for v in range(n_veh):
            sur[v] = [rng.uniform(0, 40), rng.uniform(-6, 6), 4.0, 2.0,
                      rng.uniform(-8, 8), rng.uniform(-2, 2),
                      rng.uniform(-3, 3), rng.uniform(-1, 1),
                      rng.uniform(-3, 3)]
        preps.append(
            FramePrep(
                ego_rects=[rand_path_rects(int(rng.integers(20, 120)))
                           for _ in range(n_paths)],
                usable=list(range(n_paths)),
                unit_arc_paths=list(rng.uniform(0.6, 1.6, n_paths)),
                k_maxes=list(rng.uniform(0.005, 0.1, n_paths)),
                sur_array=sur,
                ego_speed=float(rng.uniform(0.5, 18)),
                time_horizon=3.0, time_step=0.1,
            )
        )
    host = sweep_frames(preps, device=False)
    for dtype in ("float64", "float32"):
        dev = sweep_frames(preps, device=True, sat_dtype=dtype)
        for i, (h, d) in enumerate(zip(host, dev)):
            assert np.array_equal(h, d), (dtype, i, h, d)


def test_risk_level_no_usable_paths_raises():
    """With no usable path the weighted total length is 0: numpy's silent
    0/0 would emit NaN, which the episode driver cannot skip and which
    poisons max() over an episode's DNDA values.  The reference's
    Python-int division raises ZeroDivisionError here — which IS in the
    driver's (ValueError, ZeroDivisionError) skip set — so we must too."""
    import pytest

    from defensive_model_vae_tpu.dnda.risk import risk_level

    with pytest.raises(ZeroDivisionError):
        risk_level([], [0.1, 0.2], np.array([]), [], 5.0, 3.0)


def test_native_frenet_matches_numpy_oracle():
    """dmv_frenet must agree with cartesian_to_frenet_numpy — the docstring
    names the numpy body as its arithmetic oracle, but nothing pinned the
    two directly (every other test runs whichever path is active)."""
    from defensive_model_vae_tpu.dnda import frenet as fr
    from defensive_model_vae_tpu.dnda import spline as sp

    probe = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.5]])
    if sp.frenet_native(probe, 4) is None:
        pytest.skip("native frenet unavailable (no toolchain)")
    rng = np.random.default_rng(2)
    for n, m in ((3, 5), (12, 40), (60, 100), (200, 400)):
        # gently curving forward path (the function's domain: DNDA lane
        # baselines — a path that doubles back in x is rejected by both
        # implementations' strictly-increasing spline grids)
        x = np.cumsum(rng.uniform(0.3, 1.2, n))
        y = np.cumsum(rng.normal(0.0, 0.08, n))
        pts = np.column_stack([x, y])
        nat = sp.frenet_native(pts, m)
        ora = fr.cartesian_to_frenet_numpy(pts, m)
        for a, b in zip(nat, ora):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-11, atol=1e-12
            )
