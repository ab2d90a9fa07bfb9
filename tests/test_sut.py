"""SUT layer tests: write-back kinematics + surrogate metrics on real logs."""

import numpy as np
import pandas as pd
import pytest

from defensive_model_vae_tpu.metrics import compute_metric, slice_episode
from defensive_model_vae_tpu.sut import (
    compute_ego_kinematics,
    expected_csv_name,
    find_best_start_row,
    merge_trajectory_into_csv,
    parse_tracked_npy_name,
    writeback_npy_to_csv,
)

from conftest import REFERENCE_ROOT, requires_reference


def test_parse_tracked_npy_name():
    assert parse_tracked_npy_name("tracked_trajectory_sce1_exp1_3.npy") == (
        "sce1", "1", "3",
    )
    assert (
        expected_csv_name("sce1", "1", "3")
        == "exp_1_control_StaticBlindTown05_3.csv"
    )
    with pytest.raises(ValueError):
        parse_tracked_npy_name("something_else.npy")


def test_ego_kinematics():
    t = np.arange(5, dtype=float)
    theta = np.zeros(5)
    v = 2 * t  # constant acceleration 2 along +x
    vx, vy, ax, ay, yaw = compute_ego_kinematics(theta, v, t)
    assert np.allclose(vx, v) and np.allclose(vy, 0)
    assert np.allclose(ax, 2.0) and np.allclose(ay, 0)
    assert np.allclose(yaw, 0)


def _toy_csv(n=20):
    cols = {
        "frame": np.arange(n, dtype=float),
        "ego_x": np.linspace(0, 10, n),
        "ego_y": np.zeros(n),
        "ego_vx": np.ones(n),
        "ego_vy": np.zeros(n),
        "ego_ax": np.zeros(n),
        "ego_ay": np.zeros(n),
        "ego_yaw": np.zeros(n),
    }
    return pd.DataFrame(cols)


def test_merge_trajectory_basic():
    df = _toy_csv()
    traj = np.column_stack(
        [np.linspace(5, 8, 6), np.ones(6), np.full(6, np.pi / 2), np.full(6, 3.0)]
    )
    start = find_best_start_row(df, 5.0, 1.0)  # nearest to (5, 1) → x≈5 row
    out = merge_trajectory_into_csv(df, traj, start)
    # trajectory shorter than remainder → truncated tail
    assert len(out) == start + 6
    seg = out.iloc[start:]
    assert np.allclose(seg["ego_x"], traj[:, 0])
    assert np.allclose(seg["ego_yaw"], 90.0)
    assert np.allclose(seg["ego_vx"], 0.0, atol=1e-12)
    assert np.allclose(seg["ego_vy"], 3.0)


@requires_reference
def test_writeback_real_npy(tmp_path):
    npy = REFERENCE_ROOT / "results/GeneratedData/tracked_trajectory_sce1_exp11_3.npy"
    out = writeback_npy_to_csv(
        npy, REFERENCE_ROOT / "DefensiveData", tmp_path
    )
    assert out.name == "exp_11_control_StaticBlindTown05_3_def.csv"
    merged = pd.read_csv(out)
    traj = np.load(npy)
    start = find_best_start_row(merged, traj[0, 0], traj[0, 1])
    assert np.isclose(merged["ego_x"].iloc[start], traj[0, 0])


@requires_reference
@pytest.mark.parametrize("metric", ["TTC", "PET", "JERK"])
def test_surrogate_metrics_on_real_episode(metric):
    csv = REFERENCE_ROOT / "SUT_Testing/collected_data/DEF_StaticBlindTown05_1.csv"
    out = compute_metric(str(csv), "sce1", metric)
    assert metric in out.columns
    vals = out[metric].to_numpy(float)
    finite = vals[np.isfinite(vals)]
    assert len(finite) > 0
    if metric == "TTC":
        assert np.nanmedian(np.abs(finite)) < 1e3  # sane scale


@requires_reference
def test_episode_slice_real():
    csv = REFERENCE_ROOT / "SUT_Testing/collected_data/IDM_StaticBlindTown05.csv"
    df = pd.read_csv(csv)
    sub = slice_episode(df, "sce1")
    assert 0 < len(sub) <= len(df)
    assert sub["ego_y"].iloc[0] > 0
    # ends at the first ego_y >= 80 (inclusive) or file end
    if (sub["ego_y"] >= 80).any():
        assert sub["ego_y"].iloc[-1] >= 80
        assert (sub["ego_y"].iloc[:-1] < 80).all()


@requires_reference
def test_writeback_then_dnda_integration(tmp_path):
    """Full C20→C21 chain: inject a tracked trajectory into its source CSV,
    then DNDA-score the resulting episode."""
    from defensive_model_vae_tpu.dnda import process_episode

    npy = REFERENCE_ROOT / "results/GeneratedData/tracked_trajectory_sce1_exp11_3.npy"
    out_csv = writeback_npy_to_csv(npy, REFERENCE_ROOT / "DefensiveData", tmp_path)
    res = process_episode(str(out_csv), "sce1", max_frames=8)
    assert len(res.frames) > 0
    assert all(0.0 <= v <= 1.0 for v in res.dnda)


@requires_reference
@pytest.mark.parametrize(
    "town,key,model,trial",
    [
        ("StaticBlindTown05", "sce1", "DEF", 1),
        ("DynamicBlindTown05", "sce2", "IDM", 1),
        ("PredictableMovementTown05", "sce3", "TCP", 1),
        ("UnpredictableMovementTown04", "sce4", "DEF", 1),
    ],
)
def test_surrogate_metrics_differential_vs_live_reference(town, key, model, trial):
    """TTC/PET/JERK columns must match the reference implementation run
    live on the same episode, row for row (validated bit-exact on all
    4 scenarios × 3 metrics)."""
    import sys

    sys.path.insert(0, str(REFERENCE_ROOT / "SUT_Testing/tools"))
    try:
        import Metrics_Calculation as RM
    finally:
        sys.path.pop(0)

    csv = REFERENCE_ROOT / f"SUT_Testing/collected_data/{model}_{town}_{trial}.csv"
    if not csv.exists():
        csv = REFERENCE_ROOT / f"SUT_Testing/collected_data/{model}_{town}.csv"
        trial = None
    for metric in ("TTC", "PET", "JERK"):
        ref = RM.compute_metric_from_csv(model, town, trial, metric=metric)
        mine = compute_metric(str(csv), key, metric)
        a = np.asarray(ref[metric], float)
        b = np.asarray(mine[metric], float)
        assert len(a) == len(b)
        both_nan = np.isnan(a) & np.isnan(b)
        assert (np.isclose(a, b, rtol=1e-9, atol=1e-12) | both_nan).all(), metric


@requires_reference
def test_writeback_differential_vs_live_reference():
    """merge_trajectory_into_csv must produce byte-equivalent ego columns
    to the reference implementation run live on the same inputs."""
    import sys

    sys.path.insert(0, str(REFERENCE_ROOT / "SUT_Testing"))
    try:
        import Defensive_Testing as RD
    finally:
        sys.path.pop(0)

    traj = np.load(
        REFERENCE_ROOT / "results/GeneratedData/tracked_trajectory_sce1_exp11_3.npy"
    )[:, :4].astype(float)
    csv = (
        REFERENCE_ROOT
        / "DefensiveData/StaticBlindTown05/减速/exp_11_control_StaticBlindTown05_3.csv"
    )
    df = pd.read_csv(csv)
    start_ref = RD.find_best_start_row(df, traj[0, 0], traj[0, 1])
    start_my = find_best_start_row(df, traj[0, 0], traj[0, 1])
    assert start_ref == start_my
    ref_out = RD.merge_trajectory_into_csv(df, traj, start_ref)
    my_out = merge_trajectory_into_csv(df, traj, start_my)
    assert len(ref_out) == len(my_out)
    for col in ("ego_x", "ego_y", "ego_vx", "ego_vy", "ego_ax", "ego_ay", "ego_yaw"):
        assert np.allclose(
            np.asarray(ref_out[col], float),
            np.asarray(my_out[col], float),
            rtol=1e-12, atol=1e-12, equal_nan=True,
        ), col


def test_parse_tracked_npy_unknown_scenario_raises():
    """'sce10' must raise, not fuzzy-resolve to sce1 via scenarios.get's
    substring fallback and write back into the wrong town's CSV."""
    with pytest.raises(ValueError, match="sce10"):
        parse_tracked_npy_name("tracked_trajectory_sce10_exp1_2.npy")
