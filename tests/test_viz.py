"""Visualization smoke tests: every figure/animation renders to a file."""

import numpy as np
import pytest

pytest.importorskip("matplotlib")

from defensive_model_vae_tpu.viz import (
    animate_human_vs_model,
    animate_tracking,
    load_loss_csv,
    plot_histogram,
    plot_losses,
    plot_spatial_distribution,
    plot_spatiotemporal,
    plot_static_case,
    plot_tracking_results,
    plot_velocity_distribution,
    smooth_curve,
    vehicle_rectangle,
)

from conftest import REFERENCE_ROOT, requires_reference


def _history(n=50):
    e = np.arange(n, dtype=float)
    base = np.exp(-e / 10)
    return {k: base * (i + 1) for i, k in enumerate(["total", "recon", "kld", "start", "time"])}


def test_plot_losses_and_csv_roundtrip(tmp_path):
    p = plot_losses(_history(), str(tmp_path / "loss.png"))
    assert (tmp_path / "loss.png").exists()
    hist2 = load_loss_csv(str(tmp_path / "loss.csv"))
    # every column: the synthetic history makes components distinguishable
    # (base*(i+1)), so a header/column transposition cannot pass
    for k, v in _history().items():
        assert np.allclose(hist2[k], v), k


def test_vehicle_rectangle_geometry():
    r = vehicle_rectangle(1.0, 2.0, 0.0, 4.0, 2.0)
    assert r.shape == (4, 2)
    assert np.allclose(r.mean(axis=0), [1.0, 2.0])
    r90 = vehicle_rectangle(0, 0, np.pi / 2, 4.0, 2.0)
    # rotated 90°: extent 2 along x, 4 along y
    assert np.isclose(np.ptp(r90[:, 0]), 2.0) and np.isclose(np.ptp(r90[:, 1]), 4.0)


def test_smooth_curve_passes_near_endpoints():
    t = np.linspace(0, 5, 8)
    pts = np.column_stack([t, np.cos(t), np.sin(t)])
    sm = smooth_curve(pts, start_heading=None, n=100)
    assert sm.shape == (100, 3)
    assert np.allclose(sm[0], pts[0], atol=1e-9)
    # positions span the full curve; the time column mirrors the
    # reference's arange grid, which EXCLUDES t_end
    assert np.allclose(sm[-1, 1:], pts[-1, 1:], atol=1e-9)
    assert sm[-1, 0] < pts[-1, 0]


@requires_reference
def test_smooth_curve_matches_live_reference():
    """Row-for-row parity with ``Tools.create_smooth_curve`` run live —
    chord-length parameterization, natural boundaries, and the clamped
    start-heading derivative scaled by the mean segment length
    (``Tools.py:775-830``), on an UNEVENLY spaced trajectory where a
    time-parameterized spline would visibly differ."""
    import contextlib
    import io
    import sys

    sys.path.insert(0, str(REFERENCE_ROOT))
    try:
        with contextlib.redirect_stdout(io.StringIO()):
            import Tools as RT
    finally:
        sys.path.pop(0)

    rng = np.random.default_rng(9)
    t = np.sort(rng.uniform(0.1, 7.0, 9))
    t[0] = 0.0
    pts = np.column_stack(
        [t, np.cumsum(rng.uniform(0.5, 3.0, 9)), np.cumsum(rng.normal(0, 1.0, 9))]
    )
    for angle in (None, 0.7):
        ref = RT.create_smooth_curve(pts, time_interval=0.015, start_angle=angle)
        ours = smooth_curve(pts, start_heading=angle, time_interval=0.015)
        np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_velocity_distribution_plot(tmp_path):
    rng = np.random.default_rng(0)
    plot_velocity_distribution(
        rng.normal(10, 2, 500), rng.normal(11, 2, 400),
        str(tmp_path / "v.png"), js_divergence=0.1,
    )
    assert (tmp_path / "v.png").exists()


def test_spatial_distribution_plot(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.uniform([-197, 45], [-190, 75], (300, 2))
    plot_spatial_distribution(pts, "sce1", str(tmp_path / "s.png"))
    assert (tmp_path / "s.png").exists()


def test_tracking_results_plot(tmp_path, windows_sce1):
    from defensive_model_vae_tpu.control import MPCConfig, PathReference, track

    wp = windows_sce1[1][:, [1, 2, 0]].astype(float)
    wp[0, 2] = 0.0
    v0 = (wp[1, :2] - wp[0, :2]) / (wp[1, 2] - wp[0, 2])
    init = np.array([wp[0, 0], wp[0, 1], np.arctan2(v0[1], v0[0]), v0[0], v0[1]])
    cfg = MPCConfig(prediction_horizon=10, control_horizon=5, dt=0.05)
    times, states, controls = track(wp, init, cfg)
    plot_tracking_results(
        times, states, controls, wp, PathReference(wp, init),
        str(tmp_path / "mpc.png"), axis_flip="y",
    )
    assert (tmp_path / "mpc.png").exists()


def test_static_case_and_histogram(tmp_path):
    t = np.linspace(0, 5, 60)
    human = [np.column_stack([-193 + 0.1 * t, 45 + 5 * t, t])]
    model = np.column_stack([-193.5 + 0.1 * t, 45 + 5 * t, t])
    plot_static_case(model, human, [], "sce1", str(tmp_path / "case.png"))
    assert (tmp_path / "case.png").exists()
    plot_histogram(np.abs(np.random.default_rng(0).normal(5, 1, 100)),
                   str(tmp_path / "h.png"), "THW", "THW (s)")
    assert (tmp_path / "h.png").exists()


def test_spatiotemporal_plot(tmp_path):
    t = np.linspace(0, 5, 60)
    humans = [np.column_stack([-193 + 0.1 * t, 45 + 5 * t, t])]
    models = [np.column_stack([-193.4 + 0.1 * t, 45 + 5 * t, np.zeros_like(t), np.full_like(t, 5)])]
    paths = plot_spatiotemporal(humans, models, "sce1", str(tmp_path))
    assert len(paths) == 2


def test_animations(tmp_path):
    t = np.linspace(0, 3, 40)
    model = np.column_stack([-193.5 + 0.1 * t, 45 + 8 * t, t])
    human = np.column_stack([-193.0 + 0.1 * t, 45 + 7 * t, t])
    bv = np.column_stack([-190.0 + 0.0 * t, 60 + 0 * t, t])
    p = animate_human_vs_model(human, bv, None, model, "sce1",
                               str(tmp_path / "hm.gif"), frame_stride=8)
    assert (tmp_path / "hm.gif").exists()

    wp = np.column_stack([2 * t, 0.5 * t, t])
    states = np.column_stack([2 * t, 0.5 * t, np.full_like(t, 0.24), np.full_like(t, 2)])
    animate_tracking(wp, states, "sce1", str(tmp_path / "track.gif"), frame_stride=8)
    assert (tmp_path / "track.gif").exists()

    # full scene dressing (the Drawing_Tools variants): static + moving
    # background vehicles, lane lines, time+speed HUD
    animate_tracking(
        wp, states, "sce1", str(tmp_path / "track_full.gif"), frame_stride=8,
        draw_lanes=True, static_bv_xy=np.array([3.0, 2.0]),
        moving_bv_waypoints=np.array([[0.0, -2.0], [4.0, -2.0], [6.0, -1.0]]),
    )
    assert (tmp_path / "track_full.gif").exists()


def test_constant_speed_trajectory():
    """Arc-length parameterization: uniform speed along the polyline
    (reference Drawing_Tools.calculate_moving_bg_vehicle_trajectory)."""
    from defensive_model_vae_tpu.viz.gif import constant_speed_trajectory

    # corner at arc length 6.5 — strictly BETWEEN the 1 m arc samples, so
    # a segment-boundary bug cannot hide behind samples landing on it
    wp = np.array([[0.0, 0.0], [6.5, 0.0], [6.5, 5.0]])
    path = constant_speed_trajectory(wp, speed=2.0, dt=0.5)
    # analytic on-polyline positions: (s, 0) for s <= 6.5, then
    # (6.5, s-6.5), clamped at the path end (total arc 11.5)
    s_arc = np.minimum(np.arange(len(path)) * 1.0, 11.5)
    expect = np.where(
        (s_arc <= 6.5)[:, None],
        np.column_stack([s_arc, np.zeros_like(s_arc)]),
        np.column_stack([np.full_like(s_arc, 6.5), s_arc - 6.5]),
    )
    assert np.allclose(path, expect, atol=1e-9)
    # chord steps equal the arc step away from the corner and the clamped
    # tail; the corner-straddling chord is shorter (samples stay ON the
    # polyline, not on a chord)
    steps = np.hypot(*np.diff(path, axis=0).T)
    assert np.allclose(np.delete(steps, [6, len(steps) - 1]), 1.0, atol=1e-9)
    assert steps[6] < 1.0 - 1e-6
    assert np.allclose(path[0], [0, 0]) and np.allclose(path[-1], [6.5, 5])


def test_generated_vs_training_and_offset_curves(tmp_path, windows_sce1):
    from defensive_model_vae_tpu.viz.plots import (
        plot_generated_vs_training,
        plot_velocity_and_lateral_offset,
    )

    gen = windows_sce1[:3] + 0.5
    plot_generated_vs_training(gen, windows_sce1[:10], "sce1", str(tmp_path / "g.png"))
    assert (tmp_path / "g.png").exists()

    t = np.linspace(0, 5, 60)
    model = np.column_stack([-193.2 + 0.1 * t, 45 + 6 * t, t])
    human = np.column_stack([-193.4 + 0.1 * t, 45 + 5.5 * t, t])
    plot_velocity_and_lateral_offset(model, human, "sce1", str(tmp_path / "vo.png"))
    assert (tmp_path / "vo.png").exists()


def test_spatial_distribution_trajectory_count_mode(tmp_path):
    from defensive_model_vae_tpu.viz.plots import plot_spatial_distribution

    t = np.linspace(0, 5, 80)
    trajs = [np.column_stack([-195 + 0.02 * t, 45 + 5 * t, t]),
             np.column_stack([-193 + 0.02 * t, 45 + 5 * t, t])]
    plot_spatial_distribution(
        scenario="sce1", save_path=str(tmp_path / "tc.png"), trajectories=trajs
    )
    assert (tmp_path / "tc.png").exists()


def test_space_time_velocity_and_colorbar_range(tmp_path):
    from defensive_model_vae_tpu.viz import (
        plot_space_time_velocity,
        unified_colorbar_range,
    )

    t = np.linspace(0, 10, 80)
    coords = [45 + 5 * t, 45 + 5.5 * t]
    times = [t, t]
    vs = [np.full_like(t, 5.0), np.full_like(t, 6.0)]
    surf = plot_space_time_velocity(
        coords, times, vs,
        str(tmp_path / "lines.png"), str(tmp_path / "surf.png"),
        axis="y", scenario="sce3",
        coord_range=np.array([40.0, 110.0]),  # array-valued ranges accepted
        time_range=(0.0, 10.0), vmin=0.0, vmax=8.0,
    )
    assert surf.shape == (40, 40)
    assert (tmp_path / "lines.png").exists() and (tmp_path / "surf.png").exists()
    # empty input warns and returns None instead of crashing
    with pytest.warns(UserWarning):
        assert plot_space_time_velocity(
            [], [], [], str(tmp_path / "l2.png"), str(tmp_path / "s2.png")
        ) is None

    rng = np.random.default_rng(0)
    a = rng.uniform([-197, 45], [-190, 75], (200, 2))
    b = rng.uniform([-197, 45], [-190, 75], (900, 2))
    vmin, vmax = unified_colorbar_range([a, b], "sce1")
    assert 0 < vmin <= vmax
    # trajectory-count mode
    trajs = [np.column_stack([a, np.zeros(len(a))])]
    vmin2, vmax2 = unified_colorbar_range(scenario="sce1", trajectory_sets=[trajs])
    assert vmax2 >= vmin2 >= 0


def test_cli_loss_plot(tmp_path):
    """defvae loss-plot round-trips a saved loss CSV (Loss_Re-plot.py)."""
    import numpy as np

    from defensive_model_vae_tpu.cli import main
    from defensive_model_vae_tpu.viz.losses import save_loss_csv

    hist = {
        k: np.linspace(10, 0.1, 50)
        for k in ("total", "recon", "kld", "start", "time")
    }
    csv = tmp_path / "loss.csv"
    save_loss_csv(hist, str(csv))
    out = tmp_path / "loss.png"
    main(["loss-plot", "--csv", str(csv), "--out", str(out)])
    assert out.exists() and out.stat().st_size > 1000


@requires_reference
@pytest.mark.slow
def test_cli_gif_and_case(tmp_path):
    """defvae gif/case render from a real CSV + tracked trace."""
    import numpy as np

    from defensive_model_vae_tpu.cli import main

    csv = str(
        REFERENCE_ROOT
        / "DefensiveData/StaticBlindTown05/减速/exp_11_control_StaticBlindTown05_3.csv"
    )
    trace = tmp_path / "trace.npy"
    # short synthetic trace shaped like a tracked trajectory
    n = 60
    states = np.column_stack(
        [
            np.full(n, -194.4),
            np.linspace(40, 60, n),
            np.full(n, np.pi / 2),
            np.full(n, 10.0),
        ]
    )
    np.save(trace, states)
    case = tmp_path / "case.png"
    main(["case", "--scenario", "sce1", "--csv", csv, "--trace", str(trace),
          "--out", str(case)])
    assert case.exists() and case.stat().st_size > 1000

    gif = tmp_path / "hm.gif"
    main(["gif", "--scenario", "sce1", "--csv", csv, "--trace", str(trace),
          "--out", str(gif)])
    assert gif.exists() and gif.stat().st_size > 5000


def test_lateral_offset_centers_match_reference():
    """The lateral-offset lane CENTERLINES are the reference's hardcoded
    values (Plot_Gif.py:327-338), not any painted lane line."""
    from defensive_model_vae_tpu import scenarios as _sc

    expected = {
        "sce1": ("x", -195.05),
        "sce2": ("y", -0.55),
        "sce3": ("x", 155.05),
        "sce4": ("x", 16.25),
    }
    for key, (axis, value) in expected.items():
        got = _sc.get(key).lateral_offset_center
        assert got == (axis, value), (key, got)
        # and none of them coincides with a painted line
        assert all(
            not (l.axis == axis and np.isclose(l.value, value))
            for l in _sc.get(key).lane_lines
        ), key
