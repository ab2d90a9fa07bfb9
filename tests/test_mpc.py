"""MPC tracker tests: dynamics golden cases, reference construction,
tracking-quality bands on real scenario windows, batch/single parity."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from defensive_model_vae_tpu.control import MPCConfig, PathReference, track, track_batch
from defensive_model_vae_tpu.control.mpc import (
    _initial_tracker_state,
    rollout,
)

CFG = MPCConfig(prediction_horizon=10, control_horizon=5, dt=0.01)


def test_rollout_straight_line():
    # constant speed, zero steer → straight along heading
    state0 = jnp.array([0.0, 0.0, 0.0, 2.0])
    controls = jnp.zeros((100, 2))
    states = rollout(CFG, state0, controls)
    assert np.allclose(states[:, 1], 0.0, atol=1e-9)
    assert np.allclose(states[:, 0], 2.0 * np.arange(101) * CFG.dt, atol=1e-6)
    assert np.allclose(states[:, 3], 2.0)


def test_rollout_constant_steer_turn_rate():
    # Euler bicycle: dθ = v tan(δ)/L per unit time
    v, delta = 5.0, 0.3
    state0 = jnp.array([0.0, 0.0, 0.0, v])
    controls = jnp.tile(jnp.array([0.0, delta]), (50, 1))
    states = rollout(CFG, state0, controls)
    expected_rate = v * np.tan(delta) / CFG.wheelbase
    rates = np.diff(states[:, 2]) / CFG.dt
    assert np.allclose(rates, expected_rate, rtol=1e-5)


def test_rollout_clips_controls():
    state0 = jnp.array([0.0, 0.0, 0.0, 0.0])
    controls = jnp.tile(jnp.array([100.0, 0.0]), (10, 1))  # way over max_accel
    states = rollout(CFG, state0, controls)
    assert np.isclose(states[-1, 3], CFG.max_accel * 10 * CFG.dt, rtol=1e-6)


def test_initial_tracker_state():
    s = _initial_tracker_state(np.array([1.0, 2.0, -3.0, 3.0, 4.0]))
    assert np.isclose(s[2], -3.0 + 2 * np.pi)  # −2.8 wrap
    assert np.isclose(s[3], 5.0)  # |v| = hypot(3,4)


def test_path_reference_knots_and_extrapolation():
    t = np.linspace(0, 5, 10)
    wp = np.column_stack([3 * t, -2 * t, t])  # straight line, v = sqrt(13)
    init = np.array([0.0, 0.0, 0.0, 3.0, -2.0])
    ref = PathReference(wp, init)
    x, y, vx, vy = ref.get_reference(t)
    assert np.allclose(x, wp[:, 0], atol=1e-9)
    assert np.allclose(y, wp[:, 1], atol=1e-9)
    # beyond the end: constant-velocity extrapolation
    x2, y2, vx2, vy2 = ref.get_reference(np.array([6.0]))
    assert np.isclose(x2[0], ref.end_x + ref.end_vx * 1.0)
    assert np.isclose(vx2[0], ref.end_vx)
    # straight path: heading constant everywhere
    th = ref.get_reference_heading(np.linspace(0, 6, 20))
    assert np.allclose(th, np.arctan2(-2, 3), atol=1e-6)


def test_reference_low_speed_heading_hold():
    # path that stops: v → 0 at the end; held heading, not garbage
    t = np.array([0.0, 1.0, 2.0, 3.0, 4.0])
    x = np.array([0.0, 4.0, 6.0, 6.5, 6.5])  # decelerating to stop
    wp = np.column_stack([x, np.zeros_like(x), t])
    init = np.array([0.0, 0.0, 0.0, 4.0, 0.0])
    ref = PathReference(wp, init)
    refs = ref.build(num_steps=50, horizon=5, dt=0.1)
    assert refs.shape == (50, 6, 2)
    assert np.all(np.isfinite(refs))


def test_tracking_quality_real_window(windows_sce1):
    """Sub-meter tracking on a well-behaved real scenario window."""
    wp = windows_sce1[1][:, [1, 2, 0]].astype(float)
    wp[0, 2] = 0.0
    # initial heading/speed consistent with the path start
    v0 = (wp[1, :2] - wp[0, :2]) / (wp[1, 2] - wp[0, 2])
    init = np.array([wp[0, 0], wp[0, 1], np.arctan2(v0[1], v0[0]), v0[0], v0[1]])
    cfg = MPCConfig(prediction_horizon=30, control_horizon=20, dt=0.02)
    times, states, controls = track(wp, init, cfg)
    ref = PathReference(wp, init)
    err = ref.position_error(times, states[:, :2])
    assert err.max() < 1.5, err.max()
    assert err.mean() < 0.75, err.mean()
    # controls respect bounds
    assert np.all(np.abs(controls[:, 0]) <= cfg.max_accel + 1e-6)
    assert np.all(np.abs(controls[:, 1]) <= cfg.max_steer + 1e-6)


def test_batch_matches_single(windows_sce1):
    cfg = MPCConfig(prediction_horizon=15, control_horizon=10, dt=0.02)
    idxs = [1, 3]
    wps, inits = [], []
    for i in idxs:
        wp = windows_sce1[i][:, [1, 2, 0]].astype(float)
        wp[0, 2] = 0.0
        v0 = (wp[1, :2] - wp[0, :2]) / (wp[1, 2] - wp[0, 2])
        wps.append(wp)
        inits.append([wp[0, 0], wp[0, 1], np.arctan2(v0[1], v0[0]), v0[0], v0[1]])
    wps, inits = np.stack(wps), np.asarray(inits)
    times_b, states_b, controls_b, steps = track_batch(wps, inits, cfg)

    for b, i in enumerate(idxs):
        t_s, s_s, c_s = track(wps[b], inits[b], cfg)
        n = steps[b]
        # the step count itself must match the single-path run — a wrong
        # (e.g. zero) count would make the state comparison vacuous
        assert n == len(s_s) - 1, (b, n, len(s_s))
        assert np.allclose(times_b[: n + 1], t_s[: n + 1], atol=1e-12)
        assert np.allclose(states_b[b, : n + 1], s_s[: n + 1], atol=1e-4)
        assert np.allclose(controls_b[b, :n], c_s[:n], atol=1e-4)


def test_tracker_matches_reference_slsqp_oracle(windows_sce1):
    """Direct solver-vs-solver parity: fixtures/oracle holds state traces
    produced by RUNNING the reference SLSQP tracker on sce1 windows 1 and 3
    (same waypoints, same initial state).  Our LM tracker must stay within
    a tight band of those traces."""
    import json
    from conftest import FIXTURES

    with open(FIXTURES / "oracle/sce1_start.json") as f:
        sc = json.load(f)
    cfg = MPCConfig(prediction_horizon=30, control_horizon=20, dt=0.02)
    for idx in (1, 3):
        ref_states = np.load(FIXTURES / f"oracle/ref_track_sce1w{idx}.npy")
        wp = windows_sce1[idx][:, [1, 2, 0]].astype(float)
        wp[0, 2] = 0.0
        init = np.array([wp[0, 0], wp[0, 1], sc["angle"], sc["vx"], sc["vy"]])
        times, states, _ = track(wp, init, cfg)
        n = min(len(states), len(ref_states))
        pos = np.hypot(
            states[:n, 0] - ref_states[:n, 0], states[:n, 1] - ref_states[:n, 1]
        )
        v = np.abs(states[:n, 3] - ref_states[:n, 3])
        assert pos.max() < 1.0, (idx, pos.max())
        assert pos.mean() < 0.4, (idx, pos.mean())
        assert v.mean() < 0.2, (idx, v.mean())


def test_tracker_matches_ideal_theta_v_follower(windows_sce1):
    """The tracker's realized [theta, v] must track the reference tensor
    about as well as the formulation allows (solver adequacy check)."""
    wp = windows_sce1[1][:, [1, 2, 0]].astype(float)
    wp[0, 2] = 0.0
    v0 = (wp[1, :2] - wp[0, :2]) / (wp[1, 2] - wp[0, 2])
    init = np.array([wp[0, 0], wp[0, 1], np.arctan2(v0[1], v0[0]), v0[0], v0[1]])
    cfg = MPCConfig(prediction_horizon=30, control_horizon=20, dt=0.02)
    times, states, _ = track(wp, init, cfg)
    ref = PathReference(wp, init)
    refs = ref.build(len(times) - 1, cfg.prediction_horizon, cfg.dt)
    th_err = np.abs(states[:-1, 2] - refs[:, 0, 0])
    v_err = np.abs(states[:-1, 3] - refs[:, 0, 1])
    assert np.median(th_err) < 0.05
    assert np.median(v_err) < 0.25


def test_horizon_sweep(windows_sce1):
    from defensive_model_vae_tpu.control.sweep import sweep_horizons

    wp = windows_sce1[1][:, [1, 2, 0]].astype(float)
    wp[0, 2] = 0.0
    v0 = (wp[1, :2] - wp[0, :2]) / (wp[1, 2] - wp[0, 2])
    init = np.array([wp[0, 0], wp[0, 1], np.arctan2(v0[1], v0[0]), v0[0], v0[1]])
    results = sweep_horizons(wp, init, combos=((10, 5), (20, 10)), dt=0.05)
    assert len(results) == 2
    for r in results:
        assert np.isfinite(r.max_error) and r.mean_error < 5.0


def test_frozen_jacobian_parity(windows_sce1):
    """The frozen-Jacobian solver variant must track within ~1 cm of the
    re-linearized default (kept as an option; no TPU speed benefit —
    see MPCConfig.freeze_jacobian)."""
    import dataclasses

    wp = windows_sce1[1][:, [1, 2, 0]].astype(float)
    wp[0, 2] = 0.0
    v0 = (wp[1, :2] - wp[0, :2]) / (wp[1, 2] - wp[0, 2])
    init = np.array([wp[0, 0], wp[0, 1], np.arctan2(v0[1], v0[0]), v0[0], v0[1]])
    cfg = MPCConfig(prediction_horizon=15, control_horizon=10, dt=0.04)
    _, s_default, _ = track(wp, init, cfg)
    _, s_frozen, _ = track(wp, init, dataclasses.replace(cfg, freeze_jacobian=True))
    assert np.abs(s_default - s_frozen).max() < 0.05


def test_linear_mpc_sine_road():
    """C10 equivalent: LTV box-QP MPC tracks the reference demo's sine
    road from a 1 m lateral offset."""
    from defensive_model_vae_tpu.control import sine_road_demo

    ref, states, controls = sine_road_demo(100)
    # controls respect bounds
    assert np.all(np.abs(controls[:, 0]) <= 1.0 + 1e-6)
    assert np.all(np.abs(controls[:, 1]) <= np.deg2rad(45) + 1e-6)
    # after settling, stays within 0.2 m of the road
    err = [np.hypot(ref[:, 0] - p[0], ref[:, 1] - p[1]).min() for p in states[40:]]
    assert max(err) < 0.2
    # vehicle accelerates from rest toward the reference speed
    assert states[-1, 2] > 1.5


@pytest.mark.slow
def test_device_reference_matches_host(windows_sce1):
    """The JAX not-a-knot reference construction must match the host
    scipy implementation (f32 serving precision)."""
    from defensive_model_vae_tpu.control.device_reference import (
        build_reference_device,
        cubic_eval,
        notaknot_coeffs,
    )
    from scipy.interpolate import interp1d

    rng = np.random.default_rng(0)
    # spline parity vs scipy interp1d(kind='cubic') incl. extrapolation
    t = np.sort(rng.uniform(0, 10, 10)) + np.arange(10) * 1e-3
    y = rng.normal(size=10) * 5
    f = interp1d(t, y, kind="cubic", bounds_error=False, fill_value="extrapolate")
    q = np.linspace(t[0] - 1, t[-1] + 1, 300)
    M = notaknot_coeffs(jnp.asarray(t), jnp.asarray(y))
    mine = cubic_eval(jnp.asarray(t), jnp.asarray(y), M, jnp.asarray(q))
    assert np.abs(np.asarray(mine) - f(q)).max() < 5e-3  # f32

    # reference-tensor parity on real windows
    for idx in (1, 3):
        wp = windows_sce1[idx][:, [1, 2, 0]].astype(float)
        wp[0, 2] = 0.0
        v0 = (wp[1, :2] - wp[0, :2]) / (wp[1, 2] - wp[0, 2])
        init = np.array([wp[0, 0], wp[0, 1], np.arctan2(v0[1], v0[0]), v0[0], v0[1]])
        n = int(wp[-1, 2] / 0.02)
        host = PathReference(wp, init).build(n, 30, 0.02)
        dev = np.asarray(
            jax.jit(
                lambda w, i: build_reference_device(w, i, n, 30, 0.02)
            )(jnp.asarray(wp), jnp.asarray(init))
        )
        assert np.abs(host[..., 0] - dev[..., 0]).max() < 1e-4  # theta
        assert np.abs(host[..., 1] - dev[..., 1]).max() < 0.05  # v (f32)


@pytest.mark.slow
def test_serve_fn_end_to_end(windows_sce1):
    """One jitted device program: sample → reference → MPC; the result must
    track its own generated waypoints."""
    from defensive_model_vae_tpu.control.device_reference import make_serve_fn
    from defensive_model_vae_tpu.models import CVAEConfig, init_params, sample
    from defensive_model_vae_tpu.train import TrainConfig, train

    params, _ = train(windows_sce1, train_cfg=TrainConfig(epochs=400))
    cfg = CVAEConfig()
    mpc = MPCConfig(prediction_horizon=15, control_horizon=10, dt=0.1)
    serve = make_serve_fn(params, cfg, mpc, num_steps=80)

    starts = windows_sce1[:2, 0, 1:3].astype(np.float32)
    inits = []
    for b in range(2):
        w = windows_sce1[b]
        v0 = (w[1, 1:3] - w[0, 1:3]) / (w[1, 0] - w[0, 0])
        inits.append([starts[b, 0], starts[b, 1], np.arctan2(v0[1], v0[0]), v0[0], v0[1]])
    inits = np.asarray(inits, np.float32)

    key = jax.random.PRNGKey(2)
    states, controls = serve(key, jnp.asarray(starts), jnp.asarray(inits))
    states = np.asarray(states)
    assert states.shape == (2, 81, 4)
    assert np.isfinite(states).all()

    # request 0 tracks its own waypoints (reproduce serve's candidate
    # selection: K z-draws per request, first monotone-time decode wins)
    from defensive_model_vae_tpu.control.device_reference import (
        _N_DRAWS,
        select_valid_trajectory,
    )

    keys = jax.random.split(key, 2)
    subkeys = jax.random.split(keys[0], _N_DRAWS)
    cands = jnp.stack([sample(params, k, starts[0][None], cfg)[0] for k in subkeys])
    traj = np.asarray(select_valid_trajectory(cands)).astype(float)
    wp = traj[:, [1, 2, 0]]
    ref = PathReference(wp, inits[0].astype(float))
    n = min(81, int(wp[-1, 2] / mpc.dt) + 1)
    err = ref.position_error(np.arange(n) * mpc.dt, states[0, :n, :2])
    assert err.mean() < 2.0


def test_select_valid_trajectory():
    """Serve-path degenerate-sample handling: first monotone-time candidate
    wins; all-degenerate falls back to a monotone repair of candidate 0."""
    from defensive_model_vae_tpu.control.device_reference import (
        select_valid_trajectory,
    )

    T = 6
    good = np.column_stack([np.arange(T) * 0.5, np.arange(T), np.ones(T)])
    bad = good.copy()
    bad[:, 0] = [0.0, 0.4, 0.3, 0.9, 1.2, 1.5]  # non-monotone time
    # candidate 0 bad, candidate 2 good → picks 2 verbatim (t0 zeroed)
    out = np.asarray(select_valid_trajectory(jnp.stack([bad, bad, good, good])))
    expect = good.copy()
    expect[0, 0] = 0.0
    assert np.allclose(out, expect)

    # all bad → candidate 0, time repaired to strictly increasing
    out = np.asarray(select_valid_trajectory(jnp.stack([bad, bad])))
    assert np.all(np.diff(out[:, 0]) > 0)
    assert np.allclose(out[:, 1:], bad[:, 1:])

    # a valid single candidate passes through untouched
    out = np.asarray(select_valid_trajectory(good[None]))
    assert np.allclose(out, expect)

    # t0-zeroing is load-bearing: a candidate valid ONLY after its first
    # timestamp is zeroed (t = [0.5, 0.6, ...] with t1 > 0) must be
    # accepted and returned with t0 = 0, and a nonzero-t0 winner must not
    # leak its raw t0 through
    shifted = good.copy()
    shifted[:, 0] = 0.5 + np.arange(T) * 0.5
    out = np.asarray(select_valid_trajectory(jnp.stack([bad, shifted])))
    assert out[0, 0] == 0.0
    assert np.all(np.diff(out[:, 0]) > 0)
    assert np.allclose(out[:, 1:], shifted[:, 1:])


@pytest.mark.slow
def test_serve_offset_mode():
    """offset_mode=False must skip the start shift (legacy non-offset
    checkpoints decode absolute coordinates).  At start=(0,0) the shift is
    a no-op so both modes agree bit-for-bit; at a nonzero start they must
    diverge."""
    from defensive_model_vae_tpu.control.device_reference import make_serve_fn
    from defensive_model_vae_tpu.models import CVAEConfig, init_params

    cfg = CVAEConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)
    mpc = MPCConfig(prediction_horizon=8, control_horizon=5, dt=0.1)
    serve_on = make_serve_fn(params, cfg, mpc, num_steps=12, offset_mode=True)
    serve_off = make_serve_fn(params, cfg, mpc, num_steps=12, offset_mode=False)

    key = jax.random.PRNGKey(3)
    init = jnp.asarray([[0.0, 0.0, 1.57, 0.0, 5.0]], jnp.float32)
    zero = jnp.zeros((1, 2), jnp.float32)
    s_on, _ = serve_on(key, zero, init)
    s_off, _ = serve_off(key, zero, init)
    assert np.array_equal(np.asarray(s_on), np.asarray(s_off))

    start = jnp.asarray([[-190.0, 40.0]], jnp.float32)
    init2 = jnp.asarray([[-190.0, 40.0, 1.57, 0.0, 5.0]], jnp.float32)
    s_on2, _ = serve_on(key, start, init2)
    s_off2, _ = serve_off(key, start, init2)
    assert not np.array_equal(np.asarray(s_on2), np.asarray(s_off2))
    assert np.isfinite(np.asarray(s_on2)).all()
    assert np.isfinite(np.asarray(s_off2)).all()


def test_tracker_vs_slsqp_oracle_on_hard_paths(all_windows):
    """sce2/sce3/sce4 oracle traces (reference SLSQP run live on identical
    waypoints, fixtures/oracle/).

    The oracle traces come from the IN-TREE reference code, whose 90° jump
    guard uses raw-heading semantics (PathReference.raw_jump_guard
    docstring) — on the westbound sce2 path, tracking with
    raw_jump_guard=True reproduces the live SLSQP trace to <7 cm over the
    whole run, direct behavioral parity.  On sce3/sce4 (southbound, guard
    semantics identical) the SLSQP oracle tracks its reference loosely
    (failed solves on sce4) and our solver strictly dominates it on both
    velocity- and position-error against the SAME reference tensor."""
    import json
    from conftest import FIXTURES

    meta = json.load(open(FIXTURES / "oracle/multi_scenario_starts.json"))
    for key in ("sce2", "sce3", "sce4"):
        m = meta[key]
        w = all_windows[key]
        wp = w[m["idx"]][:, [1, 2, 0]].astype(float)
        wp[0, 2] = 0.0
        init = np.array([wp[0, 0], wp[0, 1], m["angle"], m["vx"], m["vy"]])
        raw = key == "sce2"  # mirror the in-tree guard on the affected path
        cfg = MPCConfig(
            prediction_horizon=30, control_horizon=20, dt=m["dt"],
            raw_jump_guard=raw,
        )
        times, states, _ = track(wp, init, cfg)
        ref_states = np.load(FIXTURES / f"oracle/ref_track_{key}w{m['idx']}.npy")
        pr = PathReference(wp, init, raw_jump_guard=raw)
        n = min(len(states), len(ref_states))
        refs = pr.build(n, 30, m["dt"])
        mine_pos = pr.position_error(times[:n], states[:n, :2]).mean()
        orac_pos = pr.position_error(times[:n], ref_states[:n, :2]).mean()
        trace_diff = np.hypot(
            *(states[:n, :2] - ref_states[:n, :2]).T
        ).max()
        if key == "sce2":
            assert trace_diff < 0.1, (key, trace_diff)  # measured 0.065 m
            assert mine_pos <= orac_pos + 1e-6, (key, mine_pos, orac_pos)
        else:
            mine_v = np.abs(states[: n - 1, 3] - refs[: n - 1, 0, 1]).mean()
            orac_v = np.abs(ref_states[: n - 1, 3] - refs[: n - 1, 0, 1]).mean()
            assert mine_v <= orac_v + 1e-6, (key, mine_v, orac_v)
            assert mine_pos <= orac_pos + 1e-6, (key, mine_pos, orac_pos)
            assert mine_pos < 0.3  # and good in absolute terms


def test_mpc_config_validates_horizons():
    """The reference MPCController raises at construction when the control
    horizon exceeds the prediction horizon (MPC_Tracking.py:300-301); the
    config must do the same instead of dying in a negative-tile trace."""
    with pytest.raises(ValueError):
        MPCConfig(prediction_horizon=10, control_horizon=20)
    MPCConfig(prediction_horizon=10, control_horizon=10)  # boundary ok


def test_linear_mpc_yaw_seam():
    """A reference whose arctan2 yaw column crosses the ±π seam must not
    produce a ~2π phantom yaw error: the cost wraps the yaw difference, so
    tracking through the seam is as tight as on the SAME circle rotated to
    avoid it (before the wrap fix the seam case diverged meters off)."""
    from defensive_model_vae_tpu.control.linear_mpc import (
        LinearMPCConfig, simulate_tracking,
    )

    cfg = LinearMPCConfig()

    def run(rot):
        R, v, n = 60.0, 3.0, 700
        ang = np.linspace(-np.pi / 2, np.pi, n) + rot
        x, y = R * np.cos(ang), R * np.sin(ang)
        yaw = np.arctan2(np.gradient(y), np.gradient(x))
        ref = np.column_stack([x, y, np.full(n, v), yaw]).astype(np.float32)
        x0 = np.array([x[0], y[0], v, yaw[0]], np.float32)
        states, _ = simulate_tracking(cfg, ref, x0, 350)
        err = np.array([np.hypot(x - p[0], y - p[1]).min() for p in states])
        seam_crossed = np.abs(np.diff(yaw)).max() > np.pi
        return err.max(), seam_crossed

    e_seam, crossed = run(0.0)
    e_clean, crossed_clean = run(-np.pi / 2)
    assert crossed and not crossed_clean  # the geometries differ as intended
    assert e_seam < 0.5, e_seam
    assert abs(e_seam - e_clean) < 0.05, (e_seam, e_clean)
