"""Data-layer tests: window extraction parity vs the shipped datasets."""

import numpy as np
import pytest

from defensive_model_vae_tpu import scenarios
from defensive_model_vae_tpu.data import (
    build_dataset,
    generate_random_trajectories,
    get_human_and_bv_trajectories,
    get_start_conditions,
    trim_human_trajectory,
)

from conftest import REFERENCE_ROOT, requires_reference


@requires_reference
@pytest.mark.parametrize("key,n_ref", [("sce1", 38), ("sce2", 16), ("sce3", 66)])
def test_window_extraction_exact_parity(key, n_ref):
    """ROW-FOR-ROW, BYTE-EXACT reproduction of the shipped npy: the dataset
    __main__'s action order (Traj_Data_Process.py:162, scenarios.
    DATASET_ACTIONS) with sorted per-folder files IS the enumeration the
    artifacts were generated with."""
    mine = build_dataset(str(REFERENCE_ROOT / "DefensiveData"), key)
    ref = np.load(
        REFERENCE_ROOT / "training/DefensiveDataProcessed" / f"trajectory_{key}_cond.npy"
    ).astype(np.float32)
    assert mine.shape == (n_ref, 10, 3)
    assert np.array_equal(mine, ref)


@requires_reference
def test_window_extraction_sce4_subset():
    # The shipped sce4 npy holds 135 windows but its row 44 cannot be
    # reproduced from any shipped CSV under either subsampling mode (stale
    # entry predating the current CSVs).  Our extraction must produce the
    # other 134 windows row-for-row byte-exactly.
    mine = build_dataset(str(REFERENCE_ROOT / "DefensiveData"), "sce4")
    ref = np.load(
        REFERENCE_ROOT / "training/DefensiveDataProcessed/trajectory_sce4_cond.npy"
    ).astype(np.float32)
    assert mine.shape == (134, 10, 3)
    assert np.array_equal(mine, np.delete(ref, 44, axis=0))
    assert not any(np.array_equal(ref[44], r) for r in mine)


def test_windows_shape_and_time_monotone(all_windows):
    for key, arr in all_windows.items():
        assert arr.ndim == 3 and arr.shape[1:] == (10, 3)
        t = arr[:, :, 0]
        assert np.all(t[:, 0] == 0.0)
        assert np.all(np.diff(t, axis=1) > 0)


@requires_reference
def test_start_conditions_first_matching_row():
    """sce3's generation mask equals its dataset mask, so start conditions
    coincide with the first window point (sce1's generation mask is the
    y>=40 variant — covered by the artifact-parity test below)."""
    sce = scenarios.get("sce3")
    import glob

    csvs = sorted(
        glob.glob(
            str(REFERENCE_ROOT / "DefensiveData/PredictableMovementTown05/减速/*.csv")
        )
    )
    sc = get_start_conditions(csvs[0], sce)
    # must equal the first row of the extracted window for the same file
    from defensive_model_vae_tpu.data import process_csv

    w = process_csv(csvs[0], sce, target_points=10, time_interval=sce.dt)
    assert np.isclose(sc.x, w[0, 1]) and np.isclose(sc.y, w[0, 2])
    assert np.isfinite(sc.angle) and np.isfinite(sc.vx) and np.isfinite(sc.vy)


@requires_reference
def test_sce1_start_conditions_match_published_artifacts():
    """The sce1 GENERATION start mask is ``ego_y >= 40`` (Plot_Gif.py:82),
    not Tools.py:85's ``ego_y >= 18`` — proven by the shipped artifacts:
    37/38 ``results/GeneratedData/*sce1*.npy`` traces start exactly at the
    first ego_y>=40 row of their source CSV (the 38th, exp1_3, is a broken
    runaway trace).  Pin our start conditions to those initial states."""
    import glob
    import math
    import os

    sce = scenarios.get("sce1")
    csvs = sorted(
        glob.glob(str(REFERENCE_ROOT / "DefensiveData/StaticBlindTown05/*/*.csv"))
    )
    shipped = {
        os.path.basename(f): np.load(f)[0]
        for f in glob.glob(str(REFERENCE_ROOT / "results/GeneratedData/*sce1*.npy"))
    }
    n_exact = 0
    for c in csvs:
        parts = os.path.basename(c).split("_")
        name = f"tracked_trajectory_sce1_exp{parts[1]}_{parts[-1].split('.')[0]}.npy"
        if name not in shipped:
            continue
        st = shipped[name]
        sc = get_start_conditions(c, sce)
        v = math.hypot(sc.vx, sc.vy)
        if (
            abs(sc.x - st[0]) < 1e-3
            and abs(sc.y - st[1]) < 1e-3
            and abs(sc.angle - st[2]) < 1e-3
            and abs(v - st[3]) < 1e-3
        ):
            n_exact += 1
    assert n_exact == 37  # all but the known-broken exp1_3 trace


def test_start_conditions_fallback(tmp_path):
    # unreadable file → documented per-scenario fallback
    sc = get_start_conditions(str(tmp_path / "missing.csv"), "sce2")
    assert (sc.x, sc.y) == (-155.0, -5.0)
    assert np.isclose(sc.angle, -np.pi / 2)


@requires_reference
def test_human_and_bv_extraction():
    import glob

    sce = scenarios.get("sce4")
    csvs = sorted(
        glob.glob(
            str(REFERENCE_ROOT / "DefensiveData/UnpredictableMovementTown04/减速/*.csv")
        )
    )
    human, bv1, bv2 = get_human_and_bv_trajectories(csvs[0], sce)
    assert human is not None and bv1 is not None and bv2 is None  # sce4: 1 bv
    assert human.shape[1] == 3
    # time column is arange * dt
    assert np.allclose(np.diff(human[:, 2]), sce.dt)
    trimmed = trim_human_trajectory(human, sce)
    assert trimmed.shape[1] == 3 and len(trimmed) <= len(human)


def test_random_trajectories_straight():
    # zero angular deviation → straight unit-step line along +x
    t = generate_random_trajectories(5, 50, max_angle_deviation=0.0, seed=0)
    assert t.shape == (5, 50, 2)
    assert np.allclose(t[:, :, 0], np.arange(50))
    assert np.allclose(t[:, :, 1], 0.0)


def test_random_trajectories_step_length():
    t = generate_random_trajectories(3, 40, max_angle_deviation=5.0, seed=1)
    steps = np.linalg.norm(np.diff(t, axis=1), axis=-1)
    assert np.allclose(steps, 1.0)


def test_scenario_registry_lookup():
    assert scenarios.get("sce3").town == "PredictableMovementTown05"
    assert scenarios.get("UnpredictableMovementTown04").key == "sce4"
    assert scenarios.get("vae_offset_sce2_cond_ld8_epoch3000.pth").key == "sce2"
    with pytest.raises(KeyError):
        scenarios.get("nonsense")


@requires_reference
def test_extraction_differential_vs_live_reference():
    """Human/background-vehicle extraction and start conditions must match
    the reference Tools functions run live on the same CSVs."""
    import glob
    import sys

    sys.path.insert(0, str(REFERENCE_ROOT))
    try:
        import Tools as RT
    finally:
        sys.path.pop(0)

    cases = []
    for town, key in [("StaticBlindTown05", "sce1"), ("DynamicBlindTown05", "sce2"),
                      ("PredictableMovementTown05", "sce3"),
                      ("UnpredictableMovementTown04", "sce4")]:
        csv = sorted(glob.glob(str(REFERENCE_ROOT / "DefensiveData" / town / "减速/*.csv")))[0]
        cases.append((csv, key, f"vae_offset_{key}_cond"))

    for csv, key, model_name in cases:
        rh, rb1, rb2 = RT.get_human_and_bv_trajectories(csv, model_name)
        mh, mb1, mb2 = get_human_and_bv_trajectories(csv, key)
        assert np.allclose(rh, mh)
        assert np.allclose(rb1, mb1)
        assert (rb2 is None) == (mb2 is None)
        if rb2 is not None:
            assert np.allclose(rb2, mb2)
        sc_ref = RT.get_start_conditions_from_csv(csv, model_name)
        sc = get_start_conditions(csv, key)
        if key == "sce1":
            # deliberate deviation: our sce1 generation mask is the
            # Plot_Gif.py:82 ``ego_y >= 40`` variant, which the published
            # artifacts prove is the one that produced them (see
            # test_sce1_start_conditions_match_published_artifacts);
            # Tools.py:85 returns the y>=18 training-extraction row instead
            assert sc_ref[1] < 20 < 40 <= sc.y
        else:
            assert np.allclose(sc_ref, [sc.x, sc.y, sc.angle, sc.vx, sc.vy])


@requires_reference
def test_extend_mid_differential_vs_live_reference():
    """The ceil-midpoint subsampling (``point_mode='extend_mid'``,
    reference ``Traj_Data_Process.py:109-114``) must match the reference's
    ``process_csv`` run LIVE on a real CSV of every scenario — the sce4
    checkpoint's training corpus is the extend_mid build, so this window
    math is now load-bearing."""
    import glob
    import sys

    sys.path.insert(0, str(REFERENCE_ROOT))
    try:
        import Traj_Data_Process as RTP
    finally:
        sys.path.pop(0)
    from defensive_model_vae_tpu.data import process_csv

    for town, key in [
        ("StaticBlindTown05", "sce1"), ("DynamicBlindTown05", "sce2"),
        ("PredictableMovementTown05", "sce3"),
        ("UnpredictableMovementTown04", "sce4"),
    ]:
        sce = scenarios.get(key)
        csv = sorted(
            glob.glob(str(REFERENCE_ROOT / "DefensiveData" / town / "减速/*.csv"))
        )[0]
        for mode in ("normal", "extend_mid"):
            ref = RTP.process_csv(
                csv, town, "减速", target_points=10, point_mode=mode,
                time_interval=sce.dt,
            )
            mine = process_csv(
                csv, key, target_points=10, point_mode=mode,
                time_interval=sce.dt,
            )
            assert (ref is None) == (mine is None)
            if ref is not None:
                # f32 cast = the corpus dtype (same standard as the
                # shipped-npy parity tests); raw f64 differs at ~1e-14
                # from CSV-parse/stacking path differences
                assert np.array_equal(
                    np.asarray(mine, np.float32), np.asarray(ref, np.float32)
                )


@requires_reference
def test_extend_mid_dataset_appends_midpoint_windows():
    """``build_dataset(point_mode='extend_mid')`` = the normal corpus with
    the ceil-midpoint variant of every window appended (the reference
    __main__'s extend flow, ``Traj_Data_Process.py:170-176``).  Midpoint
    siblings share endpoints and the time column with their normal window
    (the subsample index formula preserves ``indices[0]``/``indices[-1]``).
    The shipped ``trajectory_sce3_extend1.npy`` is NOT an oracle for this:
    it is a legacy (150, 6, 2) xy-only artifact from the pre-n=66 corpus
    era (75 trajectories, 6 target points)."""
    norm = build_dataset(str(REFERENCE_ROOT / "DefensiveData"), "sce2")
    ext = build_dataset(
        str(REFERENCE_ROOT / "DefensiveData"), "sce2", point_mode="extend_mid"
    )
    n = len(norm)
    assert ext.shape == (2 * n, 10, 3)
    assert np.array_equal(ext[:n], norm)
    mid = ext[n:]
    assert np.array_equal(mid[:, :, 0], norm[:, :, 0])  # same time columns
    assert np.array_equal(mid[:, 0, 1:], norm[:, 0, 1:])  # same start xy
    assert np.array_equal(mid[:, -1, 1:], norm[:, -1, 1:])  # same end xy
    # interior points differ for at least some windows (the midpoint shift)
    assert not np.array_equal(mid[:, 1:-1, 1:], norm[:, 1:-1, 1:])


@requires_reference
def test_sce1_artifact_dataset_variant():
    """The 'artifact' extraction variant (ego_y>=40, the predicate the
    published results were trained with — see scenarios.py) yields the same
    38-window corpus shape as the shipped variant but starting at the
    metric-grid origin, matching the human corridor from y=40."""
    from defensive_model_vae_tpu.data import build_dataset

    w = build_dataset(
        str(REFERENCE_ROOT / "DefensiveData"), "sce1", 10,
        dataset_variant="artifact",
    )
    assert w.shape == (38, 10, 3)
    assert np.all(w[:, 0, 2] >= 40)  # start y
    assert abs(float(w[:, 0, 2].mean()) - 40.2) < 0.3
    # shipped variant unchanged (still reproduces the shipped npy)
    w0 = build_dataset(str(REFERENCE_ROOT / "DefensiveData"), "sce1", 10)
    assert w0.shape == (38, 10, 3)
    assert np.all(w0[:, 0, 2] < 20)


@requires_reference
def test_trial_suffixes_align_with_corpus_variants():
    """window_trial_suffixes must stay row-aligned with build_dataset for
    EVERY corpus variant: the sce4 checkpoint's extend_mid recipe doubles
    the corpus (normal windows then midpoint windows), and the sce1
    artifact variant changes which files yield windows — the old
    hardcoded-default walker raised IndexError / silently mispaired."""
    from defensive_model_vae_tpu.data.features import window_trial_suffixes

    root = str(REFERENCE_ROOT / "DefensiveData")

    w = build_dataset(root, "sce4", point_mode="extend_mid")
    s = window_trial_suffixes(root, "sce4", point_mode="extend_mid")
    assert len(s) == len(w)
    half = len(s) // 2
    assert s[:half] == s[half:]  # appended corpus repeats the enumeration

    w1 = build_dataset(root, "sce1", dataset_variant="artifact")
    s1 = window_trial_suffixes(root, "sce1", dataset_variant="artifact")
    assert len(s1) == len(w1)

    # default time resolution: omitting time_interval uses the scenario dt
    from defensive_model_vae_tpu.data import process_csv as _pc

    csvs = sorted(
        (REFERENCE_ROOT / "DefensiveData" / "StaticBlindTown05").rglob("exp_*.csv")
    )
    got = _pc(str(csvs[0]), "sce1")
    want = _pc(str(csvs[0]), "sce1", time_interval=0.02)
    np.testing.assert_array_equal(got, want)


def test_window_thw_requires_registered_distance():
    """An unregistered THW distance fails loudly instead of silently
    inventing one (the old 60 m fallback hid missing registration)."""
    import pytest

    from defensive_model_vae_tpu import scenarios
    from defensive_model_vae_tpu.data.features import window_thw

    win = np.array([[0.0, 0.0, 0.0], [1.0, 5.0, 0.0]], np.float32)
    # sce2 has NO registered distance on purpose (the reference's Get_THW
    # has no sce2 branch, and `defvae thw` must keep skipping it): the
    # conditioned-corpus path supplies the cross-scenario default
    with pytest.raises(ValueError, match="THW distance"):
        window_thw(win, scenarios.get("sce2"))
    assert window_thw(win, scenarios.get("sce2"),
                      default_distance=60.0) == 60.0 / 5.0
    # registered scenarios ignore the default
    assert window_thw(win, scenarios.get("sce1"),
                      default_distance=1.0) == 60.0 / 5.0


@requires_reference
def test_align_model_trajectory_differential_vs_live_reference():
    """align_model_trajectory must match Tools.process_model_trajectory
    (Tools.py:219-256) row-for-row on the truncate, exact, extend, and
    no-match branches — it is the exported C8 equivalent and previously
    had no behavioral validation."""
    import sys

    sys.path.insert(0, str(REFERENCE_ROOT))
    try:
        import Tools as RT
    finally:
        sys.path.pop(0)

    from defensive_model_vae_tpu.data import align_model_trajectory

    rng = np.random.default_rng(0)
    human = np.column_stack([
        rng.normal(-190.0, 2.0, 20),
        rng.normal(45.0, 5.0, 20),
        np.cumsum(rng.uniform(0.01, 0.05, 20)),
    ])
    start_x, start_y = human[5, 0], human[5, 1]
    for n_model in (8, 15, 40):  # truncate / exact / extend-with-dt
        states = rng.normal(0.0, 1.0, (n_model, 4))
        ours = align_model_trajectory(human, start_x, start_y, states, 0.02)
        ref = RT.process_model_trajectory(human, start_x, start_y, states, 0.02)
        np.testing.assert_array_equal(ours, ref)
    # no matching human row → None (reference prints a warning, returns None)
    states = rng.normal(0.0, 1.0, (8, 4))
    assert align_model_trajectory(human, 999.0, 999.0, states, 0.02) is None
    assert RT.process_model_trajectory(human, 999.0, 999.0, states, 0.02) is None


@requires_reference
def test_legacy_processed_datasets_dispositioned():
    """SURVEY C3's legacy dataset variants, dispositioned (PARITY C3):
    every npy in DefensiveDataProcessed is either reproduced by this
    pipeline (the four _cond corpora — byte-exact tests above), the
    random-walk demo set (regenerated by ``generate_random_trajectories``,
    tested above), or a dead/legacy artifact with NO live consumer in the
    reference tree:

    - ``trajectory_<sce>.npy`` (non-cond, pre-"modified start/end
      conditions" per the shipped Documentation.txt): their only textual
      reference in reference code is ``Distribution.py:403``'s
      ``human_trajectory_path`` — ASSIGNED and never read (the active
      pipeline extracts humans from CSVs at ``:488``, which this repo
      mirrors and which reproduces the published JS exactly).  sce3's
      (75, 12, 3) variant is the legacy corpus behind the stale n=75 JS
      line (PARITY published-cell table, JS_divergence.txt:23).
    - ``trajectory_sce3_extend1.npy`` (150, 6, 2): referenced by nothing
      in the reference tree — an orphan of an earlier extraction config
      (only a *save*-path for a never-shipped sce2_extend1 appears, in
      ``Traj_Data_Process.py:172``).
    """
    root = REFERENCE_ROOT / "training" / "DefensiveDataProcessed"
    names = sorted(p.name for p in root.glob("*.npy"))
    assert names == [
        "random_trajectory.npy",
        "trajectory_sce1.npy", "trajectory_sce1_cond.npy",
        "trajectory_sce2.npy", "trajectory_sce2_cond.npy",
        "trajectory_sce3.npy", "trajectory_sce3_cond.npy",
        "trajectory_sce3_extend1.npy",
        "trajectory_sce4.npy", "trajectory_sce4_cond.npy",
    ]
    # the legacy shapes SURVEY C3 lists
    assert np.load(root / "trajectory_sce3.npy").shape == (75, 12, 3)
    assert np.load(root / "trajectory_sce3_extend1.npy").shape == (150, 6, 2)
    assert np.load(root / "random_trajectory.npy").shape == (100, 50, 2)
    # the non-cond corpora are NOT the _cond ones (a real fork, not copies)
    for key in ("sce1", "sce2", "sce4"):
        a = np.load(root / f"trajectory_{key}.npy")
        b = np.load(root / f"trajectory_{key}_cond.npy")
        assert not np.array_equal(a, b), key
    # consumer evidence: the one mention of the non-cond path is a dead
    # assignment, and extend1 is referenced nowhere
    dist_src = (REFERENCE_ROOT / "Distribution.py").read_text(
        encoding="utf-8", errors="ignore"
    )
    assert dist_src.count("human_trajectory_path") == 1  # assigned, unread
    for py in REFERENCE_ROOT.rglob("*.py"):
        assert "extend1" not in py.name
        src = py.read_text(encoding="utf-8", errors="ignore")
        assert "sce3_extend1" not in src, py
