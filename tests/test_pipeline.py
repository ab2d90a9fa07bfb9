"""End-to-end pipeline + CLI tests."""

import json
import os

import numpy as np
import pytest

from defensive_model_vae_tpu.models import CVAEConfig
from defensive_model_vae_tpu.pipeline import (
    generate_and_track,
    load_humans,
    run_scenario,
    save_tracked,
    validate,
)
from defensive_model_vae_tpu.train import TrainConfig, train
from defensive_model_vae_tpu.train.checkpoint import save_checkpoint
from defensive_model_vae_tpu.data import collect_csv_files

from conftest import REFERENCE_ROOT, requires_reference


@pytest.fixture(scope="module")
def sce2_checkpoint(tmp_path_factory, all_windows):
    params, hist = train(all_windows["sce2"], train_cfg=TrainConfig(epochs=2000))
    d = tmp_path_factory.mktemp("ckpt")
    save_checkpoint(str(d / "sce2"), params, CVAEConfig(), "sce2", hist)
    return str(d / "sce2")


@requires_reference
def test_full_pipeline_quality_band(sce2_checkpoint, tmp_path):
    """Train → generate → batched MPC → metrics on the real sce2 corpus.
    Distribution fidelity must land in the same band as the reference's
    published values (JS 0.112, RMSE_freq 1.69, surface RMSE 1.41/1.56 —
    results/ModelValidation/JS_divergence.txt)."""
    report = run_scenario(
        sce2_checkpoint,
        "sce2",
        str(REFERENCE_ROOT / "DefensiveData"),
        str(tmp_path / "out"),
        seed=1,
    )
    assert report["n_tracked"] >= 14  # tolerate a couple of degenerate draws
    assert report["velocity_js_divergence"] < 0.30
    assert report["rmse_frequency_trajcount"] < 4.0
    assert report["surface_rmse_with_zeros"] < 3.5
    # artifacts written
    assert os.path.exists(tmp_path / "out" / "validation_sce2.json")
    traces = os.listdir(tmp_path / "out" / "GeneratedData")
    assert all(t.startswith("tracked_trajectory_sce2_exp") for t in traces)


@requires_reference
def test_generate_and_track_shapes(sce2_checkpoint):
    from defensive_model_vae_tpu.train.checkpoint import load_checkpoint

    params, cfg, _ = load_checkpoint(sce2_checkpoint)
    csvs = collect_csv_files(str(REFERENCE_ROOT / "DefensiveData/DynamicBlindTown05"))[:4]
    traces, names = generate_and_track(params, cfg, "sce2", csvs, seed=3)
    assert len(traces) >= 3
    for t in traces:
        assert t.ndim == 2 and t.shape[1] == 4
        assert np.all(np.isfinite(t))
    assert all(n.startswith("tracked_trajectory_sce2_exp") for n in names)


@requires_reference
def test_generate_and_track_multi_matches_per_seed(sce2_checkpoint):
    """The stacked multi-seed tracking program returns per-seed traces
    ulp-equivalent to individual :func:`generate_and_track` calls: the
    per-seed z-draw streams are byte-identical (``_draw_valid_samples`` is
    shared), rows are independent under ``vmap``, and the global
    scan-length bucket only appends steps past each path's own end (the
    per-row ``steps`` slice drops them) — but the batch-dim bucket changes
    the executable's batch width, so XLA codegen may differ in the last
    ulp (measured max |Δ| ≈ 1.2e-6 over full 390-step runs, CPU).  Step
    counts and names must be EXACT; values are asserted to ulp-level
    tolerance.  Band/sweep artifacts regenerated under the batched path
    re-baseline on it."""
    from defensive_model_vae_tpu.pipeline import generate_and_track_multi
    from defensive_model_vae_tpu.train.checkpoint import load_checkpoint

    params, cfg, _ = load_checkpoint(sce2_checkpoint)
    csvs = collect_csv_files(
        str(REFERENCE_ROOT / "DefensiveData/DynamicBlindTown05")
    )[:4]
    seeds = [3, 4, 11]
    multi = generate_and_track_multi(params, cfg, "sce2", csvs, seeds)
    assert sorted(multi) == sorted(seeds)
    for s in seeds:
        traces, names = generate_and_track(params, cfg, "sce2", csvs, seed=s)
        m_traces, m_names = multi[s]
        assert m_names == names
        assert len(m_traces) == len(traces)
        for a, b in zip(m_traces, traces):
            assert a.shape == b.shape  # exact step-count parity
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4)


def test_cli_dataset_train_generate(tmp_path, all_windows):
    from defensive_model_vae_tpu.cli import main

    w = tmp_path / "w.npy"
    np.save(w, all_windows["sce2"])
    main(
        [
            "train", "--scenario", "sce2", "--windows", str(w),
            "--ckpt", str(tmp_path / "ckpt"), "--epochs", "50",
        ]
    )
    main(
        [
            "generate", "--ckpt", str(tmp_path / "ckpt"),
            "--start-x", "-150.0", "--start-y", "-0.7", "-n", "3",
            "--out", str(tmp_path / "gen.npy"),
        ]
    )
    gen = np.load(tmp_path / "gen.npy")
    assert gen.shape == (1, 3, 10, 3)


def test_cli_train_kld_weight(tmp_path, all_windows):
    """--kld reaches the loss (different weight → different final loss) and
    the manifest records the full training recipe — the sce4 checkpoint's
    kld-0.2 extend_mid recipe must be retrainable from the CLI alone."""
    import json

    from defensive_model_vae_tpu.cli import main

    w = tmp_path / "w.npy"
    np.save(w, all_windows["sce2"])
    finals = {}
    for kld in ("0.1", "0.4"):
        ck = tmp_path / f"ckpt_{kld}"
        main([
            "train", "--scenario", "sce2", "--windows", str(w),
            "--ckpt", str(ck), "--epochs", "50", "--kld", kld,
        ])
        hist = np.load(ck / "history.npz")
        finals[kld] = float(hist["total"][-1])
        with open(ck / "manifest.json") as f:
            recipe = json.load(f)["recipe"]
        assert recipe["kld_weight"] == float(kld)
        assert recipe["epochs"] == 50 and recipe["trainer"] == "scan"
    assert finals["0.1"] != finals["0.4"]


def test_cli_train_dtype(tmp_path, all_windows):
    """--dtype bfloat16 reaches the trainer (mixed-precision run differs
    from f32 but still converges), lands in the manifest recipe, and is
    rejected for the f32-only fused kernel."""
    import json

    import pytest

    from defensive_model_vae_tpu.cli import main

    w = tmp_path / "w.npy"
    np.save(w, all_windows["sce2"])
    ck = tmp_path / "ckpt_bf16"
    main([
        "train", "--scenario", "sce2", "--windows", str(w),
        "--ckpt", str(ck), "--epochs", "50", "--dtype", "bfloat16",
    ])
    hist = np.load(ck / "history.npz")
    assert np.isfinite(hist["total"][-1])
    with open(ck / "manifest.json") as f:
        recipe = json.load(f)["recipe"]
    assert recipe["compute_dtype"] == "bfloat16"

    ck32 = tmp_path / "ckpt_f32"
    main([
        "train", "--scenario", "sce2", "--windows", str(w),
        "--ckpt", str(ck32), "--epochs", "50",
    ])
    with open(ck32 / "manifest.json") as f:
        assert "compute_dtype" not in json.load(f)["recipe"]
    hist32 = np.load(ck32 / "history.npz")
    assert hist["total"][-1] != hist32["total"][-1]  # bf16 actually took effect

    with pytest.raises(SystemExit, match="fused"):
        main([
            "train", "--scenario", "sce2", "--windows", str(w),
            "--ckpt", str(tmp_path / "x"), "--epochs", "10",
            "--fused", "--dtype", "bfloat16",
        ])


def test_cli_train_fused_scale_wiring(tmp_path, all_windows, monkeypatch):
    """--fused-scale routes to ops.fused_train_scale with --tile/--dtype
    threaded through and the manifest naming the trainer (the compiled
    kernel itself is TPU-only — tests/test_fused_scale.py covers it in
    interpret mode; this pins the CLI wiring)."""
    import json

    import pytest

    import defensive_model_vae_tpu.ops as ops
    from defensive_model_vae_tpu.cli import main

    w = tmp_path / "w.npy"
    np.save(w, all_windows["sce2"])
    seen = {}

    def fake_scale(windows, epochs, lr, weights, seed, tile, compute_dtype,
                   backward=None, noise="hbm", noise_impl="rbg"):
        seen.update(tile=tile, compute_dtype=compute_dtype, epochs=epochs,
                    backward=backward, noise=noise)
        from defensive_model_vae_tpu.models import CVAEConfig, init_params
        import jax
        cfg = CVAEConfig(seq_len=windows.shape[1], dim=windows.shape[2])
        hist = {k: np.ones(epochs) for k in
                ("total", "recon", "kld", "start", "time")}
        return init_params(jax.random.PRNGKey(seed), cfg), hist

    monkeypatch.setattr(ops, "fused_train_scale", fake_scale)
    ck = tmp_path / "ckpt_scale"
    main([
        "train", "--scenario", "sce2", "--windows", str(w),
        "--ckpt", str(ck), "--epochs", "10", "--fused-scale",
        "--tile", "1024", "--dtype", "bfloat16", "--backward", "manual",
        "--noise", "prng",
    ])
    assert seen == {"tile": 1024, "compute_dtype": "bfloat16", "epochs": 10,
                    "backward": "manual", "noise": "prng"}
    with open(ck / "manifest.json") as f:
        recipe = json.load(f)["recipe"]
    assert recipe["trainer"] == "fused-scale"
    assert recipe["backward"] == "manual"
    assert recipe["noise"] == "prng"

    with pytest.raises(SystemExit, match="mutually exclusive"):
        main([
            "train", "--scenario", "sce2", "--windows", str(w),
            "--ckpt", str(tmp_path / "x"), "--epochs", "10",
            "--fused", "--fused-scale",
        ])

    # --fused-scale --mesh routes to the data-parallel tier (the compiled
    # shard_map program is TPU-only — test_fused_scale.py covers it in
    # interpret mode; this pins the CLI routing + manifest naming)
    seen_dp = {}

    def fake_scale_dp(windows, mesh, epochs, lr, weights, seed, tile,
                      compute_dtype, backward=None, noise="hbm",
                      noise_impl="rbg"):
        seen_dp.update(tile=tile, compute_dtype=compute_dtype,
                       epochs=epochs, dp=mesh.shape["data"],
                       backward=backward, noise=noise,
                       noise_impl=noise_impl)
        return fake_scale(windows, epochs, lr, weights, seed, tile,
                          compute_dtype)

    monkeypatch.setattr(ops, "fused_train_scale_dp", fake_scale_dp)
    ck_dp = tmp_path / "ckpt_scale_dp"
    main([
        "train", "--scenario", "sce2", "--windows", str(w),
        "--ckpt", str(ck_dp), "--epochs", "10",
        "--fused-scale", "--mesh", "--tile", "512",
    ])
    assert seen_dp == {
        "tile": 512, "compute_dtype": None, "epochs": 10, "dp": 8,
        "backward": None, "noise": "hbm", "noise_impl": "rbg",
    }
    with open(ck_dp / "manifest.json") as f:
        assert json.load(f)["recipe"]["trainer"] == "fused-scale-dp"

    # the VMEM-resident --fused kernel stays single-chip
    with pytest.raises(SystemExit, match="single-chip"):
        main([
            "train", "--scenario", "sce2", "--windows", str(w),
            "--ckpt", str(tmp_path / "x"), "--epochs", "10",
            "--fused", "--mesh",
        ])
    # --backward is a --fused-scale option
    with pytest.raises(SystemExit, match="fused-scale only"):
        main([
            "train", "--scenario", "sce2", "--windows", str(w),
            "--ckpt", str(tmp_path / "x"), "--epochs", "10",
            "--backward", "manual",
        ])


def test_reg157():
    """Both branches of the fixed TTC trigger (the reference's own condition
    is inverted — see the preserved-quirk note in driver_models.py)."""
    from defensive_model_vae_tpu.sut.driver_models import reg157_brake

    # closing fast from far: ttc 100/15 ≈ 6.7 s > threshold 1.6 s → safe
    assert reg157_brake(0.0, 20.0, 100.0, 5.0) is None
    # closing from near: ttc 1/15 ≈ 0.07 s ≤ threshold → emergency brake
    assert reg157_brake(0.0, 20.0, 1.0, 5.0) == -6.0
    # EXACTLY at the threshold → brake (trigger is <=; these float64
    # values make ttc == threshold bit-exactly: threshold = 8/8 + 0.25 =
    # 1.25, ttc = 10/8 = 1.25)
    assert reg157_brake(
        0.0, 8.0, 10.0, 0.0, max_decel=4.0, reaction_margin=0.25
    ) == -4.0
    assert reg157_brake(0.0, 5.0, 50.0, 5.0) is None  # no closing speed
    assert reg157_brake(0.0, 5.0, 50.0, 9.0) is None  # opening gap


def test_validate_tolerates_empty_inputs():
    import math

    from defensive_model_vae_tpu.pipeline import validate

    rep = validate([], [], "sce2")
    assert rep["n_tracked"] == 0 and rep["n_human"] == 0
    assert math.isnan(rep["velocity_js_divergence"])
    assert math.isnan(rep["plane_centroid_rmse"])


def test_provenance_block():
    from defensive_model_vae_tpu.pipeline import provenance

    p = provenance("sce4", seed=3, n_csvs=135)
    assert p["scenario"] == "sce4" and p["seed"] == 3 and p["n_csvs"] == 135
    assert p["tracker"]["prediction_horizon"] == 30
    assert p["tracker"]["dt"] == 0.02
    assert any("134" in n for n in p["notes"])  # sce4 stale-window note
    # metric caveats ride in every artifact so the JSONs are self-contained
    assert any("plane_centroid_rmse" in n for n in p["notes"])
    assert p["git_sha"] is None or len(p["git_sha"]) == 40


def test_reproduce_scoreboard_wiring(tmp_path, monkeypatch):
    """`defvae reproduce` plumbing: seeds recovered from the committed
    artifacts' provenance, one run_scenario per scenario, scoreboard JSON
    written with beats flags vs the registry's published_best."""
    import json as _json

    from defensive_model_vae_tpu import pipeline, scenarios

    # existing artifact with a recorded seed for sce2; none for sce1
    (tmp_path / "validation_sce2.json").write_text(
        _json.dumps({"provenance": {"seed": 42}})
    )

    calls = []

    def fake_run_scenario(ckpt, key, data_root, out, seed=0):
        calls.append((ckpt, key, seed))
        pb = scenarios.get(key).published_best
        return {m: v * (0.5 if key == "sce1" else 2.0) for m, v in pb.items()}

    monkeypatch.setattr(pipeline, "run_scenario", fake_run_scenario)
    out = pipeline.reproduce_scoreboard(
        "ckpts", "data", str(tmp_path), scenario_keys=["sce1", "sce2"]
    )
    assert [(c[1], c[2]) for c in calls] == [("sce1", 0), ("sce2", 42)]
    assert calls[0][0] == os.path.join("ckpts", "sce1")
    board = _json.loads((tmp_path / "scoreboard.json").read_text())
    assert all(cell["beats"] for cell in board["sce1"].values())
    assert not any(cell["beats"] for cell in board["sce2"].values())
    assert set(out) == {"sce1", "sce2"}

    # a subset rerun refreshes only its scenario, preserving the rest
    pipeline.reproduce_scoreboard(
        "ckpts", "data", str(tmp_path), scenario_keys=["sce2"],
        seeds={"sce2": 7},
    )
    board2 = _json.loads((tmp_path / "scoreboard.json").read_text())
    assert set(board2) == {"sce1", "sce2"}
    assert board2["sce1"] == board["sce1"]

    # check mode: a committed artifact matching the deterministic rerun
    # passes; one perturbed metric is caught (the monkeypatched
    # run_scenario doesn't write artifacts, so write them here)
    expected = {m: v * 2.0 for m, v in scenarios.get("sce2").published_best.items()}
    art = dict(expected, provenance={"seed": 7})
    (tmp_path / "validation_sce2.json").write_text(_json.dumps(art))
    out3 = pipeline.reproduce_scoreboard(
        "ckpts", "data", str(tmp_path), scenario_keys=["sce2"],
        seeds={"sce2": 7}, check=True,
    )
    assert out3["sce2"]["check_failures"] == {}
    m0 = next(iter(expected))
    art[m0] = expected[m0] + 0.5
    (tmp_path / "validation_sce2.json").write_text(_json.dumps(art))
    out4 = pipeline.reproduce_scoreboard(
        "ckpts", "data", str(tmp_path), scenario_keys=["sce2"],
        seeds={"sce2": 7}, check=True,
    )
    assert list(out4["sce2"]["check_failures"]) == [m0]

    # a missing baseline is a FAILURE, never a vacuous pass
    (tmp_path / "validation_sce2.json").unlink()
    out5 = pipeline.reproduce_scoreboard(
        "ckpts", "data", str(tmp_path), scenario_keys=["sce2"],
        seeds={"sce2": 7}, check=True,
    )
    assert "__artifact__" in out5["sce2"]["check_failures"]

    # a NaN regenerated metric is caught (NaN comparisons are never True)
    nan_report = {m: v * 2.0 for m, v in scenarios.get("sce2").published_best.items()}
    (tmp_path / "validation_sce2.json").write_text(
        _json.dumps(dict(nan_report, provenance={"seed": 7}))
    )
    m1 = next(iter(nan_report))

    def nan_run_scenario(ckpt, key, data_root, out, seed=0):
        return dict(nan_report, **{m1: float("nan")})

    monkeypatch.setattr(pipeline, "run_scenario", nan_run_scenario)
    out6 = pipeline.reproduce_scoreboard(
        "ckpts", "data", str(tmp_path), scenario_keys=["sce2"],
        seeds={"sce2": 7}, check=True,
    )
    assert list(out6["sce2"]["check_failures"]) == [m1]

    # a committed null (a non-finite value at commit time, stored by
    # jsonable) is still a metric: null → finite is drift and must fail …
    art7 = dict(nan_report, provenance={"seed": 7})
    art7[m1] = None
    (tmp_path / "validation_sce2.json").write_text(_json.dumps(art7))
    monkeypatch.setattr(pipeline, "run_scenario", fake_run_scenario)
    out7 = pipeline.reproduce_scoreboard(
        "ckpts", "data", str(tmp_path), scenario_keys=["sce2"],
        seeds={"sce2": 7}, check=True,
    )
    assert list(out7["sce2"]["check_failures"]) == [m1]

    # … while null → NaN is the same non-finite state, not drift
    monkeypatch.setattr(pipeline, "run_scenario", nan_run_scenario)
    out8 = pipeline.reproduce_scoreboard(
        "ckpts", "data", str(tmp_path), scenario_keys=["sce2"],
        seeds={"sce2": 7}, check=True,
    )
    assert out8["sce2"]["check_failures"] == {}


@requires_reference
@pytest.mark.slow
def test_reference_torch_checkpoint_through_our_pipeline(tmp_path):
    """Migration path: the reference's own shipped .pth weights load into
    our parameter pytree and reproduce the published JS divergence through
    OUR generation + MPC + metrics stack (0.130 vs published 0.1316 —
    the residual is z-draw realization)."""
    from defensive_model_vae_tpu import scenarios
    from defensive_model_vae_tpu.train.torch_import import (
        import_to_checkpoint,
        load_torch_checkpoint,
    )
    from defensive_model_vae_tpu.pipeline import generate_and_track, validate
    from defensive_model_vae_tpu.models import CVAEConfig

    pth = REFERENCE_ROOT / "training/models/vae_offset_sce1_cond_ld8_epoch3000.pth"
    params, cfg = load_torch_checkpoint(str(pth))
    assert cfg == CVAEConfig(seq_len=10, dim=3, latent_dim=8, hidden_dim=128, cond_dim=2)

    sce = scenarios.get("sce1")
    csvs = collect_csv_files(str(REFERENCE_ROOT / "DefensiveData" / sce.town))
    traces, _ = generate_and_track(params, cfg, sce, csvs, seed=5)
    humans = load_humans(sce, csvs)
    rep = validate(traces, humans, sce)
    assert abs(rep["velocity_js_divergence"] - 0.131582) < 0.03
    assert rep["n_tracked"] == 38

    # conversion to a native checkpoint roundtrips
    d = import_to_checkpoint(str(pth), str(tmp_path / "imported"))
    from defensive_model_vae_tpu.train.checkpoint import load_checkpoint

    p2, cfg2, manifest = load_checkpoint(d)
    assert manifest["scenario"] == "sce1"
    assert np.allclose(p2["enc_0"]["w"], params["enc_0"]["w"])


@requires_reference
def test_legacy_non_offset_checkpoint_import(tmp_path):
    """Legacy (pre-offset) reference checkpoints decode absolute [t, x, y]
    — the importer records offset_mode=False and generation skips the
    start shift."""
    from defensive_model_vae_tpu.generate import load_and_generate
    from defensive_model_vae_tpu.train.checkpoint import load_checkpoint
    from defensive_model_vae_tpu.train.torch_import import import_to_checkpoint

    ck = import_to_checkpoint(
        str(REFERENCE_ROOT / "training/models/vae_sce1_ld8_epoch2000.pth"),
        str(tmp_path / "legacy"),
    )
    _, _, manifest = load_checkpoint(ck)
    assert manifest["offset_mode"] is False
    traj = load_and_generate(ck, -194.2, 18.9, n_samples=1, seed=0)
    # absolute sce1-area coordinates, not doubled by a start shift
    assert -210 < traj[0, 1] < -180
    assert 0 < traj[0, 2] < 100


@requires_reference
def test_cli_import_and_validate(tmp_path):
    """CLI coverage: import a reference checkpoint and run validate over
    previously saved traces."""
    from defensive_model_vae_tpu.cli import main

    main([
        "import",
        "--pth", str(REFERENCE_ROOT / "training/models/vae_offset_sce2_cond_ld8_epoch3000.pth"),
        "--ckpt", str(tmp_path / "imported"),
    ])
    assert (tmp_path / "imported" / "manifest.json").exists()

    # produce a few traces, then validate them through the CLI
    from defensive_model_vae_tpu.train.checkpoint import load_checkpoint
    from defensive_model_vae_tpu.pipeline import generate_and_track, save_tracked

    params, cfg, _ = load_checkpoint(str(tmp_path / "imported"))
    csvs = collect_csv_files(str(REFERENCE_ROOT / "DefensiveData/DynamicBlindTown05"))[:4]
    traces, names = generate_and_track(params, cfg, "sce2", csvs, seed=2)
    save_tracked(traces, names, str(tmp_path / "traces"))
    main([
        "validate", "--scenario", "sce2",
        "--tracked-dir", str(tmp_path / "traces"),
        "--data-root", str(REFERENCE_ROOT / "DefensiveData"),
    ])


def test_valid_waypoint_times_accounts_for_zeroed_first_timestamp():
    """Regression: a sample with negative t0 and t1 <= 0 has strictly
    increasing raw times but becomes non-increasing once the tracker
    zeroes t0 — it must be rejected (it crashed an sce1 seed sweep)."""
    import numpy as np

    from defensive_model_vae_tpu.pipeline import _valid_waypoint_times

    good = np.array([[[0.01, 0, 0], [0.2, 1, 1], [0.4, 2, 2]]])
    neg_t0_ok = np.array([[[-0.1, 0, 0], [0.2, 1, 1], [0.4, 2, 2]]])
    neg_t0_bad = np.array([[[-0.3, 0, 0], [-0.1, 1, 1], [0.4, 2, 2]]])
    tail_bad = np.array([[[0.0, 0, 0], [0.4, 1, 1], [0.2, 2, 2]]])
    batch = np.concatenate([good, neg_t0_ok, neg_t0_bad, tail_bad])
    assert _valid_waypoint_times(batch).tolist() == [True, True, False, False]


def test_registry_published_best_and_jsonable():
    """Every scenario carries its published-best oracle values (the
    selection sweeps and scoreboards read them from the registry, not
    hardcoded copies), and the shared JSON sanitizer strips non-finite
    floats recursively."""
    import math

    from defensive_model_vae_tpu import scenarios
    from defensive_model_vae_tpu.utils.reporting import jsonable

    keys = {"velocity_js_divergence", "rmse_frequency_trajcount",
            "surface_rmse_with_zeros", "surface_rmse_no_zeros"}
    for k in ("sce1", "sce2", "sce3", "sce4"):
        pb = scenarios.get(k).published_best
        assert set(pb) == keys and all(v > 0 for v in pb.values())
    out = jsonable({"a": math.nan, "b": [math.inf, 1.0], "c": (2.0,), "d": "x"})
    assert out == {"a": None, "b": [None, 1.0], "c": [2.0], "d": "x"}


def test_cli_doctor(tmp_path, capsys):
    """defvae doctor: all environment rows report, WARN-only degradations
    don't fail the exit code, and every expected check row is present."""
    from defensive_model_vae_tpu.cli import main

    main(["doctor", "--no-device", "--ckpt-root", str(tmp_path / "none")])
    out = capsys.readouterr().out
    for row in ("jax backend", "device probe", "hash-seed pin",
                "persistent compilation cache", "csv loader",
                "dnda native kernels", "raw CARLA corpus",
                "fixture corpora", "checkpoints"):
        assert row in out, row
    # absent checkpoints degrade to WARN (fixtures/pipeline still work),
    # never FAIL
    assert "FAIL" not in out
    assert "skipped (--no-device)" in out


def test_trace_name_collision_fails_loudly():
    """Same-numbered episodes in different maneuver folders map to the same
    tracked_trajectory_* file; generate+track must refuse BEFORE any device
    work rather than let save_tracked silently overwrite one of them."""
    from defensive_model_vae_tpu.pipeline import (
        generate_and_track, generate_and_track_multi,
    )

    dup = ["left/exp_11_control_Town05_3.csv", "right/exp_11_control_Town05_3.csv"]
    with pytest.raises(ValueError, match="collision"):
        generate_and_track(None, None, "sce2", dup)
    with pytest.raises(ValueError, match="collision"):
        generate_and_track_multi(None, None, "sce2", dup, seeds=[0, 1])


def test_multi_seed_alias_guard():
    """A seed set spanning the seed+1000*retry redraw fold would alias one
    seed's redraw stream onto another's base draws — rejected up front."""
    from defensive_model_vae_tpu.pipeline import generate_and_track_multi

    with pytest.raises(ValueError, match="alias"):
        generate_and_track_multi(None, None, "sce2", [], seeds=[0, 1000])
    with pytest.raises(ValueError, match="alias"):
        generate_and_track_multi(None, None, "sce2", [], seeds=[5, 3005])


def test_load_tracked_exact_prefix(tmp_path):
    """load_tracked must match the exact generated prefix: a substring
    match would pull 'sce10' traces (or any stray npy naming the key) into
    every 'sce1' sweep."""
    from defensive_model_vae_tpu.pipeline import load_tracked

    good = np.zeros((4, 4), np.float32)
    np.save(tmp_path / "tracked_trajectory_sce1_exp1_1.npy", good)
    np.save(tmp_path / "tracked_trajectory_sce10_exp1_1.npy", np.ones((4, 4)))
    np.save(tmp_path / "debug_sce1_notes.npy", np.ones((2, 2)))
    out = load_tracked(str(tmp_path), "sce1")
    assert len(out) == 1 and np.array_equal(out[0], good)


def test_serve_rejects_raw_jump_guard():
    """The device serve path implements the wrapped jump-guard only; a
    raw-guard config must be rejected, not silently served with different
    semantics than track()."""
    from defensive_model_vae_tpu.control import MPCConfig, make_serve_fn

    cfg = MPCConfig(prediction_horizon=5, control_horizon=3, dt=0.1,
                    raw_jump_guard=True)
    with pytest.raises(ValueError, match="raw_jump_guard"):
        make_serve_fn(None, None, cfg, num_steps=4)


@requires_reference
@pytest.mark.slow
def test_run_scenario_offset_mode_and_stale_cleanup(tmp_path, all_windows):
    """run_scenario must (a) honor the manifest's offset_mode=False (legacy
    non-offset decoders emit absolute coordinates — generating with the
    default shift would double-offset every trajectory) and (b) remove
    stale traces from earlier runs so load_tracked consumers never score a
    mixed set."""
    import shutil

    from defensive_model_vae_tpu.pipeline import (
        generate_and_track, run_scenario,
    )
    from defensive_model_vae_tpu.train.checkpoint import load_checkpoint

    # tiny corpus: 2 real sce2 CSVs in the expected <town>/<maneuver> layout
    src = sorted(
        (REFERENCE_ROOT / "DefensiveData" / "DynamicBlindTown05").rglob("exp_*.csv")
    )[:2]
    from defensive_model_vae_tpu import scenarios as _scen

    town = tmp_path / "data" / "DynamicBlindTown05" / _scen.ACTIONS[0]
    town.mkdir(parents=True)
    for c in src:
        shutil.copy(c, town / c.name)

    params, hist = train(all_windows["sce2"], train_cfg=TrainConfig(epochs=100))
    ck = tmp_path / "ckpt"
    save_checkpoint(str(ck), params, CVAEConfig(), "sce2", hist,
                    extra_manifest={"offset_mode": False})

    out = tmp_path / "out"
    stale_dir = out / "GeneratedData"
    stale_dir.mkdir(parents=True)
    stale = stale_dir / "tracked_trajectory_sce2_exp99_9.npy"
    np.save(stale, np.zeros((3, 4), np.float32))

    run_scenario(str(ck), "sce2", str(tmp_path / "data"), str(out), seed=2)
    assert not stale.exists()  # (b) stale trace cleared

    # (a) saved traces equal the explicit shift_start=False path, and
    # differ from the default-shift path
    p2, cfg2, _ = load_checkpoint(str(ck))
    csvs = sorted(str(p) for p in town.glob("*.csv"))
    want, names = generate_and_track(p2, cfg2, "sce2", csvs, seed=2,
                                     shift_start=False)
    shifted, _ = generate_and_track(p2, cfg2, "sce2", csvs, seed=2)
    assert len(want) and len(names)
    for t, n in zip(want, names):
        np.testing.assert_array_equal(
            t, np.load(out / "GeneratedData" / n)
        )
    assert any(
        a.shape != b.shape or not np.allclose(a, b)
        for a, b in zip(want, shifted)
    )


def test_cli_doctor_fail_exit_code(tmp_path, monkeypatch, capsys):
    """A hard failure (backend unreachable) must print FAIL and exit 1 —
    the health check's contract for scripting (`defvae doctor && ...`)."""
    import jax

    import pytest

    from defensive_model_vae_tpu.cli import main

    def boom():
        raise RuntimeError("backend down")

    monkeypatch.setattr(jax, "devices", boom)
    with pytest.raises(SystemExit) as e:
        main(["doctor", "--no-device", "--ckpt-root", str(tmp_path / "x")])
    assert e.value.code == 1
    out = capsys.readouterr().out
    assert "FAIL" in out and "backend down" in out
