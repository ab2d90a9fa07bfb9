"""CLI wiring smoke tests for the subcommands not covered elsewhere.

Each reference workflow's CLI replacement (SURVEY §5 config/CLI directive)
is exercised end-to-end on real inputs where cheap, and via argument-wiring
checks where the underlying stage is already covered by its own e2e test
(``pipeline`` → test_pipeline.py::test_full_pipeline_quality_band).
"""

import json
import os
import shutil

import numpy as np
import pytest

from defensive_model_vae_tpu.cli import main

from conftest import REFERENCE_ROOT, requires_reference

COLLECTED = REFERENCE_ROOT / "SUT_Testing" / "collected_data"


@requires_reference
def test_cli_dataset(tmp_path, capsys):
    main([
        "dataset", "--scenario", "sce2",
        "--data-root", str(REFERENCE_ROOT / "DefensiveData"),
        "--out", str(tmp_path / "w.npy"),
    ])
    w = np.load(tmp_path / "w.npy")
    assert w.shape == (16, 10, 3)
    assert "saved" in capsys.readouterr().out


@requires_reference
def test_cli_dnda_episode(tmp_path, capsys):
    main([
        "dnda", "--scenario", "sce1",
        "--csv", str(COLLECTED / "DEF_StaticBlindTown05_1.csv"),
        "--max-frames", "3",
        "--out-csv", str(tmp_path / "frames.csv"),
    ])
    rep = json.loads(capsys.readouterr().out)
    assert len(rep["frames"]) == 3 and len(rep["dnda"]) == 3
    assert 0.0 <= rep["max_dnda"] <= 1.0
    rows = (tmp_path / "frames.csv").read_text().strip().splitlines()
    assert rows[0] == "frame,dnda" and len(rows) == 4


@requires_reference
def test_cli_dnda_sweep(tmp_path, capsys):
    d = tmp_path / "episodes"
    d.mkdir()
    shutil.copy(COLLECTED / "DEF_StaticBlindTown05_1.csv", d)
    main([
        "dnda-sweep", "--dir", str(d),
        "--out", str(tmp_path / "summary.csv"),
    ])
    rows = json.loads(capsys.readouterr().out)
    assert len(rows) == 1
    assert rows[0]["model"] == "DEF" and rows[0]["scenario"] == "StaticBlindTown05"
    assert 0.0 <= rows[0]["max_dnda"] <= 1.0
    # summary CSV mirrors the reference's max_dnda_summary.csv
    assert (tmp_path / "summary.csv").exists()


@requires_reference
@pytest.mark.parametrize("metric", ["TTC", "JERK"])
def test_cli_metrics(metric, capsys):
    main([
        "metrics", "--scenario", "sce1",
        "--csv", str(COLLECTED / "DEF_StaticBlindTown05_1.csv"),
        "--metric", metric,
    ])
    rep = json.loads(capsys.readouterr().out)
    assert rep["metric"] == metric
    assert rep["rows"] > 0 and rep["valid"] > 0
    assert rep["min"] <= rep["mean"] <= rep["max"]


@requires_reference
def test_cli_writeback(tmp_path, capsys):
    main([
        "writeback",
        "--npy", str(REFERENCE_ROOT / "results/GeneratedData/tracked_trajectory_sce1_exp11_3.npy"),
        "--data-root", str(REFERENCE_ROOT / "DefensiveData"),
        "--out-dir", str(tmp_path),
    ])
    out = capsys.readouterr().out
    assert "saved" in out
    written = [f for f in os.listdir(tmp_path) if f.endswith("_def.csv")]
    assert len(written) == 1


@requires_reference
def test_cli_thw(tmp_path, capsys):
    main([
        "thw", "--scenario", "sce1",
        "--data-root", str(REFERENCE_ROOT / "DefensiveData"),
        "--out-velocity", str(tmp_path / "v.png"),
        "--out-thw", str(tmp_path / "t.png"),
    ])
    rep = json.loads(capsys.readouterr().out)
    assert len(rep["start_speeds"]) == 38  # one per sce1 CSV
    assert len(rep["thw"]) == 38 and all(t > 0 for t in rep["thw"])
    assert (tmp_path / "v.png").exists() and (tmp_path / "t.png").exists()


@requires_reference
def test_cli_speed_plots(tmp_path, capsys):
    main([
        "speed-plots", "--scenario", "sce1",
        "--dir", str(COLLECTED),
        "--out", str(tmp_path / "speeds.png"),
    ])
    assert "SUT episodes" in capsys.readouterr().out
    assert (tmp_path / "speeds.png").exists()


def test_cli_mpc_sweep(tmp_path, capsys):
    # gentle straight path north at ~10 m/s, [x, y, t] rows
    t = np.arange(12) * 0.5
    wps = np.column_stack([np.full_like(t, -190.0), 20.0 + 10.0 * t, t])
    np.save(tmp_path / "wps.npy", wps)
    main([
        "mpc-sweep", "--waypoints", str(tmp_path / "wps.npy"),
        "--initial-state", "[-190.0, 20.0, 1.5708, 0.0, 10.0]",
        "--combos", "10:5,20:10",
    ])
    rows = json.loads(capsys.readouterr().out)
    assert [(r["P"], r["M"]) for r in rows] == [(10, 5), (20, 10)]
    for r in rows:
        assert r["max_error_m"] < 5.0


@pytest.mark.slow
def test_cli_serve(tmp_path, all_windows, capsys):
    np.save(tmp_path / "w.npy", all_windows["sce2"])
    main([
        "train", "--scenario", "sce2", "--windows", str(tmp_path / "w.npy"),
        "--ckpt", str(tmp_path / "ckpt"), "--epochs", "30",
    ])
    main([
        "serve", "--ckpt", str(tmp_path / "ckpt"),
        "--start-x", "-150.0", "--start-y", "-0.7",
        "--heading", "3.14", "--vx", "-8.0", "--vy", "0.0",
        "--steps", "16", "--out", str(tmp_path / "states.npy"),
    ])
    assert "saved" in capsys.readouterr().out
    states = np.load(tmp_path / "states.npy")
    assert states.shape == (1, 17, 4)  # initial state + 16 steps
    assert np.all(np.isfinite(states))

    # --data-parallel shards the request batch over the 8-device CPU mesh
    main([
        "serve", "--data-parallel", "--batch", "16",
        "--ckpt", str(tmp_path / "ckpt"),
        "--start-x", "-150.0", "--start-y", "-0.7",
        "--heading", "3.14", "--vx", "-8.0", "--vy", "0.0",
        "--steps", "16", "--out", str(tmp_path / "states_dp.npy"),
    ])
    dp = np.load(tmp_path / "states_dp.npy")
    assert dp.shape == (16, 17, 4) and np.all(np.isfinite(dp))


def test_cli_train_trace(tmp_path, capsys):
    """--trace dumps a jax.profiler device trace around the training run."""
    from conftest import FIXTURES

    main([
        "train", "--scenario", "sce2",
        "--windows", str(FIXTURES / "trajectory_sce2_cond.npy"),
        "--ckpt", str(tmp_path / "ck"), "--epochs", "5",
        "--trace", str(tmp_path / "trace"),
    ])
    assert "trained 5 epochs" in capsys.readouterr().out
    dumped = [p for p in (tmp_path / "trace").rglob("*") if p.is_file()]
    assert dumped, "no profiler trace files written"


def test_parse_ckpt_specs():
    """--ckpt spec parsing is deterministic and filesystem-independent:
    NAME=DIR iff the prefix is a simple name (no path separators); a
    literal '='-bearing directory escapes as ./name=dir."""
    from defensive_model_vae_tpu.cli import _parse_ckpt_specs

    assert _parse_ckpt_specs(["d"]) == {"default": "d"}
    assert _parse_ckpt_specs(["sce1=a", "sce2=b"]) == {"sce1": "a",
                                                       "sce2": "b"}
    assert _parse_ckpt_specs(["run=3/ckpt"]) == {"run": "3/ckpt"}
    assert _parse_ckpt_specs(["./run=3/ckpt"]) == {"default": "./run=3/ckpt"}
    # empty model names are unrepresentable ('=a' is not NAME=DIR)
    assert _parse_ckpt_specs(["=a"]) == {"default": "=a"}
    with pytest.raises(SystemExit, match="must be NAME=DIR"):
        _parse_ckpt_specs(["a", "b"])
    with pytest.raises(SystemExit, match="duplicate model name"):
        _parse_ckpt_specs(["x=a", "x=b"])


def test_cli_train_trainer_flag_guards(tmp_path):
    """Trainer-flag wiring: --fused stays single-chip (it rejects --mesh,
    pointing at the --fused-scale DP tier), and the two fused flags are
    mutually exclusive.  The kernels themselves are covered by
    test_fused*.py (interpret) and bench.py (on-chip); these guards run
    before any kernel work, so a windows file is all the setup needed."""
    w = tmp_path / "w.npy"
    np.save(w, np.zeros((8, 10, 3), np.float32))
    base = ["train", "--scenario", "sce1", "--windows", str(w),
            "--ckpt", str(tmp_path / "ck")]
    with pytest.raises(SystemExit, match="fused-scale .data-parallel"):
        main(base + ["--fused", "--mesh"])
    with pytest.raises(SystemExit, match="mutually exclusive"):
        main(base + ["--fused", "--fused-scale"])


def test_cli_fused_scale_manifest_backward(tmp_path, monkeypatch):
    """The checkpoint manifest records the RESOLVED backward (default None
    -> 'manual' where supported), not just an explicitly passed flag: the
    two gradient paths are numerically non-identical, so provenance must
    say which one trained the checkpoint (ADVICE r3).  The kernel itself
    is stubbed — resolution happens in the CLI before the kernel runs."""
    import json

    import jax

    from defensive_model_vae_tpu import ops
    from defensive_model_vae_tpu.models import CVAEConfig, init_params

    calls = {}

    def fake_scale(windows, **kw):
        calls.update(kw)
        cfg = CVAEConfig(seq_len=windows.shape[1], dim=windows.shape[2])
        params = init_params(jax.random.PRNGKey(0), cfg)
        return params, {k: np.zeros(kw.get("epochs", 1))
                        for k in ("total", "recon", "kld", "start", "time")}

    monkeypatch.setattr(ops, "fused_train_scale", fake_scale)
    w = tmp_path / "w.npy"
    np.save(w, np.zeros((8, 10, 3), np.float32))
    main(["train", "--scenario", "sce1", "--windows", str(w),
          "--ckpt", str(tmp_path / "ck"), "--epochs", "2", "--fused-scale"])
    recipe = json.loads(
        (tmp_path / "ck" / "manifest.json").read_text()
    )["recipe"]
    # default dtype (None -> f32) supports the manual backward, so the
    # resolved default is 'manual' even though --backward was not passed
    assert recipe["backward"] == "manual"
    assert calls["backward"] is None  # kernel still gets the raw flag
    # --noise resolves the same way: default None -> 'hbm', recorded in
    # the manifest and forwarded resolved to the kernel
    assert recipe["noise"] == "hbm"
    assert calls["noise"] == "hbm"
    # the hbm default PRNG (rbg) has a backend-dependent bit stream, so
    # the manifest must record which impl produced the eps (ADVICE r04);
    # the kernel gets the resolved impl too
    assert recipe["noise_impl"] == "rbg"
    assert calls["noise_impl"] == "rbg"

    # an explicit backend-stable stream is selectable and recorded
    calls.clear()
    main(["train", "--scenario", "sce1", "--windows", str(w),
          "--ckpt", str(tmp_path / "ck2"), "--epochs", "2", "--fused-scale",
          "--noise-impl", "threefry2x32"])
    recipe2 = json.loads(
        (tmp_path / "ck2" / "manifest.json").read_text()
    )["recipe"]
    assert recipe2["noise_impl"] == "threefry2x32"
    assert calls["noise_impl"] == "threefry2x32"

    # prng noise has no hbm eps stream: no noise_impl in the manifest,
    # none forwarded
    calls.clear()
    main(["train", "--scenario", "sce1", "--windows", str(w),
          "--ckpt", str(tmp_path / "ck3"), "--epochs", "2", "--fused-scale",
          "--noise", "prng"])
    recipe3 = json.loads(
        (tmp_path / "ck3" / "manifest.json").read_text()
    )["recipe"]
    assert "noise_impl" not in recipe3
    assert "noise_impl" not in calls


def test_cli_train_flag_guards(tmp_path):
    """--backward and --noise apply to --fused-scale only: passing either
    to another trainer must error, not be silently dropped."""
    w = tmp_path / "w.npy"
    np.save(w, np.zeros((8, 10, 3), np.float32))
    base = ["train", "--scenario", "sce1", "--windows", str(w),
            "--ckpt", str(tmp_path / "ck"), "--epochs", "1"]
    with pytest.raises(SystemExit, match="--backward applies"):
        main(base + ["--backward", "manual"])
    with pytest.raises(SystemExit, match="--noise applies"):
        main(base + ["--noise", "prng"])
    with pytest.raises(SystemExit, match="--noise applies"):
        main(base + ["--fused", "--noise", "hbm"])
    # --noise-impl needs the hbm eps stream to exist
    with pytest.raises(SystemExit, match="--noise-impl applies"):
        main(base + ["--noise-impl", "threefry2x32"])
    with pytest.raises(SystemExit, match="--noise-impl applies"):
        main(base + ["--fused-scale", "--noise", "prng",
                     "--noise-impl", "rbg"])


def test_cli_export(tmp_path, capsys):
    """defvae export: native checkpoint → reference-format .pth."""
    import jax

    from defensive_model_vae_tpu.models import CVAEConfig, init_params
    from defensive_model_vae_tpu.train.checkpoint import save_checkpoint
    from defensive_model_vae_tpu.train.torch_import import load_torch_checkpoint

    cfg = CVAEConfig()
    d = save_checkpoint(
        str(tmp_path / "ck"), init_params(jax.random.PRNGKey(0), cfg), cfg, "sce1"
    )
    pth = str(tmp_path / "model.pth")
    main(["export", "--ckpt", d, "--pth", pth])
    assert "exported" in capsys.readouterr().out
    _, cfg2 = load_torch_checkpoint(pth)
    assert cfg2 == cfg


def test_jsonsafe():
    """CLI JSON outputs must be strict JSON: non-finite floats → null
    (e.g. max_dnda = -inf on an episode with no scorable frame, THW = NaN
    at zero start speed)."""
    from defensive_model_vae_tpu.cli import _jsonsafe

    out = _jsonsafe({
        "a": float("-inf"), "b": [1.0, float("nan")],
        "c": {"d": float("inf"), "e": 2}, "f": "text",
    })
    assert out == {"a": None, "b": [1.0, None], "c": {"d": None, "e": 2},
                   "f": "text"}
    # round-trips through the strict parser
    json.loads(json.dumps(out))


def test_cli_pipeline_wiring(monkeypatch, capsys):
    """`defvae pipeline` maps its flags onto run_scenario (the stage itself
    is e2e-tested in test_pipeline.py)."""
    import defensive_model_vae_tpu.pipeline as pl

    seen = {}

    def fake_run_scenario(ckpt, scenario, data_root, out, seed=0):
        seen.update(ckpt=ckpt, scenario=scenario, data_root=data_root,
                    out=out, seed=seed)
        return {"ok": True}

    monkeypatch.setattr(pl, "run_scenario", fake_run_scenario)
    main([
        "pipeline", "--ckpt", "CK", "--scenario", "sce3",
        "--data-root", "DR", "--out", "OUT", "--seed", "7",
    ])
    assert seen == {"ckpt": "CK", "scenario": "sce3", "data_root": "DR",
                    "out": "OUT", "seed": 7}
    assert json.loads(capsys.readouterr().out) == {"ok": True}
