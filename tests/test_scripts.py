"""Unit tests for the evidence-regeneration scripts' pure logic.

The sweep/validate scripts under ``scripts/`` produce the committed
selection evidence (``results/seed_sweep_*.json``) and the scoreboard
band (``results/validation_multiseed.json``); their parsing and ranking
rules are load-bearing — a silently wrong rank would ship a worse
checkpoint — so the pure parts are tested here without touching a device.
"""

import importlib.util
import os

import pytest

from conftest import REPO_ROOT


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, str(REPO_ROOT / "scripts" / f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_parse_seed_spec():
    ss = _load("seed_sweep")
    assert ss.parse_seed_spec("0:4") == [0, 1, 2, 3]
    assert ss.parse_seed_spec("59:61,29,13") == [59, 60, 29, 13]
    assert ss.parse_seed_spec("7") == [7]


def test_score_candidate_maximin_and_nan_ranking():
    ss = _load("seed_sweep")
    pub = {m: 1.0 for m in ss.METRICS}

    good = {m: 0.9 for m in ss.METRICS}          # beats all, margin 0.1
    beaten, worst = ss.score_candidate(good, pub)
    assert beaten == 4 and abs(worst - 0.1) < 1e-12

    # binding metric decides the margin even when others are wide
    mixed = dict(good, velocity_js_divergence=0.99)
    _, worst = ss.score_candidate(mixed, pub)
    assert abs(worst - 0.01) < 1e-12

    # margins are RELATIVE (pub - val) / pub: with mixed scales the small
    # metric's 10% margin must beat the big metric's 2% margin even though
    # the big metric's absolute margin (0.1) is larger
    pub2 = {m: 0.1 for m in ss.METRICS}
    pub2["surface_rmse_with_zeros"] = 5.0
    vals2 = {m: 0.09 for m in ss.METRICS}          # 10% margins
    vals2["surface_rmse_with_zeros"] = 4.9         # 2% margin, 0.1 absolute
    _, worst2 = ss.score_candidate(vals2, pub2)
    assert abs(worst2 - 0.02) < 1e-12

    # a NaN mean must rank the candidate LAST regardless of position —
    # builtin min() would silently skip a non-first NaN
    for poison in ss.METRICS:
        bad = dict(good)
        bad[poison] = float("nan")
        _, worst = ss.score_candidate(bad, pub)
        assert worst == float("-inf"), poison


def test_rank_candidates_order():
    ss = _load("seed_sweep")
    rows = [
        {"train_seed": 0, "beats_published": 4, "worst_margin": 0.02},
        {"train_seed": 1, "beats_published": 3, "worst_margin": 0.50},
        {"train_seed": 2, "beats_published": 4, "worst_margin": 0.10},
        {"train_seed": 3, "beats_published": 4, "worst_margin": float("-inf")},
    ]
    ranked = ss.rank_candidates(rows)
    # beats_published first, then widest worst margin; NaN-poisoned last
    # among its beats tier
    assert [r["train_seed"] for r in ranked] == [2, 0, 3, 1]


def test_jittered_sut_copy_shifts_only_sv_velocities(tmp_path):
    """``bench._jittered_sut_copy``: SV velocities shift by +1e-3 (fresh
    device inputs for the DNDA warm pass) while every shape-determining
    column — ego kinematics, SV positions (sce4's stop condition reads
    sv1_x), NaN validity masks — survives the roundtrip unchanged, so the
    warm pass compiles the exact executables the timed pass will run."""
    import importlib.util

    import numpy as np
    import pandas as pd

    spec = importlib.util.spec_from_file_location(
        "bench", str(REPO_ROOT / "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    src, dst = tmp_path / "src", tmp_path / "dst"
    src.mkdir()
    df = pd.DataFrame(
        {
            "frame": [1, 2, 3],
            "ego_x": [0.5, 1.5, 2.5],
            "ego_vx": [1.0, 1.0, 0.0],
            "sv1_x": [14.0005, np.nan, 3.0],
            "sv1_vx": [2.0, np.nan, 0.0],
            "sv1_vy": [0.0, 1.0, np.nan],
            "sv2_velocity": [9.9, 9.9, 9.9],  # NOT an sv\d+_v[xy] column
        }
    )
    df.to_csv(src / "IDM_StaticBlindTown05_1.csv", index=False)
    (src / "description.txt").write_text("not an episode")

    bench._jittered_sut_copy(str(src), str(dst))
    out = pd.read_csv(dst / "IDM_StaticBlindTown05_1.csv")
    assert not (dst / "description.txt").exists()
    for col in ("frame", "ego_x", "ego_vx", "sv1_x", "sv2_velocity"):
        pd.testing.assert_series_equal(out[col], df[col])
    for col in ("sv1_vx", "sv1_vy"):
        assert out[col].isna().equals(df[col].isna()), col
        assert np.allclose(out[col].dropna(), df[col].dropna() + 1e-3), col


def test_committed_sweep_evidence_ranked_consistently():
    """Every committed seed-sweep artifact's ranking must reproduce from
    its own stored rows via the current scoring rule."""
    ss = _load("seed_sweep")
    checked = 0
    import json

    for path in sorted((REPO_ROOT / "results").glob("seed_sweep_*.json")):
        doc = json.loads(path.read_text())
        rows = doc.get("ranked", [])
        if len(rows) < 2:
            continue
        if "worst_margin" not in rows[0]:
            # round-2 artifacts predate the maximin tiebreak; they only
            # guarantee a beats_published-descending order
            beats = [r["beats_published"] for r in rows]
            assert beats == sorted(beats, reverse=True), path.name
            checked += 1
            continue
        rescored = [
            dict(r, **dict(zip(("beats_published", "worst_margin"),
                               ss.score_candidate(r["means"],
                                                  doc["published_best"]))))
            for r in rows
        ]
        reranked = ss.rank_candidates(rescored)
        # jsonable stores -inf as null in the committed rows
        key = lambda r: (
            r["beats_published"],
            round(r["worst_margin"], 12)
            if r["worst_margin"] is not None else float("-inf"),
        )
        assert [key(r) for r in reranked] == sorted(
            (key(r) for r in rows), reverse=True
        ), path.name
        # the committed front-runner stays the front-runner
        assert key(reranked[0]) == key(rows[0]), path.name
        checked += 1
    assert checked >= 4, f"only {checked} sweep artifacts checked"


def test_bench_scale_smoke_tiny():
    """``bench.bench_scale`` at a toy size: runs the real trainer program,
    returns a finite (rate, tflops) pair, and raises (rather than reporting
    a rate) on divergence — same visibility contract as the other bench
    sections.  The production size (131072 windows) only runs on-chip."""
    spec = importlib.util.spec_from_file_location(
        "bench", str(REPO_ROOT / "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    import numpy as np

    rate, tflops, _, rate_med = bench.bench_scale(n=64, epochs=8)
    assert rate > 0 and tflops > 0
    assert np.isfinite(rate) and np.isfinite(tflops) and np.isfinite(rate_med)

    # the mixed-precision variant must run and converge too (bf16
    # forward/backward over f32 master params — TrainConfig.compute_dtype)
    rate16, tflops16, _, _ = bench.bench_scale(
        n=64, epochs=8, compute_dtype="bfloat16"
    )
    assert rate16 > 0 and np.isfinite(tflops16)


def test_robustness_row_reproduces_from_sweeps():
    """The committed selection-free robustness artifact
    (results/robustness_row.json, the PARITY table) must reproduce exactly
    from the committed sweep artifacts via the current script."""
    import json

    rr = _load("robustness_row")
    built = rr.build()
    committed = json.loads(
        (REPO_ROOT / "results" / "robustness_row.json").read_text()
    )
    assert built == committed
    # structural sanity: 4 scenarios x 4 metrics, medians positive, and
    # the headline disclosure (11/16 median-beats) holds
    n_beat = sum(
        c["median_beats"]
        for s in built["scenarios"].values() for c in s["cells"].values()
    )
    assert n_beat == 11
    for s in built["scenarios"].values():
        assert len(s["cells"]) == 4
        for c in s["cells"].values():
            assert c["median"] > 0 and c["n_seeds"] >= 8


def test_bench_drift_report_flags_large_moves():
    """The cross-round drift report, against SYNTHETIC previous-round
    fixtures (never the real BENCH_r*.json files — the r04 verdict found
    the on-disk coupling broke the suite the moment the driver wrote a
    new round record): echoing the previous round's values flags nothing;
    a >20% move on a headline key is flagged; renamed keys compare through
    the alias map with the redefinition skip suppressing the cross-
    definition comparison for the round pair straddling the rename."""
    spec = importlib.util.spec_from_file_location(
        "bench", str(REPO_ROOT / "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    orig_load = bench._load_prev_bench
    try:
        # --- a PRE-rename prev (r03-shaped: scale_fused key holds the OLD
        # prng definition, no manual_prng key) ---
        pre = {"value": 100.0, "scale_fused_windows_per_sec": 50.0}
        bench._load_prev_bench = lambda: (pre, "r03")

        same = bench._drift_report({"value": 100.0})
        assert same["flagged"] == {} and same["vs"] == "r03"
        moved = bench._drift_report({"value": 200.0})
        assert "value" in moved["flagged"]
        # alias: the new manual_prng key compares against the old headline
        aliased = bench._drift_report(
            {"scale_fused_manual_prng_windows_per_sec": 150.0}
        )
        assert "scale_fused_manual_prng_windows_per_sec" in aliased["flagged"]
        # redefinition skip: prev predates the rename, so its scale_fused
        # headline is the OLD (prng) definition — a direct same-name
        # comparison would flag the rename as a perf move
        redefined = bench._drift_report(
            {"scale_fused_windows_per_sec": 150.0}
        )
        assert redefined["flagged"] == {}

        # --- a POST-rename prev (r04-shaped: both keys present) — the
        # direct comparison applies again ---
        post = {"scale_fused_windows_per_sec": 50.0,
                "scale_fused_manual_prng_windows_per_sec": 40.0}
        bench._load_prev_bench = lambda: (post, "r04")
        both = bench._drift_report(
            {"scale_fused_windows_per_sec": 150.0,
             "scale_fused_manual_prng_windows_per_sec": 40.0}
        )
        assert both["flagged"] == {"scale_fused_windows_per_sec": 3.0}

        # median preference: when BOTH rounds carry a *_median the comparison
        # uses it (damps best-of-N spread); flag keyed by the base name
        fake_prev = {"value": 100.0, "value_median": 100.0}
        bench._load_prev_bench = lambda: (fake_prev, "r99")
        med = bench._drift_report(
            {"value": 200.0, "value_median": 110.0}  # best moved, median flat
        )
        assert med["flagged"] == {}
        med2 = bench._drift_report(
            {"value": 105.0, "value_median": 200.0}  # median moved
        )
        assert med2["flagged"] == {"value": 2.0}
        # a value_sync-only flag is annotated as tunnel-RTT noise (the sync
        # per-call time charges a load-dependent round-trip to a ~23 ms
        # kernel); a flag on BOTH keys is a real move and gets no annotation
        fake_prev = {"value": 100.0, "value_sync": 50.0}
        bench._load_prev_bench = lambda: (fake_prev, "r99")
        lines = []
        orig_log, bench._log = bench._log, lines.append
        try:
            out = bench._drift_report({"value": 101.0, "value_sync": 25.0})
            assert out["flagged"] == {"value_sync": 0.5}
            assert any("RTT-dominated" in ln for ln in lines)
            lines.clear()
            out = bench._drift_report({"value": 200.0, "value_sync": 25.0})
            assert set(out["flagged"]) == {"value", "value_sync"}
            assert not any("RTT-dominated" in ln for ln in lines)
        finally:
            bench._log = orig_log
    finally:
        bench._load_prev_bench = orig_load


def test_drift_key_lifecycle_covers_all_rounds():
    """Every timing-series key carried by ANY committed BENCH_r*.json must
    be present in bench._DRIFT_KEYS, be the old side of a rename in
    bench._DRIFT_ALIASES, or be explicitly retired — so future renames/
    retirements require a deliberate table edit rather than silently
    dropping a series from the drift report (r04 verdict item 7)."""
    import json
    import re

    spec = importlib.util.spec_from_file_location(
        "bench", str(REPO_ROOT / "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    covered = (set(bench._DRIFT_KEYS)
               | set(bench._DRIFT_ALIASES.values())
               | set(bench._RETIRED_KEYS))
    records = sorted(REPO_ROOT.glob("BENCH_r*.json"))
    assert records, "no committed BENCH records to audit"
    unhandled = {}
    for path in records:
        rec = json.loads(path.read_text())
        parsed = rec.get("parsed", rec) if isinstance(rec, dict) else None
        if not isinstance(parsed, dict):
            continue  # failed round — nothing to track
        series = {
            k for k in parsed
            if k == "value" or k == "value_sync"
            or re.search(r"_per_sec$", k)
            or (re.search(r"_s$", k) and not k.endswith("_reps"))
        }
        missing = series - covered
        if missing:
            unhandled[path.name] = sorted(missing)
    assert not unhandled, (
        f"timing-series keys with no lifecycle entry: {unhandled} — add to "
        f"_DRIFT_KEYS, _DRIFT_ALIASES (as old key), or _RETIRED_KEYS"
    )
    # aliases and retirements must reference keys that actually existed
    historical = set()
    for path in records:
        rec = json.loads(path.read_text())
        parsed = rec.get("parsed", rec) if isinstance(rec, dict) else None
        if isinstance(parsed, dict):
            historical |= set(parsed)
    for new_k, old_k in bench._DRIFT_ALIASES.items():
        assert old_k in historical, f"alias target never existed: {old_k}"
        assert new_k in bench._DRIFT_KEYS, f"alias source untracked: {new_k}"
    for k in bench._RETIRED_KEYS:
        assert k in historical, f"retired key never existed: {k}"


def test_no_block_until_ready_in_measurement_code():
    """jax.block_until_ready is NOT a completion barrier on the axon
    tunnel (CLAUDE.md measurement hazard (3): a 0.56 s Pallas kernel read
    0.000 s behind it) — every timed path and staging sync in the bench,
    the evidence/probe scripts, and the serving warm-up must use a real
    (tiny) fetch instead.  This guard scans the AST so prose mentions in
    comments/docstrings don't count."""
    import ast as _ast

    files = [REPO_ROOT / "bench.py",
             REPO_ROOT / "defensive_model_vae_tpu" / "serving.py"]
    files += sorted((REPO_ROOT / "scripts").glob("*.py"))
    assert len(files) > 8  # the scan must actually cover the scripts dir
    offenders = []
    for path in files:
        tree = _ast.parse(path.read_text())
        for node in _ast.walk(tree):
            if not isinstance(node, _ast.Call):
                continue
            f = node.func
            name = (f.attr if isinstance(f, _ast.Attribute)
                    else f.id if isinstance(f, _ast.Name) else None)
            if name == "block_until_ready":
                offenders.append(f"{path.name}:{node.lineno}")
    assert not offenders, (
        f"block_until_ready call(s) in measurement code: {offenders} — "
        f"use a tiny np.asarray fetch (CLAUDE.md hazard (3))"
    )


def test_bench_prev_round_loader_skips_failed_records(tmp_path):
    """A failed round's BENCH record (the driver writes \"parsed\": null
    with rc/tail fields) must not become the drift baseline — the loader
    falls back to the last GOOD round instead of disabling the report."""
    import json

    spec = importlib.util.spec_from_file_location(
        "bench", str(REPO_ROOT / "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    good = {"value": 123.0}
    (tmp_path / "BENCH_r03.json").write_text(json.dumps({"parsed": good}))
    (tmp_path / "BENCH_r04.json").write_text(
        json.dumps({"parsed": None, "rc": 1, "tail": "Traceback ..."})
    )
    prev, tag = bench._load_prev_bench(here=str(tmp_path))
    assert (prev, tag) == (good, "r03")
    # corrupt newest + failed next-newest -> still reaches the good one
    (tmp_path / "BENCH_r05.json").write_text("{not json")
    prev, tag = bench._load_prev_bench(here=str(tmp_path))
    assert (prev, tag) == (good, "r03")
    # valid-JSON NON-DICT records (null / list / bare string) are skipped
    # too, not crashed on
    (tmp_path / "BENCH_r05.json").write_text("null")
    assert bench._load_prev_bench(here=str(tmp_path)) == (good, "r03")
    (tmp_path / "BENCH_r05.json").write_text('["partial"]')
    assert bench._load_prev_bench(here=str(tmp_path)) == (good, "r03")
    # bare legacy records (no "parsed" wrapper) still load
    (tmp_path / "BENCH_r06.json").write_text(json.dumps({"value": 9.0}))
    prev, tag = bench._load_prev_bench(here=str(tmp_path))
    assert (prev, tag) == ({"value": 9.0}, "r06")
    # nothing loadable -> (None, None)
    empty = tmp_path / "empty"
    empty.mkdir()
    assert bench._load_prev_bench(here=str(empty)) == (None, None)


def test_multiseed_default_band_matches_committed_artifact():
    """`python scripts/multiseed_validate.py` (no args) must regenerate the
    COMMITTED band: its default --gen-seeds equals the seed list recorded
    in every scenario's provenance note of validation_multiseed.json, and
    the per-metric value vectors have that length.  Guards the docs'
    one-liner reproduction claim (REPRODUCING.md) against default drift."""
    import json
    import re

    mv = _load("multiseed_validate")
    default = mv.DEFAULT_GEN_SEEDS
    doc = json.loads(
        (REPO_ROOT / "results" / "validation_multiseed.json").read_text()
    )
    n = len(default.split(","))
    for sce, prov in doc["provenance"].items():
        note = prov["notes"][0]
        m = re.search(r"gen seeds ([0-9,]+) \(unselected", note)
        assert m, note
        assert m.group(1) == default, sce
        for metric, stats in doc[sce].items():
            assert len(stats["values"]) == n, (sce, metric)


def test_multiseed_chunked_resume(tmp_path, monkeypatch):
    """``--chunk N`` must (a) split the seed list into N-seed tracking
    programs, (b) checkpoint each completed seed's report to the progress
    file, and (c) on rerun skip completed seeds while assembling the final
    band in gens order — the crash-resume path that regenerated the
    committed sce4 band around repeated TPU-worker restarts."""
    import json
    import sys

    import numpy as np

    import defensive_model_vae_tpu.data as data_mod
    import defensive_model_vae_tpu.pipeline as pl
    import defensive_model_vae_tpu.train.checkpoint as ckpt_mod
    import defensive_model_vae_tpu.utils.cache as cache_mod

    mv = _load("multiseed_validate")

    calls = []

    def fake_multi(params, cfg, sce, csvs, seeds):
        calls.append([int(s) for s in seeds])
        # encode the seed in the trace so the (seed-blind) validate stub
        # can produce per-seed values the assertions recognize
        return {int(s): ([np.full((4, 4), float(s))], ["t.npy"])
                for s in seeds}

    def fake_validate(traces, humans, sce):
        s = float(traces[0][0, 0])
        return {m: s + i for i, m in enumerate(mv.METRICS)}

    monkeypatch.setattr(cache_mod, "enable_persistent_cache", lambda: None)
    # the re-exec helper would replace the PYTEST process image
    monkeypatch.setattr(
        cache_mod, "ensure_deterministic_hash_seed", lambda: None
    )
    monkeypatch.setattr(ckpt_mod, "load_checkpoint",
                        lambda d: (None, None, {}))
    monkeypatch.setattr(data_mod, "collect_csv_files", lambda d: [])
    monkeypatch.setattr(pl, "load_humans", lambda sce, csvs: [])
    monkeypatch.setattr(pl, "generate_and_track_multi", fake_multi)
    monkeypatch.setattr(pl, "validate", fake_validate)

    out, prog = tmp_path / "band.json", tmp_path / "progress.json"
    argv = ["mv", "--scenarios", "sce1", "--gen-seeds", "0,1,2,3,4,5,6",
            "--chunk", "3", "--out", str(out), "--progress", str(prog)]
    monkeypatch.setattr(sys, "argv", argv)

    mv.main()
    assert calls == [[0, 1, 2], [3, 4, 5], [6]]
    doc = json.loads(out.read_text())
    for i, m in enumerate(mv.METRICS):
        assert doc["sce1"][m]["values"] == [s + i for s in range(7)], m
    assert any("chunked" in n for n in doc["provenance"]["sce1"]["notes"])
    # success must CLEAR the scenario's progress block — a later run
    # (possibly against a reselected checkpoint) must never resume from
    # finished work
    assert "sce1" not in json.loads(prog.read_text())

    # simulate a crash after the first two chunks: a progress block with
    # the MATCHING fingerprint and seeds 0-4 → only 5,6 are re-tracked
    fp = mv.progress_fingerprint({}, [0, 1, 2, 3, 4, 5, 6],
                                 "/root/reference/DefensiveData")
    reports = {
        str(s): {m: s + i for i, m in enumerate(mv.METRICS)} for s in range(5)
    }
    prog.write_text(json.dumps(
        {"sce1": {"fingerprint": fp, "reports": reports}}
    ))
    calls.clear()
    out.unlink()

    mv.main()
    assert calls == [[5, 6]]
    doc = json.loads(out.read_text())
    for i, m in enumerate(mv.METRICS):
        assert doc["sce1"][m]["values"] == [s + i for s in range(7)], m

    # a STALE fingerprint (reselected checkpoint / different band) must be
    # discarded: every seed re-runs instead of silently reusing old metrics
    prog.write_text(json.dumps(
        {"sce1": {"fingerprint": "stale", "reports": reports}}
    ))
    calls.clear()
    out.unlink()

    mv.main()
    assert calls == [[0, 1, 2], [3, 4, 5], [6]]
    doc = json.loads(out.read_text())
    for i, m in enumerate(mv.METRICS):
        assert doc["sce1"][m]["values"] == [s + i for s in range(7)], m


def test_ensure_deterministic_hash_seed_reexec(tmp_path):
    """The helper re-execs once into PYTHONHASHSEED=0 (deterministic Mosaic
    lowering → fused-kernel cache hits), is a no-op when already pinned
    (never an exec loop), and declines to re-exec a non-file invocation
    (python -c) where argv cannot reconstruct the command."""
    import os
    import subprocess
    import sys

    # the probe self-inserts the repo root: the package is not installed,
    # and the test must not depend on the runner's PYTHONPATH (which -E
    # would ignore anyway)
    code = (
        "import os, sys\n"
        f"sys.path.insert(0, {str(REPO_ROOT)!r})\n"
        "from defensive_model_vae_tpu.utils.cache import "
        "ensure_deterministic_hash_seed\n"
        "ensure_deterministic_hash_seed()\n"
        "print('HASHSEED=' + os.environ.get('PYTHONHASHSEED', 'unset'))\n"
    )
    script = tmp_path / "probe.py"
    script.write_text(code)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONHASHSEED"}
    out = subprocess.run(
        [sys.executable, str(script)], env=env, capture_output=True,
        text=True, timeout=120, cwd=str(REPO_ROOT),
    )
    assert out.returncode == 0, out.stderr
    assert "HASHSEED=0" in out.stdout

    # already pinned → no re-exec needed, still reports 0
    env2 = dict(env, PYTHONHASHSEED="0")
    out2 = subprocess.run(
        [sys.executable, str(script)], env=env2, capture_output=True,
        text=True, timeout=120, cwd=str(REPO_ROOT),
    )
    assert out2.returncode == 0 and "HASHSEED=0" in out2.stdout

    # python -c: sys.orig_argv reconstructs even this form faithfully,
    # so the pin applies here too
    out3 = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=120, cwd=str(REPO_ROOT),
    )
    assert out3.returncode == 0, out3.stderr
    assert "HASHSEED=0" in out3.stdout

    # python -E ignores env vars: the helper must decline (re-exec would
    # be futile) and warn on stderr instead of looping
    out4 = subprocess.run(
        [sys.executable, "-E", str(script)], env=env, capture_output=True,
        text=True, timeout=120, cwd=str(REPO_ROOT),
    )
    assert out4.returncode == 0, out4.stderr
    assert "HASHSEED=unset" in out4.stdout
    assert "cannot be pinned" in out4.stderr


def test_scale_ablation_smoke(monkeypatch):
    """scripts/scale_ablation.py --smoke: the ablation variants compile in
    interpret mode and agree on the epoch-0 loss components (the
    correctness gate the on-chip evidence run passes through first)."""
    import sys

    monkeypatch.setattr(sys, "argv", ["scale_ablation.py", "--smoke"])
    sa = _load("scale_ablation")
    sa.main()  # raises on any variant disagreement


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/SUT_Testing/collected_data"),
    reason="reference SUT corpus absent",
)
def test_dnda_drift_probe_stages_agree(tmp_path):
    """scripts/dnda_drift_probe.py re-implements score_directory's stages
    only to time them — its staged_sweep must agree episode-for-episode
    with score_directory on a real episode (CPU path, few frames)."""
    import shutil

    src = "/root/reference/SUT_Testing/collected_data/DEF_StaticBlindTown05_1.csv"
    shutil.copy(src, tmp_path / "DEF_StaticBlindTown05_1.csv")
    probe = _load("dnda_drift_probe")
    n = probe._smoke(str(tmp_path), max_frames=3)
    assert n > 0


@pytest.mark.slow
def test_serve_latency_script_end_to_end(tmp_path, monkeypatch):
    """scripts/serve_latency.py produces its evidence JSON against a live
    endpoint (tiny steps/reps on the CPU backend)."""
    import json
    import sys

    import jax

    from defensive_model_vae_tpu.models import CVAEConfig, init_params
    from defensive_model_vae_tpu.train.checkpoint import save_checkpoint

    cfg = CVAEConfig()
    d = save_checkpoint(
        str(tmp_path / "ck"), init_params(jax.random.PRNGKey(0), cfg),
        cfg, "sce1",
    )
    out = tmp_path / "serve_latency.json"
    sl = _load("serve_latency")
    monkeypatch.setattr(
        sys, "argv",
        ["serve_latency.py", "--ckpt", d, "--steps", "4", "--reps", "2",
         "--out", str(out), "--throughput-batch", "2",
         "--concurrency", "3", "--load-requests", "3"],
    )
    sl.main()
    data = json.loads(out.read_text())
    assert data["config"]["steps"] == 4 and data["config"]["reps"] == 2
    for route in ("serve", "generate"):
        stats = data[route]
        assert stats["client_ms_median"] > 0
        assert stats["client_ms_median"] >= stats["server_ms_median"]
    assert data["serve_throughput"]["batch"] == 2
    assert data["serve_throughput"]["req_per_s_best"] > 0
    assert data["serve_throughput"]["npz_req_per_s_best"] > 0
    tail = data["serve_tail_under_load"]
    assert tail["concurrency"] == 3 and tail["requests"] == 9
    assert tail["errors"] == 0
    assert tail["p50_ms"] <= tail["p95_ms"] <= tail["p99_ms"] <= tail["max_ms"]
    assert tail["req_per_s"] > 0
    assert data["diverged_rows"] == 0  # tiny CPU run: no degenerate draws
    assert data["total_request_rows"] >= 2 * 2 + 3 * 2 + 9
    assert data["startup_s"] > 0 and data["git_sha"]
