"""Run every BASELINE.json benchmark config and emit one JSON report.

Usage: python scripts/run_baseline_configs.py [--out results/baseline_configs.json]

Configs (see BASELINE.json / PARITY.md):
  1. Dense VAE on StaticBlindTown05 (reference single-scenario run)
  2. Full four-scenario corpus, batched training + generation
  3. Conv1D VAE over long-horizon windows
  4. Conditional VAE on scenario class + THW
  5. End-to-end: sampling → vmapped MPC → validation
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")


def main():
    # deterministic Mosaic lowering -> persistent-cache hits for the
    # fused kernels (re-execs once if hash randomization is live)
    from defensive_model_vae_tpu.utils.cache import ensure_deterministic_hash_seed
    ensure_deterministic_hash_seed()
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/baseline_configs.json")
    ap.add_argument("--epochs", type=int, default=3000)
    ap.add_argument(
        "--data-root", default="/root/reference/DefensiveData",
        help="raw CSV corpus for config 5 (skipped if absent)",
    )
    args = ap.parse_args()

    from defensive_model_vae_tpu import scenarios
    from defensive_model_vae_tpu.data import generate_random_trajectories
    from defensive_model_vae_tpu.data.features import build_conditioned_corpus
    from defensive_model_vae_tpu.generate import generate_trajectories
    from defensive_model_vae_tpu.models import CVAEConfig
    # timed reps draw their seeds from OS entropy: the tunnel's
    # identical-repeat result elision is CROSS-PROCESS, so a fixed seed
    # re-times the cache on every rerun (CLAUDE.md measurement hazards);
    # each drawn seed is recorded in the report for provenance
    from bench import _fresh_seed
    from defensive_model_vae_tpu.train import TrainConfig, train_conditioned, train_conv

    windows = {
        k: np.load(os.path.join(FIXTURES, f"trajectory_{k}_cond.npy"))
        for k in scenarios.REGISTRY
    }
    report = {}

    # Absorb the per-process tunnel warm-up with an UNTIMED rep of config
    # 1's own program (CLAUDE.md: the first REAL executable load of a
    # fresh process can take minutes even on a cache hit; a trivial probe
    # jit does NOT trigger it — measured 1.4 s probe vs 250 s landing on
    # the first fused-kernel load anyway).  config 1 then reports the
    # warm per-run time, with the warm-up+compile recorded separately.

    # ---- config 1: dense VAE on sce1 (fused kernel; scan fallback) ----
    t0 = time.time()
    s1 = _fresh_seed()
    try:
        from defensive_model_vae_tpu.ops import fused_train as _train1a

        # warm-up + compile with an entropy seed too: an elided warm-up
        # would never load the executable, charging the load to the timed
        # rep and zeroing the recorded warmup_and_compile_s
        _train1a(windows["sce1"], epochs=args.epochs, seed=s1 + 7)
        warmup = time.time() - t0
        t0 = time.time()
        params1, hist1 = _train1a(windows["sce1"], epochs=args.epochs, seed=s1)
        trainer = "pallas-fused"
    except Exception:
        from defensive_model_vae_tpu.train import train as _scan

        # time ONLY the scan warm-up: t0 may predate a failed fused
        # attempt (warm-up or timed), which must not inflate warmup
        t0 = time.time()
        _scan(windows["sce1"], train_cfg=TrainConfig(epochs=args.epochs, seed=s1 + 7))
        warmup = time.time() - t0
        t0 = time.time()
        params1, hist1 = _scan(
            windows["sce1"], train_cfg=TrainConfig(epochs=args.epochs, seed=s1)
        )
        trainer = "xla-scan"
    report["config1_dense_sce1"] = {
        "trainer": trainer,
        "warmup_and_compile_s": round(warmup, 2),
        "seconds_warm": round(time.time() - t0, 2),
        "final_loss": float(hist1["total"][-1]),
        "timing_seed": s1,
    }

    # ---- config 2: four-scenario corpus, one program ----
    t0 = time.time()
    s2 = _fresh_seed()
    try:
        from defensive_model_vae_tpu.ops import fused_train_multi

        params_by, hist_by = fused_train_multi(windows, epochs=args.epochs, seed=s2)
        mode = "pallas-grid (one kernel launch)"
    except Exception:
        from defensive_model_vae_tpu.train import train_multi_scenario

        params_by, hist_by = train_multi_scenario(
            windows, TrainConfig(epochs=args.epochs, seed=s2)
        )
        mode = "vmap (one device program)"
    cfg = CVAEConfig()
    gen = generate_trajectories(
        params_by["sce1"], cfg, windows["sce1"][:, 0, 1:3], n_samples=4, seed=0
    )
    report["config2_four_scenarios"] = {
        "mode": mode,
        "seconds_incl_compile": round(time.time() - t0, 2),
        "final_losses": {k: float(h["total"][-1]) for k, h in hist_by.items()},
        "generated_shape": list(np.asarray(gen).shape),
        "timing_seed": s2,
    }

    # ---- config 3: Conv1D VAE over long windows ----
    t0 = time.time()
    s3 = _fresh_seed()
    long_windows = generate_random_trajectories(256, 50, 5.0, seed=0).astype(np.float32)
    _, hist3, cfg3 = train_conv(long_windows, train_cfg=TrainConfig(epochs=500, seed=s3))
    report["config3_conv_long_windows"] = {
        "window_shape": [50, 2],
        "seconds_incl_compile": round(time.time() - t0, 2),
        "loss_first": float(hist3["total"][0]),
        "loss_final": float(hist3["total"][-1]),
        "timing_seed": s3,
    }

    # ---- config 4: scenario-class + THW conditioned corpus ----
    t0 = time.time()
    # trial suffixes from the raw corpus when mounted — sce4's THW
    # distance is suffix-dependent (window_trial_suffixes docstring).
    # NOTE the fixtures keep the round-1 row permutation (frozen training
    # provenance), so suffixes only align for fixture sets that match the
    # canonical build_dataset enumeration; fall back to defaults otherwise.
    suffixes = None
    if os.path.isdir(args.data_root):
        from defensive_model_vae_tpu.data import build_dataset
        from defensive_model_vae_tpu.data.features import window_trial_suffixes

        suffixes = {}
        for k, w in windows.items():
            canonical = build_dataset(args.data_root, k)
            if canonical.shape == w.shape and np.array_equal(canonical, w):
                suffixes[k] = window_trial_suffixes(args.data_root, k)
    corpus, extra = build_conditioned_corpus(
        windows, suffixes_by_scenario=suffixes
    )
    s4 = _fresh_seed()
    _, hist4, cfg4 = train_conditioned(
        corpus, extra, TrainConfig(epochs=args.epochs, seed=s4)
    )
    report["config4_conditioned"] = {
        "corpus_size": int(corpus.shape[0]),
        "cond_dim": cfg4.cond_dim,
        "seconds_incl_compile": round(time.time() - t0, 2),
        "final_loss": float(hist4["total"][-1]),
        "timing_seed": s4,
    }

    # ---- config 5: end-to-end generate → track → validate ----
    if os.path.isdir(args.data_root):
        from defensive_model_vae_tpu import scenarios
        from defensive_model_vae_tpu.data import collect_csv_files
        from defensive_model_vae_tpu.pipeline import generate_and_track, load_humans, validate

        t0 = time.time()
        s5 = _fresh_seed()
        sce = scenarios.get("sce2")
        csvs = collect_csv_files(os.path.join(args.data_root, sce.town))
        traces, _ = generate_and_track(params_by["sce2"], cfg, sce, csvs, seed=s5)
        humans = load_humans(sce, csvs)
        rep = validate(traces, humans, sce)
        rep["seconds"] = round(time.time() - t0, 2)
        rep["timing_seed"] = s5
        report["config5_end_to_end_sce2"] = rep
    else:
        report["config5_end_to_end_sce2"] = "skipped (data root absent)"

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
