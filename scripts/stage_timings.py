"""Regenerate ``results/stage_timings.json`` (the PARITY perf-table evidence
for the warm full-production loop).

Times, in ONE warm process (per the tunnel warm-up note in CLAUDE.md):
  - ``pipeline_<sce>``: the full generate → vmapped-MPC-track → validate
    loop per scenario, from the committed checkpoints (the
    ``pipeline.run_scenario`` path minus artifact writes);
  - ``multi_kernel_train_4x300``: all four scenario models trained in one
    grid-kernel launch;
  - ``dnda_sweep_21_episodes``: the whole SUT corpus sweep.

Each stage runs once untimed (compile/cache warm) and once timed.

Usage:
    python scripts/stage_timings.py [--out results/stage_timings.json]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    # deterministic Mosaic lowering -> persistent-cache hits for the
    # fused kernels (re-execs once if hash randomization is live)
    from defensive_model_vae_tpu.utils.cache import ensure_deterministic_hash_seed
    ensure_deterministic_hash_seed()
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/stage_timings.json")
    ap.add_argument("--data-root", default="/root/reference/DefensiveData")
    ap.add_argument("--sut-dir", default="/root/reference/SUT_Testing/collected_data")
    ap.add_argument("--ckpt-root", default="results/checkpoints")
    args = ap.parse_args()

    from defensive_model_vae_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from defensive_model_vae_tpu import scenarios
    from defensive_model_vae_tpu.data import collect_csv_files
    from defensive_model_vae_tpu.pipeline import (
        generate_and_track, load_humans, validate,
    )
    from defensive_model_vae_tpu.train.checkpoint import load_checkpoint
    from defensive_model_vae_tpu.utils.profiling import StageTimer
    from bench import _fresh_seed, _jittered_sut_copy

    timer = StageTimer()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    for key in scenarios.REGISTRY:
        sce = scenarios.get(key)
        params, cfg, _ = load_checkpoint(os.path.join(args.ckpt_root, key))
        csvs = collect_csv_files(os.path.join(args.data_root, sce.town))
        humans = load_humans(sce, csvs)
        # warm rep (compile + tunnel), then the timed rep — BOTH with
        # OS-entropy generation seeds: the tunnel's identical-repeat
        # result elision is cross-process, fixed seeds for the committed
        # checkpoints have certainly run before, and an elided warm rep
        # would leave the executable load charged to the timed rep
        # (CLAUDE.md hazards)
        generate_and_track(params, cfg, sce, csvs, seed=_fresh_seed())
        with timer.stage(f"pipeline_{key}"):
            # sub-stage attribution rides the same timed run: <key>_conditions
            # (host pandas), <key>_generate (device sampling), <key>_track
            # (vmapped MPC), <key>_validate (host metrics)
            traces, _ = generate_and_track(
                params, cfg, sce, csvs, seed=_fresh_seed(), timer=timer
            )
            with timer.stage(f"{key}_validate"):
                validate(traces, humans, sce)

    corpora = {
        k: np.load(os.path.join(here, "fixtures", f"trajectory_{k}_cond.npy"))
        for k in scenarios.REGISTRY
    }
    from defensive_model_vae_tpu.ops import fused_train_multi

    fused_train_multi(corpora, epochs=300, seed=_fresh_seed())  # warm
    with timer.stage("multi_kernel_train_4x300"):
        fused_train_multi(corpora, epochs=300, seed=_fresh_seed())

    if os.path.isdir(args.sut_dir):
        import tempfile

        from defensive_model_vae_tpu.dnda import score_directory

        # warm on one value-jittered copy, TIME a copy jittered with an
        # OS-entropy eps (2^30 values, structurally distinct from the warm
        # 1e-3) — the real corpus is byte-identical every invocation and
        # the tunnel's result cache is cross-process (CLAUDE.md hazards);
        # shapes/executables/per-frame compute match
        with tempfile.TemporaryDirectory() as tmp:
            _jittered_sut_copy(args.sut_dir, os.path.join(tmp, "warm"))
            score_directory(os.path.join(tmp, "warm"))
            timed = os.path.join(tmp, "timed")
            _jittered_sut_copy(args.sut_dir, timed, eps=2e-3 + 1e-12 * _fresh_seed())
            with timer.stage("dnda_sweep_21_episodes"):
                score_directory(timed)

    timer.dump(args.out)
    for name, row in timer.report().items():
        print(f"{name}: {row['seconds']:.2f}s")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
