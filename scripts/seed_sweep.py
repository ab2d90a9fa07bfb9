"""Train-seed selection sweep (replaces the ad-hoc round-2 selection runs).

For each candidate train seed: train the scenario CVAE, then evaluate the
full generate → vmapped-MPC-track → validate pipeline on SELECTION
generation seeds (kept disjoint from the reporting seeds used by
``results/validation_multiseed.json`` so reported bands stay unselected).

Trainer choice: candidates train with ``train.train`` (the scan trainer)
because the committed checkpoints do — a selected seed only transfers if
the final checkpoint reuses the candidate's exact PRNG stream.  For
throughput-oriented sweeps where the sweep's own params ARE the product,
``ops.fused_train_seeds`` trains every candidate in one compiled pipelined sweep
(32×3000 epochs ≈ 3 s wall); the evaluate stage (generate+track per
candidate) dominates either way.
Scoring (``score_candidate``/``rank_candidates``): number of published
best metrics (JS, RMSE_frequency trajcount, surface RMSE with/without
zeros — ``JS_divergence.txt``) beaten by the selection-seed MEAN,
tie-broken maximin: the widest worst-case relative margin over the four
metrics wins (any non-finite mean ranks the candidate last).

Beyond train seeds, the candidate grid optionally spans training-recipe
dimensions (all scored by the same selection-seed protocol): ``--lr`` and
``--kld`` lists, and ``--point-mode normal,extend_mid`` (the reference's
midpoint-augmentation dataset builder, ``Traj_Data_Process.py:106-121`` —
the extend_mid corpus appends the ceil-midpoint windows to the normal
ones).  ``--band-eval-top K`` re-trains the top-K ranked candidates and
evaluates them on the UNSELECTED reporting band, recording mean/CI per
metric in the output JSON — a disclosed shortlist (the PARITY scoreboard
discloses shortlist-on-band evaluation wherever it was used).

Usage:
    python scripts/seed_sweep.py --scenario sce4 --train-seeds 0:128 \
        --select-gen-seeds 5,6,8 --out results/seed_sweep_sce4.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the published-best values per scenario live in the scenario registry
# (Scenario.published_best, cited to results/ModelValidation/JS_divergence.txt)
METRICS = [
    "velocity_js_divergence", "rmse_frequency_trajcount",
    "surface_rmse_with_zeros", "surface_rmse_no_zeros",
]


def parse_seed_spec(spec: str) -> list[int]:
    """'0:70' / '59:110,29,13' → explicit seed list (ranges are half-open)."""
    seeds: list[int] = []
    for part in str(spec).split(","):
        if ":" in part:
            lo, hi = (int(v) for v in part.split(":"))
            seeds.extend(range(lo, hi))
        else:
            seeds.append(int(part))
    return seeds


def score_candidate(means: dict, pub: dict) -> tuple[int, float]:
    """(beats_published, worst relative margin) for one candidate.

    Maximin selection: the binding (smallest-margin) metric decides.
    builtin ``min()`` silently skips non-first NaNs, so any non-finite
    mean (e.g. every z-draw degenerate on some gen seed) must rank the
    candidate LAST (-inf), never by an optimistic partial margin.
    """
    # committed artifacts round-trip through reporting.jsonable, which
    # stores non-finite floats as null — read those back as NaN
    vals = {m: (float("nan") if means[m] is None else means[m])
            for m in METRICS}
    beaten = sum(vals[m] < pub[m] for m in METRICS)
    margins = [(pub[m] - vals[m]) / pub[m] for m in METRICS]
    worst = (min(margins) if all(np.isfinite(v) for v in margins)
             else float("-inf"))
    return beaten, worst


def rank_candidates(results: list[dict]) -> list[dict]:
    """Sort best-first: most published cells beaten, then widest worst margin."""
    return sorted(
        results, key=lambda r: (-r["beats_published"], -r["worst_margin"])
    )


def main():
    # deterministic Mosaic lowering -> persistent-cache hits for the
    # fused kernels (re-execs once if hash randomization is live)
    from defensive_model_vae_tpu.utils.cache import ensure_deterministic_hash_seed
    ensure_deterministic_hash_seed()
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenario", required=True)
    ap.add_argument("--train-seeds", default="0:70",
                    help="comma-separated start:stop ranges and/or single seeds, e.g. 0:70 or 59:110,29,13")
    ap.add_argument("--select-gen-seeds", default="5,6,8")
    ap.add_argument("--epochs", default="3000",
                    help="comma-separated epoch counts; each (epochs, seed) pair is a candidate")
    ap.add_argument("--lr", default="1e-3",
                    help="comma-separated learning rates (recipe dimension)")
    ap.add_argument("--kld", default="0.1",
                    help="comma-separated KLD loss weights (recipe dimension)")
    ap.add_argument("--point-mode", default="normal",
                    help="comma-separated corpus modes: normal (the --windows/"
                         "fixture corpus) and/or extend_mid (midpoint-augmented, "
                         "built from --data-root)")
    ap.add_argument("--band-eval-top", type=int, default=0,
                    help="re-train the top-K ranked candidates and evaluate on "
                         "the reporting band (disclosed shortlist)")
    ap.add_argument("--band-gen-seeds",
                    default=",".join(map(str, list(range(5)) + list(range(10, 75)))),
                    help="reporting-band gen seeds for --band-eval-top (default "
                         "the n=70 unselected band)")
    ap.add_argument("--track-chunk", type=int, default=0,
                    help="gen seeds per tracking program (0 = all in one; "
                         "smaller chunks ride out TPU-worker restarts)")
    ap.add_argument("--data-root", default="/root/reference/DefensiveData")
    ap.add_argument("--windows", default=None,
                    help="windows npy (default fixtures/trajectory_<sce>_cond.npy)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from defensive_model_vae_tpu.utils.cache import enable_persistent_cache
    from defensive_model_vae_tpu.utils.reporting import jsonable

    enable_persistent_cache()

    from defensive_model_vae_tpu import scenarios
    from defensive_model_vae_tpu.data import build_dataset, collect_csv_files
    from defensive_model_vae_tpu.models import CVAEConfig, LossWeights
    from defensive_model_vae_tpu.pipeline import (
        generate_and_track_multi, load_humans, validate,
    )
    from defensive_model_vae_tpu.train import TrainConfig, train

    sce = scenarios.get(args.scenario)
    pub = sce.published_best
    seeds = parse_seed_spec(args.train_seeds)
    gens = [int(v) for v in args.select_gen_seeds.split(",")]
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wpath = args.windows or os.path.join(here, "fixtures", f"trajectory_{sce.key}_cond.npy")
    corpora = {}
    for mode in args.point_mode.split(","):
        if mode == "normal":
            corpora[mode] = np.load(wpath)
        else:
            corpora[mode] = build_dataset(args.data_root, sce.key, point_mode=mode)
            print(f"built {mode} corpus: {corpora[mode].shape}", flush=True)
    csvs = collect_csv_files(os.path.join(args.data_root, sce.town))
    humans = load_humans(sce, csvs)
    cfg = CVAEConfig(
        seq_len=next(iter(corpora.values())).shape[1],
        dim=next(iter(corpora.values())).shape[2],
    )

    epoch_counts = [int(v) for v in str(args.epochs).split(",")]
    lrs = [float(v) for v in str(args.lr).split(",")]
    klds = [float(v) for v in str(args.kld).split(",")]

    def train_candidate(mode, lr, kld, n_epochs, ts):
        tc = TrainConfig(
            epochs=n_epochs, lr=lr, seed=ts,
            weights=LossWeights(kld=kld),
        )
        return train(corpora[mode], train_cfg=tc)

    def eval_candidate(params, gen_seeds):
        # all gen seeds in ONE tracking program by default (ulp-equivalent
        # to per-seed calls —
        # test_pipeline.py::test_generate_and_track_multi_matches_per_seed);
        # --track-chunk N splits into N-seed programs — shorter device
        # executions ride out TPU-worker restarts (same rationale as
        # multiseed_validate.py --chunk)
        chunk = args.track_chunk or len(gen_seeds)
        per_gen = {}
        for i in range(0, len(gen_seeds), chunk):
            part = gen_seeds[i:i + chunk]
            tracked = generate_and_track_multi(params, cfg, sce, csvs, seeds=part)
            for g in part:
                rep = validate(tracked[g][0], humans, sce)
                per_gen[g] = {m: rep[m] for m in METRICS}
        return per_gen

    results = []
    grid = [
        (mode, lr, kld, e, s)
        for mode in corpora
        for lr in lrs
        for kld in klds
        for e in epoch_counts
        for s in seeds
    ]
    for mode, lr, kld, n_epochs, ts in grid:
        t0 = time.time()
        params, hist = train_candidate(mode, lr, kld, n_epochs, ts)
        per_gen = eval_candidate(params, gens)
        means = {m: float(np.mean([per_gen[g][m] for g in gens])) for m in METRICS}
        # maximin relative margin vs published: selection-seed noise is
        # large relative to a thin margin, so maximizing the worst margin
        # transfers to the unselected reporting band far better than any
        # single metric
        beaten, worst_margin = score_candidate(means, pub)
        results.append({
            "train_seed": ts, "epochs": n_epochs, "lr": lr, "kld_weight": kld,
            "point_mode": mode,
            "final_loss": float(hist["total"][-1]),
            "means": means, "per_gen": per_gen, "beats_published": beaten,
            "worst_margin": worst_margin,
        })
        print(
            f"{mode} lr{lr:g} kld{kld:g} seed {ts:3d} ep{n_epochs}: "
            f"beats {beaten}/4  "
            + "  ".join(f"{m.split('_')[-1]}={means[m]:.4f}" for m in METRICS)
            + f"  ({time.time() - t0:.1f}s)",
            flush=True,
        )

    results = rank_candidates(results)
    best = results[0]
    print(f"\nBEST candidate {best['point_mode']} lr{best['lr']:g} "
          f"kld{best['kld_weight']:g} seed {best['train_seed']}: beats "
          f"{best['beats_published']}/4, worst margin "
          f"{best['worst_margin']:+.3f}, means {best['means']}")

    band_eval = None
    if args.band_eval_top > 0:
        from defensive_model_vae_tpu.utils.reporting import band_stats

        band_seeds = [int(v) for v in args.band_gen_seeds.split(",")]
        band_eval = []
        for cand in results[: args.band_eval_top]:
            params, _ = train_candidate(
                cand["point_mode"], cand["lr"], cand["kld_weight"],
                cand["epochs"], cand["train_seed"],
            )
            t0 = time.time()
            per_gen = eval_candidate(params, band_seeds)
            stats = {
                m: band_stats([per_gen[g][m] for g in band_seeds])
                for m in METRICS
            }
            band_eval.append({
                k: cand[k]
                for k in ("train_seed", "epochs", "lr", "kld_weight", "point_mode")
            } | {"band": stats})
            print(
                f"band[{cand['point_mode']} lr{cand['lr']:g} kld"
                f"{cand['kld_weight']:g} seed {cand['train_seed']}] "
                + "  ".join(
                    f"{m.split('_')[-1]}={stats[m]['mean']:.4f}"
                    f"±{stats[m]['ci95_halfwidth']:.4f}" for m in METRICS
                )
                + f"  ({time.time() - t0:.1f}s)",
                flush=True,
            )

    if args.out:
        doc = {
            "scenario": sce.key,
            "train_seeds": seeds,
            "select_gen_seeds": gens,
            "epochs": epoch_counts,
            "lr": lrs,
            "kld": klds,
            "point_mode": sorted(corpora),
            "published_best": pub,
            "ranked": results,
        }
        if band_eval is not None:
            doc["band_gen_seeds"] = band_seeds
            doc["band_eval"] = band_eval
        with open(args.out, "w") as f:
            json.dump(jsonable(doc), f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
