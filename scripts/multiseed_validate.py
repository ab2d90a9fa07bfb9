"""Regenerate ``results/validation_multiseed.json`` (the unselected band).

For each scenario: load the shipped checkpoint, run the full
generate → vmapped-MPC-track → validate pipeline once per reporting
generation seed (50 seeds by default, 0–4 and 10–54 — kept UNSELECTED:
train-seed selection used gen seeds in the 5–9 range, which are excluded,
see ``scripts/seed_sweep.py``), and record mean/std/95% CI/values per
metric plus a provenance block per scenario.  The scoreboard headline in
PARITY.md is the mean ± 95% CI of this band.

Run it alone in ONE process (the tunnel warm-up note in CLAUDE.md).

Usage:
    python scripts/multiseed_validate.py                      # all four
    python scripts/multiseed_validate.py --scenarios sce1     # refresh one
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

METRICS = [
    "velocity_js_divergence", "rmse_frequency_points",
    "rmse_frequency_trajcount", "surface_rmse_with_zeros",
    "surface_rmse_no_zeros", "plane_centroid_rmse",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenarios", default="sce1,sce2,sce3,sce4")
    # 50 unselected seeds: 0-4 plus 10-54 (5-9 were used for train-seed
    # selection and stay out of the reporting band)
    ap.add_argument(
        "--gen-seeds",
        default=",".join(map(str, list(range(5)) + list(range(10, 55)))),
    )
    ap.add_argument("--data-root", default="/root/reference/DefensiveData")
    ap.add_argument("--ckpt-root", default="results/checkpoints")
    ap.add_argument("--out", default="results/validation_multiseed.json")
    args = ap.parse_args()

    from defensive_model_vae_tpu.utils.cache import enable_persistent_cache
    from defensive_model_vae_tpu.utils.reporting import band_stats, jsonable

    enable_persistent_cache()

    from defensive_model_vae_tpu import scenarios
    from defensive_model_vae_tpu.data import collect_csv_files
    from defensive_model_vae_tpu.pipeline import (
        generate_and_track, load_humans, provenance, validate,
    )
    from defensive_model_vae_tpu.train.checkpoint import load_checkpoint

    gens = [int(v) for v in args.gen_seeds.split(",")]
    # refresh only the requested scenarios, preserving the others' blocks
    doc = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            doc = json.load(f)
    prov = doc.get("provenance", {})

    for key in args.scenarios.split(","):
        sce = scenarios.get(key)
        ckpt_dir = os.path.join(args.ckpt_root, sce.key)
        params, cfg, manifest = load_checkpoint(ckpt_dir)
        csvs = collect_csv_files(os.path.join(args.data_root, sce.town))
        humans = load_humans(sce, csvs)
        per_seed = []
        for g in gens:
            t0 = time.time()
            traces, _ = generate_and_track(params, cfg, sce, csvs, seed=g)
            rep = validate(traces, humans, sce)
            per_seed.append(rep)
            print(f"{sce.key} gen seed {g}: js={rep['velocity_js_divergence']:.4f} "
                  f"surface={rep['surface_rmse_with_zeros']:.4f} "
                  f"({time.time() - t0:.1f}s)", flush=True)
        doc[sce.key] = {
            m: band_stats(r[m] for r in per_seed) for m in METRICS
        }
        notes = [
            f"multiseed band: gen seeds {','.join(map(str, gens))} (unselected; "
            "train-seed selection uses disjoint seeds — scripts/seed_sweep.py); "
            "checkpoint per manifest.json"
        ]
        if manifest.get("selection"):
            notes.append(f"checkpoint train seed {manifest.get('selected_seed')} "
                         f"({manifest['selection']})")
        prov[sce.key] = provenance(sce, -1, n_csvs=len(csvs), notes=notes)

    doc["provenance"] = prov
    with open(args.out, "w") as f:
        json.dump(jsonable(doc), f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
