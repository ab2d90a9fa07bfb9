"""Selection-free robustness row for the PARITY scoreboard.

The headline scoreboard reports the SELECTED train-seed checkpoint on an
unselected 70-gen-seed band (PARITY "Published-metric scoreboard").  This
script adds the complementary, selection-free view from the committed
train-seed sweeps (``results/seed_sweep_*.json``): per cell, the MEDIAN
train seed's mean metric and the fraction of train seeds beating the
published value — showing which cells the method wins without any seed
selection at all, and which wins depend on it.

Host-only (no device work): every number is already in the committed sweep
artifacts.  Per scenario the rows come from the same recipe the shipped
checkpoint used:

- sce1: seed_sweep_sce1_a + _b merged (110 distinct train seeds, 3000
  epochs), deduped by train seed
- sce2 / sce3: the 110-train-seed sweeps
- sce4: seed_sweep_sce4_recipe filtered to the checkpoint manifest's
  selected recipe (epochs/lr/kld/point_mode — 8 train seeds)

Caveat recorded in the artifact: sweep means are over the 3 SELECTION gen
seeds (5/6/8), i.e. noisy 3-sample estimates of each train seed's true
mean — good enough for a median across 8-110 seeds, not comparable to the
n=70 reporting band's precision.

Writes results/robustness_row.json and prints the markdown table.
"""

import json
import os
import statistics
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(HERE, "results")

METRICS = (
    "velocity_js_divergence",
    "rmse_frequency_trajcount",
    "surface_rmse_with_zeros",
    "surface_rmse_no_zeros",
)


def _load(name):
    with open(os.path.join(RESULTS, f"seed_sweep_{name}.json")) as f:
        return json.load(f)


def _sce1_rows():
    """Merge the two sce1 sweep halves (0-58 and 9-109), deduped by train
    seed — identical recipe (3000 epochs, gen seeds 5/6/8), so overlapping
    seeds are the same deterministic run."""
    a, b = _load("sce1_a"), _load("sce1_b")
    by_seed = {}
    for r in a["ranked"] + b["ranked"]:
        by_seed.setdefault(r["train_seed"], r)
    return list(by_seed.values()), a["published_best"], "sce1_a + sce1_b merged"


def _sce4_rows():
    """Filter the 144-candidate recipe sweep to the SHIPPED recipe (the
    checkpoint manifest's epochs/lr/kld/point_mode) — the method whose
    robustness is being reported."""
    with open(os.path.join(RESULTS, "checkpoints", "sce4", "manifest.json")) as f:
        recipe = json.load(f)["recipe"]
    d = _load("sce4_recipe")
    rows = [
        r for r in d["ranked"]
        if (r["epochs"], r["lr"], r["kld_weight"], r["point_mode"])
        == (recipe["epochs"], recipe["lr"], recipe["kld_weight"],
            recipe["point_mode"])
    ]
    src = (f"sce4_recipe filtered to shipped recipe (epochs="
           f"{recipe['epochs']}, lr={recipe['lr']}, kld="
           f"{recipe['kld_weight']}, {recipe['point_mode']})")
    return rows, d["published_best"], src


def build():
    sources = {
        "sce1": _sce1_rows,
        "sce2": lambda: (_load("sce2")["ranked"],
                         _load("sce2")["published_best"], "sce2 sweep"),
        "sce3": lambda: (_load("sce3")["ranked"],
                         _load("sce3")["published_best"], "sce3 sweep"),
        "sce4": _sce4_rows,
    }
    out = {
        "note": (
            "Selection-free robustness: per cell, the MEDIAN train seed's "
            "mean metric across the committed sweep (means over selection "
            "gen seeds 5/6/8 — 3-sample estimates, not the n=70 reporting "
            "band), and the fraction of train seeds whose mean beats the "
            "published value.  Complements the selected-checkpoint "
            "scoreboard: cells with median_beats=true are won by the "
            "method without any train-seed selection."
        ),
        "scenarios": {},
    }
    for sce, fn in sources.items():
        rows, pub, src = fn()
        cells = {}
        for m in METRICS:
            vals = [
                r["means"][m] for r in rows
                if r.get("means") and r["means"].get(m) is not None
                and r["means"][m] == r["means"][m]
            ]
            med = statistics.median(vals)
            beat = sum(1 for v in vals if v < pub[m])
            cells[m] = {
                "median": med,
                "published": pub[m],
                "median_beats": med < pub[m],
                "seeds_beating": beat,
                "n_seeds": len(vals),
            }
        out["scenarios"][sce] = {"source": src, "n_rows": len(rows),
                                 "cells": cells}
    return out


def main():
    out = build()
    path = os.path.join(RESULTS, "robustness_row.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    # markdown table for PARITY
    short = {
        "velocity_js_divergence": "JS divergence",
        "rmse_frequency_trajcount": "RMSE_frequency (trajcount)",
        "surface_rmse_with_zeros": "Surface RMSE (incl. zeros)",
        "surface_rmse_no_zeros": "Surface RMSE (excl. zeros)",
    }
    print("| Metric (median train seed / published; seeds beating) "
          "| sce1 | sce2 | sce3 | sce4 |")
    print("|---|---|---|---|---|")
    for m in METRICS:
        cols = []
        for sce in ("sce1", "sce2", "sce3", "sce4"):
            c = out["scenarios"][sce]["cells"][m]
            v = f"{c['median']:.3f}"
            v = f"**{v}**" if c["median_beats"] else v
            cols.append(f"{v} / {c['published']:.3f} "
                        f"({c['seeds_beating']}/{c['n_seeds']})")
        print(f"| {short[m]} | " + " | ".join(cols) + " |")
    n_beat = sum(
        c["median_beats"]
        for s in out["scenarios"].values() for c in s["cells"].values()
    )
    print(f"\nmedian-train-seed cells beating published: {n_beat}/16",
          file=sys.stderr)
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
