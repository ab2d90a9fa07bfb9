"""Command-line interface.

Replaces the reference's edit-the-__main__-block workflow
(``Training_VAE.py:272-314``, ``Distribution.py:394-402``, …) with explicit
subcommands:

    defvae dataset   --scenario sce1 --data-root ... --out windows.npy
    defvae train     --scenario sce1 --windows windows.npy --ckpt ckpt/
    defvae generate  --ckpt ckpt/ --start-x -193.3 --start-y 50 -n 5
    defvae pipeline  --ckpt ckpt/ --scenario sce1 --data-root ... --out out/
    defvae validate  --scenario sce1 --tracked-dir ... --data-root ...
    defvae dnda      --scenario sce1 --csv episode.csv
    defvae metrics   --scenario sce1 --csv episode.csv --metric TTC
    defvae writeback --npy tracked.npy --data-root ... --out-dir out/
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _cmd_dataset(args):
    from .data import build_dataset, save_windows

    arr = build_dataset(
        args.data_root, args.scenario, args.points,
        dataset_variant=getattr(args, "variant", "shipped"),
    )
    save_windows(arr, args.out)
    print(f"saved {arr.shape} windows to {args.out}")


def _cmd_train(args):
    from .models import CVAEConfig
    from .train import TrainConfig, train
    from .train.checkpoint import save_checkpoint

    windows = np.load(args.windows)
    tc = TrainConfig(epochs=args.epochs, lr=args.lr, seed=args.seed)
    if args.fused:
        from .ops import fused_train

        params, hist = fused_train(
            windows, epochs=args.epochs, lr=args.lr, seed=args.seed
        )
    else:
        mesh = None
        if args.mesh:
            from .parallel import create_mesh

            mesh = create_mesh()
        params, hist = train(windows, train_cfg=tc, mesh=mesh)
    cfg = CVAEConfig(seq_len=windows.shape[1], dim=windows.shape[2])
    save_checkpoint(args.ckpt, params, cfg, args.scenario, hist)
    print(
        f"trained {args.epochs} epochs; final loss {hist['total'][-1]:.4f}; "
        f"checkpoint at {args.ckpt}"
    )


def _cmd_generate(args):
    from .generate import load_and_generate

    out = load_and_generate(args.ckpt, args.start_x, args.start_y, args.n, args.seed)
    if args.out:
        np.save(args.out, out)
        print(f"saved {np.asarray(out).shape} to {args.out}")
    else:
        print(np.asarray(out))


def _cmd_pipeline(args):
    from .pipeline import run_scenario

    report = run_scenario(
        args.ckpt, args.scenario, args.data_root, args.out, seed=args.seed
    )
    print(json.dumps(report, indent=2))


def _cmd_validate(args):
    from .data import collect_csv_files
    from . import scenarios
    from .pipeline import load_humans, load_tracked, validate

    sce = scenarios.get(args.scenario)
    tracked = load_tracked(args.tracked_dir, sce.key)
    csvs = collect_csv_files(os.path.join(args.data_root, sce.town))
    humans = load_humans(sce, csvs)
    print(json.dumps(validate(tracked, humans, sce), indent=2))


def _cmd_dnda(args):
    from .dnda import process_episode

    res = process_episode(
        args.csv, args.scenario, max_frames=args.max_frames, device=args.device
    )
    print(json.dumps({"frames": res.frames, "dnda": res.dnda, "max_dnda": res.max_dnda}))


def _cmd_dnda_sweep(args):
    from .dnda import score_directory

    rows = score_directory(
        args.dir, out_csv=args.out, processes=args.processes,
        device=not args.host,
    )
    print(json.dumps(rows, indent=2))


def _cmd_metrics(args):
    from .metrics import compute_metric

    out = compute_metric(args.csv, args.scenario, args.metric)
    col = args.metric.upper()
    vals = out[col].to_numpy(float)
    finite = vals[np.isfinite(vals)]
    print(
        json.dumps(
            {
                "metric": col,
                "rows": len(out),
                "valid": int(len(finite)),
                "mean": float(np.mean(finite)) if len(finite) else None,
                "min": float(np.min(finite)) if len(finite) else None,
                "max": float(np.max(finite)) if len(finite) else None,
            }
        )
    )


def _cmd_import(args):
    from .train.torch_import import import_to_checkpoint

    d = import_to_checkpoint(args.pth, args.ckpt)
    print(f"imported {args.pth} -> {d}")


def _cmd_writeback(args):
    from .sut import writeback_npy_to_csv

    out = writeback_npy_to_csv(args.npy, args.data_root, args.out_dir)
    print(f"saved {out}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="defvae", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("dataset", help="extract trajectory windows from CSVs")
    d.add_argument("--scenario", required=True)
    d.add_argument("--data-root", required=True)
    d.add_argument("--out", required=True)
    d.add_argument("--points", type=int, default=10)
    d.add_argument(
        "--variant", choices=("shipped", "artifact"), default="shipped",
        help="extraction predicate set: 'shipped' reproduces the reference's "
        "npy datasets; 'artifact' uses the predicates the published results "
        "were trained with (sce1: ego_y>=40)",
    )
    d.set_defaults(fn=_cmd_dataset)

    t = sub.add_parser("train", help="train a scenario CVAE")
    t.add_argument("--scenario", required=True)
    t.add_argument("--windows", required=True)
    t.add_argument("--ckpt", required=True)
    t.add_argument("--epochs", type=int, default=3000)
    t.add_argument("--lr", type=float, default=1e-3)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--mesh", action="store_true", help="data-parallel mesh")
    t.add_argument(
        "--fused", action="store_true",
        help="whole-run fused Pallas kernel (fastest on TPU)",
    )
    t.set_defaults(fn=_cmd_train)

    g = sub.add_parser("generate", help="sample trajectories from a checkpoint")
    g.add_argument("--ckpt", required=True)
    g.add_argument("--start-x", type=float, required=True)
    g.add_argument("--start-y", type=float, required=True)
    g.add_argument("-n", type=int, default=1)
    g.add_argument("--seed", type=int, default=0)
    g.add_argument("--out")
    g.set_defaults(fn=_cmd_generate)

    pl = sub.add_parser("pipeline", help="generate+track+validate a scenario")
    pl.add_argument("--ckpt", required=True)
    pl.add_argument("--scenario", required=True)
    pl.add_argument("--data-root", required=True)
    pl.add_argument("--out", required=True)
    pl.add_argument("--seed", type=int, default=0)
    pl.set_defaults(fn=_cmd_pipeline)

    v = sub.add_parser("validate", help="metric sweep over tracked traces")
    v.add_argument("--scenario", required=True)
    v.add_argument("--tracked-dir", required=True)
    v.add_argument("--data-root", required=True)
    v.set_defaults(fn=_cmd_validate)

    dn = sub.add_parser("dnda", help="DNDA risk scoring of an episode CSV")
    dn.add_argument("--scenario", required=True)
    dn.add_argument("--csv", required=True)
    dn.add_argument("--max-frames", type=int, default=None)
    dn.add_argument(
        "--device", action="store_true",
        help="batch the SAT collision sweep on the accelerator "
        "(identical results to the host path)",
    )
    dn.set_defaults(fn=_cmd_dnda)

    ds = sub.add_parser("dnda-sweep", help="score every SUT episode in a directory")
    ds.add_argument("--dir", required=True)
    ds.add_argument("--out", default=None, help="summary CSV path")
    ds.add_argument("--processes", type=int, default=None)
    ds.add_argument(
        "--host", action="store_true",
        help="score end-to-end on the host process pool (numpy sweep — the "
        "oracle path) instead of the default batched device sweep",
    )
    ds.set_defaults(fn=_cmd_dnda_sweep)

    m = sub.add_parser("metrics", help="TTC/PET/JERK on an episode CSV")
    m.add_argument("--scenario", required=True)
    m.add_argument("--csv", required=True)
    m.add_argument("--metric", default="TTC")
    m.set_defaults(fn=_cmd_metrics)

    im = sub.add_parser("import", help="convert a reference .pth checkpoint")
    im.add_argument("--pth", required=True)
    im.add_argument("--ckpt", required=True)
    im.set_defaults(fn=_cmd_import)

    wb = sub.add_parser("writeback", help="inject tracked npy into source CSV")
    wb.add_argument("--npy", required=True)
    wb.add_argument("--data-root", required=True)
    wb.add_argument("--out-dir", required=True)
    wb.set_defaults(fn=_cmd_writeback)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
