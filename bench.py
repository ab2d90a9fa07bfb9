"""Benchmark harness.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: trajectory windows/sec/chip for the full reference
training configuration (sce1 corpus, 3000 epochs, full batch) on this
framework, versus a live-measured torch-CPU baseline implementing the
same model/loss/optimizer (the reference's own configuration —
``Training_VAE.py:272-306`` — runs torch on CPU).

Extra detail goes to stderr; stdout carries only the JSON line.
"""

import json
import os
import sys
import time

import numpy as np

# persistent compilation cache: cuts the cold fused-kernel compile from
# minutes to seconds on repeat runs (works through the axon remote-compile
# tunnel; verified 127s → 39s across processes).  The shared helper fails
# closed on CPU-only platforms (host-specific XLA:CPU AOT entries).
try:
    from defensive_model_vae_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
except Exception:
    pass

# Fallback torch-CPU training rate (windows/s) used when the live baseline
# is skipped (--warm-only) or fails; recorded on this image's CPU, 2026-08.
RECORDED_TORCH_CPU_RATE = 5600.0


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _median(ts):
    import statistics

    return statistics.median(ts)


def _load_prev_bench(here=None):
    """Parsed dict of the latest successful BENCH_r*.json (the driver's
    record of the previous round), or None — the baseline for the
    cross-round drift report."""
    import glob
    import re

    if here is None:
        here = os.path.dirname(os.path.abspath(__file__))
    rounds = []
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m:
            rounds.append((int(m.group(1)), path))
    # newest round first, but skip failed records (the driver writes
    # "parsed": null with rc/tail fields when a round's bench errored) —
    # fall back to the last GOOD baseline instead of silently disabling
    # the drift report for the round after a failure
    for rnd, path in sorted(rounds, reverse=True):
        try:
            with open(path) as f:
                rec = json.load(f)
            # valid-JSON non-dict records (null / list / bare string from a
            # partial driver write) must be skipped, not crash the drift
            # report at the end of a full bench run
            parsed = rec.get("parsed", rec) if isinstance(rec, dict) else None
        except Exception:
            continue
        if isinstance(parsed, dict) and parsed:
            return parsed, f"r{rnd:02d}"
    return None, None


# ---- drift-key lifecycle (one data-driven table per the r04 verdict) ----
# Every timing-series key a PRIOR round's BENCH record carries must be
# (a) still produced and listed in _DRIFT_KEYS, (b) the old side of a
# rename in _DRIFT_ALIASES, or (c) explicitly retired in _RETIRED_KEYS.
# tests/test_scripts.py::test_drift_key_lifecycle_covers_all_rounds
# enforces this against the committed BENCH_r*.json series.

# headline keys compared each round (base names; *_median preferred when
# both rounds carry it)
_DRIFT_KEYS = [
    "value", "value_sync", "scale_windows_per_sec",
    "scale_bf16_windows_per_sec", "scale_fused_windows_per_sec",
    "scale_fused_manual_prng_windows_per_sec",
    "scale_fused_autodiff_windows_per_sec", "seed_grid_32x3000_s",
    "dnda_sweep_21ep_s", "mpc_corpus_38path_s",
    # secondary BASELINE.json configs, tracked per-round from r05 on
    # (skipped under --warm-only; drift comparison tolerates absence)
    "conv_long_windows_per_sec", "conditioned_windows_per_sec",
]

# keys that RENAMED between rounds: new_key -> old_key to compare against.
# A rename also implies a redefinition skip: when prev predates the rename
# (it lacks new_key), prev[old_key] holds the OLD definition, so the
# direct old_key-vs-old_key comparison is suppressed for that round pair.
_DRIFT_ALIASES = {
    # r03's scale_fused headline was the prng+manual kernel; the headline
    # is now the hbm production default, and the prng+manual series
    # continues under its own key
    "scale_fused_manual_prng_windows_per_sec": "scale_fused_windows_per_sec",
}

# keys from prior rounds that are intentionally no longer produced
_RETIRED_KEYS = set()


def _drift_report(result):
    """Compare this round's headline keys against the previous BENCH_r*.json
    and flag >20% moves (CLAUDE.md documents a ~2x Pallas lowering spread;
    where both rounds carry a ``*_median`` the comparison uses it — best-of-N
    of a 2x-spread quantity drifts spuriously, which is what the medians
    were added to damp)."""
    prev, tag = _load_prev_bench()
    if prev is None:
        return None
    flags = {}
    for k in _DRIFT_KEYS:
        old_k = k if k in prev else _DRIFT_ALIASES.get(k)
        if k not in result or old_k is None or old_k not in prev:
            continue
        if any(ok == k and nk not in prev for nk, ok in _DRIFT_ALIASES.items()):
            # prev predates the rename, so prev[k] holds the OLD definition
            # (e.g. r03's scale_fused headline was the prng kernel, now a
            # separate series) — comparing across definitions would flag a
            # rename as a perf move
            continue
        base, label = k, k
        if f"{k}_median" in result and f"{old_k}_median" in prev:
            k, old_k, label = f"{k}_median", f"{old_k}_median", f"{k} (median)"
        new, old = float(result[k]), float(prev[old_k])
        if old == 0:
            continue
        ratio = new / old
        line = f"drift vs {tag} {label}: {old:.4g} -> {new:.4g} ({ratio:.2f}x)"
        if not 0.8 <= ratio <= 1.25:
            line += "  ** >20% move **"
            flags[base] = round(ratio, 3)
            if base == "value_sync" and "value" not in flags:
                # sync per-call time charges a full tunnel round-trip
                # (load-dependent tens-to-hundreds of ms; measured 0.07-0.31 s
                # across hours for the same executable) to a ~0.023 s kernel,
                # so it flags whenever tunnel conditions shift between rounds.
                # With the pipelined `value` series steady the kernel itself
                # did not move — the key exists only for continuity with the
                # sync-timed BENCH_r01 series.
                line += "  [RTT-dominated; pipelined `value` steady -> tunnel noise]"
        _log(line)
    return {"vs": tag, "flagged": flags}


def _fresh_seed(lo=1 << 20):
    """OS-entropy seed base for TIMED calls.

    The axon tunnel elides re-execution of an (inputs, executable) pair it
    has already run — and the cache is CROSS-PROCESS: a fresh process
    re-running the identical scale bench read 0.00 s warm / 0.6 s cold
    against 1.24 s / 14.3 s honest minutes earlier (CLAUDE.md measurement
    hazards).  Fixed literal seeds (1..5, 1000..1031, …) therefore repeat
    byte-identical inputs every bench invocation and can time the cache,
    not the chip.  Every timed call derives its seeds from this entropy
    base; convergence assertions are seed-generic (relative loss-drop
    checks), so honesty costs nothing."""
    import secrets

    return lo + secrets.randbelow((1 << 30) - lo)


def _load_windows():
    here = os.path.dirname(os.path.abspath(__file__))
    fix = os.path.join(here, "fixtures", "trajectory_sce1_cond.npy")
    if os.path.exists(fix):
        return np.load(fix)
    ref = "/root/reference/training/DefensiveDataProcessed/trajectory_sce1_cond.npy"
    if os.path.exists(ref):
        return np.load(ref).astype(np.float32)
    # synthetic fallback with the same shape/scale
    rng = np.random.default_rng(0)
    t = np.cumsum(rng.uniform(0.5, 2.2, (38, 10)), axis=1)
    t -= t[:, :1]
    xy = rng.normal([[-193.0, 50.0]], [[1.0, 20.0]], (38, 10, 2)).cumsum(axis=1)
    return np.concatenate([t[..., None], xy], axis=-1).astype(np.float32)


def bench_jax(windows, epochs=3000):
    """Fused-Pallas whole-run kernel (falls back to the scan trainer if the
    kernel can't compile on this backend)."""
    # entropy seeds for the COLD and WARM-UP calls too: an identical repeat
    # can be served from the tunnel's cross-process result cache, and an
    # elided warm-up never loads the executable — leaving the load cost to
    # be charged to the first timed rep (CLAUDE.md measurement hazards)
    cbase = _fresh_seed()
    t0 = time.time()
    try:
        from defensive_model_vae_tpu.ops import fused_train

        _, hist = fused_train(windows, epochs=epochs, seed=cbase)  # incl. compile
        cold = time.time() - t0
        fused_train(windows, epochs=epochs, seed=cbase + 7)  # untimed warm-up
        warm = float("inf")
        base = _fresh_seed()  # never repeat a seed the tunnel has seen
        for s in range(base, base + 5):  # best-of-5 to damp tunnel jitter
            t0 = time.time()
            _, hist = fused_train(windows, epochs=epochs, seed=s)
            warm = min(warm, time.time() - t0)
        label = "pallas-fused"
    except Exception as e:
        _log(f"fused kernel unavailable ({type(e).__name__}); scan trainer")
        from defensive_model_vae_tpu.train import TrainConfig, train

        t0 = time.time()  # time ONLY the scan trainer, not the failed fused run
        _, hist = train(windows, train_cfg=TrainConfig(epochs=epochs, seed=cbase))
        cold = time.time() - t0
        t0 = time.time()
        # fresh seed: an identical repeat can be served from the tunnel's
        # cross-process result cache (CLAUDE.md measurement hazards)
        _, hist = train(windows, train_cfg=TrainConfig(epochs=epochs,
                                                       seed=_fresh_seed()))
        warm = time.time() - t0
        label = "xla-scan"

    # Chip THROUGHPUT: K independent runs dispatched back-to-back with ONE
    # final sync.  Each fused_train call above syncs internally, so its
    # timing charges a full tunnel round-trip (tens of ms on a bad day) to
    # a ~21 ms kernel; pipelined dispatch amortizes the RTT the way any
    # real multi-run workload would.  Runs are independent and the chip
    # executes them serially, so rate = K·epochs·N / Δt.  Measured in its
    # OWN try: a failure here must fall back to the synchronous per-call
    # number, not be misreported as "fused kernel unavailable".
    warm_pipelined = timing = None
    if label == "pallas-fused":
        try:
            import jax as _jax
            import jax.numpy as jnp

            from defensive_model_vae_tpu.models import CVAEConfig, init_params
            from defensive_model_vae_tpu.models.losses import LossWeights
            from defensive_model_vae_tpu.ops.fused_trainer import (
                _flatten_params, _fused_call, fused_inputs,
            )

            cfg = CVAEConfig(seq_len=windows.shape[1], dim=windows.shape[2])
            # same prep as fused_train (single shared source — can't drift)
            x_flat, start = fused_inputs(windows)
            K = 5
            plists = [
                tuple(_flatten_params(init_params(_jax.random.PRNGKey(s), cfg)))
                for s in range(1, K + 1)
            ]

            # fresh seed VALUES per timed rep (repeating an identical
            # (inputs, executable) call through the tunnel can read ~0 ms,
            # and its result cache is cross-process — CLAUDE.md measurement
            # hazards; hence the entropy base), pre-transferred OUTSIDE the
            # timed window so seed device_puts aren't charged to the kernel
            sbase = _fresh_seed()
            seed_arrays = {
                rep: [jnp.array([[sbase + 100 * rep + i]], jnp.int32)
                      for i in range(K)]
                for rep in range(4)
            }
            # force the staging transfers with ONE stacked fetch (block_
            # until_ready is not a reliable barrier on the tunnel, and
            # per-buffer fetches pay 4-30 ms RPC each — CLAUDE.md hazards
            # (2)+(3)); all before the untimed rep-0 warm-up
            np.asarray(jnp.concatenate(
                [sa.ravel() for reps in seed_arrays.values() for sa in reps]
            ))

            def _k_runs(rep):
                outs = [
                    _fused_call(plists[i], x_flat, start, seed_arrays[rep][i],
                                cfg, LossWeights(), epochs, 1e-3)
                    for i in range(K)
                ]
                # completion barrier: a TINY fetch of the last run's final
                # metrics row.  jax.block_until_ready is NOT a barrier for
                # Pallas outputs on the axon tunnel (measured: a 0.56 s
                # kernel read 0.000 s behind it — CLAUDE.md hazards); the
                # chip executes runs serially, so the last run's row being
                # fetchable implies all K finished.  (Measured equal to the
                # old block-based reading, 0.113 vs 0.115 s — dispatch sends
                # rate-limit at ~23 ms/kernel — but honest by construction.)
                np.asarray(outs[-1][1][-1])

            _k_runs(0)  # untimed: absorbs the direct-call path's one-time trace
            rep_times = []
            for rep in range(1, 4):  # 3 entropy-seeded reps (median + best)
                t0 = time.time()
                _k_runs(rep)
                rep_times.append((time.time() - t0) / K)
            warm_pipelined, timing = min(rep_times), "pipelined"
        except Exception as e:
            _log(f"PIPELINED MEASUREMENT FAILED ({type(e).__name__}: {e}); "
                 f"headline falls back to the synchronous per-call time")

    if timing is None:
        warm_pipelined, timing = warm, "sync"
        rep_times = [warm]
    _log(
        f"jax[{label}]: cold {cold:.1f}s, warm {warm:.3f}s, "
        f"headline {warm_pipelined:.3f}s/run "
        f"(median {_median(rep_times):.3f}s, n={len(rep_times)}, {timing}), "
        f"final loss {hist['total'][-1]:.4f}"
    )
    if not np.isfinite(hist["total"][-1]) or hist["total"][-1] > hist["total"][0]:
        raise RuntimeError("training diverged — refusing to report a rate")
    return (
        epochs * len(windows) / warm_pipelined,
        epochs * len(windows) / warm,
        float(hist["total"][-1]),
        timing,
        epochs * len(windows) / _median(rep_times),
        len(rep_times),
    )


# v5e bf16 MXU peak per chip; the fp32 kernel sees at most half of this,
# so mfu_pct below is a conservative (lower-bound) utilization figure.
V5E_PEAK_FLOPS = 197e12
V5E_HBM_BYTES_PER_S = 819e9  # v5e HBM bandwidth (public spec: 819 GB/s)


def _flops_per_window(windows):
    """Training FLOPs per window per epoch from the layer spec of the model
    actually trained (seq_len/dim from the corpus shape, matching
    bench_jax): 2·fi·fo matmul FLOPs forward + ~2× that for the backward
    pass (dW and dx each cost a same-sized matmul) → 6·Σ(fi·fo).  Bias
    adds and elementwise ops are omitted (<1% at hidden=128)."""
    from defensive_model_vae_tpu.models import CVAEConfig

    spec = CVAEConfig(
        seq_len=windows.shape[1], dim=windows.shape[2]
    ).layer_spec()
    return 6 * sum(fi * fo for fi, fo in spec.values())


def _scale_corpus(n, seq_len=10, dim=3):
    """Synthetic production-scale corpus with reference-like coordinate
    scales (shared by the scan-trainer and fused-kernel scale benches so
    the two tiers measure the same workload)."""
    rng = np.random.default_rng(0)
    t = np.cumsum(rng.uniform(0.5, 2.2, (n, seq_len)), axis=1)
    t -= t[:, :1]
    xy = rng.normal(
        [[-193.0, 50.0]], [[1.0, 20.0]], (n, seq_len, dim - 1)
    ).cumsum(axis=1)
    return np.concatenate([t[..., None], xy], axis=-1).astype(np.float32)


def bench_scale(n=131072, epochs=200, seq_len=10, dim=3, compute_dtype=None):
    """Production-batch training throughput.

    The reference corpora are tiny (≤135 windows — ``SURVEY.md`` §6), so the
    headline bench is dispatch-bound and its single-digit MFU reflects the
    model size, not a framework ceiling (see the roofline note in main()).
    This bench runs the SAME trainer (``train.make_train_step`` — identical
    model, loss, Adam update, scan-over-epochs program) on a synthetic
    production-scale corpus where the MXU is actually fed, making the
    framework's real throughput ceiling auditable alongside the
    reference-sized number.

    At this batch size the MLP is HBM-bandwidth-bound, not MXU-bound
    (arithmetic intensity ~64 FLOP/activation-byte at hidden 128 — far
    below the ~240 needed to saturate the MXU from HBM), so the honest
    speed-of-light anchor is achieved bandwidth, reported as a FLOOR from
    an analytic traffic model (every activation written+read once, batch
    read per epoch; the axon backend's ``cost_analysis()`` bytes are
    implausible, so no XLA number is used).  ``compute_dtype="bfloat16"``
    runs the trainer's mixed-precision path (bf16 forward/backward, f32
    master params + Adam — ``TrainConfig.compute_dtype``), which halves
    activation bytes — the throughput lever for a bandwidth-bound model.

    Returns (windows/s, TFLOP/s, GB/s-or-None) or raises on divergence
    (recorded as absent keys, logged to stderr)."""
    import jax
    import jax.numpy as jnp
    import optax

    from defensive_model_vae_tpu.models import CVAEConfig, init_params
    from defensive_model_vae_tpu.train import TrainConfig
    from defensive_model_vae_tpu.train.train import _scan_trainer, make_train_step

    windows = _scale_corpus(n, seq_len, dim)

    cfg = CVAEConfig(seq_len=seq_len, dim=dim)
    tc = TrainConfig(epochs=epochs, compute_dtype=compute_dtype)
    optimizer = optax.adam(tc.lr)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt_state = optimizer.init(params)
    run = jax.jit(_scan_trainer(make_train_step(cfg, tc, optimizer), epochs))
    batch = jnp.asarray(windows)

    sbase = _fresh_seed()  # entropy seeds: the tunnel's result cache is
    # cross-process, so fixed keys can time the cache (CLAUDE.md hazards)
    t0 = time.time()
    out = run(params, opt_state, jax.random.PRNGKey(sbase), batch, None, None)
    np.asarray(out[2][-1])
    cold = time.time() - t0
    rep_times = []
    # fresh PRNG key per timed call (identical-repeat hazard, CLAUDE.md);
    # the completion barrier is a TINY fetch of the last metrics row —
    # block_until_ready is not a reliable barrier on the tunnel (CLAUDE.md;
    # it read honestly for THIS plain-XLA program, but the fetch is honest
    # by construction)
    for s in range(sbase + 1, sbase + 4):
        t0 = time.time()
        out = run(params, opt_state, jax.random.PRNGKey(s), batch, None, None)
        np.asarray(out[2][-1])
        rep_times.append(time.time() - t0)
    best = min(rep_times)
    last = float(np.asarray(out[2])[-1, 0])
    if not np.isfinite(last):
        raise RuntimeError(f"scale bench diverged (loss={last})")
    rate = epochs * n / best
    rate_median = epochs * n / _median(rep_times)
    fpw = _flops_per_window(windows)
    tflops = rate * fpw / 1e12
    # achieved-bandwidth FLOOR from an analytic traffic model (the axon
    # backend's cost_analysis() reports implausible bytes-accessed, so the
    # auditable model is: per window·epoch, every layer activation written
    # once and read once in the compute dtype, plus one f32 batch read.
    # Real traffic is strictly higher — backward re-reads activations for
    # weight grads, optimizer state streams, etc. — so the % is a floor.)
    act_floats = sum(fo for _, fo in cfg.layer_spec().values()) + cfg.latent_dim
    act_bytes = 2 if compute_dtype == "bfloat16" else 4
    bpw = 2 * act_floats * act_bytes + seq_len * dim * 4
    gbps = rate * bpw / 1e9
    tag = f" [{compute_dtype}]" if compute_dtype else ""
    _log(
        f"scale{tag}: {n} windows x {epochs} epochs (cold {cold:.1f}s, "
        f"warm best {best:.2f}s / median {_median(rep_times):.2f}s of "
        f"{len(rep_times)}) → {rate/1e6:.1f}M windows/s, {tflops:.1f} TFLOP/s "
        f"({100 * tflops * 1e12 / V5E_PEAK_FLOPS:.1f}% of v5e bf16 peak), "
        f"≥{gbps:.0f} GB/s ({100 * gbps * 1e9 / V5E_HBM_BYTES_PER_S:.0f}% of "
        f"v5e HBM peak, traffic-floor model)"
    )
    return rate, tflops, gbps, rate_median


def bench_scale_fused(n=131072, epochs=200, tile=2048, compute_dtype="bfloat16"):
    """Fused-Pallas production-batch trainer (``ops/fused_scale``).

    Same workload as :func:`bench_scale` (same corpus, objective, Adam),
    but the whole run is ONE kernel: params + Adam state VMEM-resident for
    all epochs, the corpus streamed through VMEM tile by tile, activations
    never touching HBM.  That lifts the arithmetic intensity from ~64
    FLOP/activation-byte to ~10k FLOP/corpus-byte — HBM stops being the
    binding resource (``scale_fused_gbps`` shows the corpus stream is far
    off the HBM roof).  Measured: the kernel then hits a NEW ceiling of
    per-tile VPU/relayout work, not the MXU — the on-chip decomposition
    (scripts/scale_ablation.py → results/scale_ablation.json) pinned
    ~62% of the traced-autodiff kernel's wall time on Mosaic's backward
    lowering (dy-chain VJPs + transposed dW dot_generals; a FLOP-
    equivalent pure-matmul kernel on the same streamed grid runs at 72%
    of MXU peak), so the production default is now the HAND-WRITTEN
    backward (``ops/manual_grad``, ``backward='manual'``): measured
    67.1M windows/s vs the autodiff kernel's 53.9M on the same grid
    (+24%; eps-streamed +34%).  Historical autodiff band: 26-55M across
    Mosaic lowering variants / tunnel conditions (the known ~2x Pallas
    spread per CLAUDE.md) vs the scan trainer's ~35M; tile=2048 measured
    best in the sweep (1024: 35.3M, 4096: 31.1M).  The autodiff kernel
    is still timed each round (``scale_fused_autodiff_windows_per_sec``)
    so the cross-round series stays comparable and the manual-backward
    edge is re-measured, not assumed.  Round 4 made ``noise='hbm'``
    (fresh-per-epoch eps streamed from HBM instead of the on-core PRNG)
    the production default and therefore the headline variant; the
    prng+manual kernel (r03's headline definition) keeps its own series
    key.

    Returns a dict of rates/stats (see the return statement) or raises on
    divergence."""
    import jax
    import jax.numpy as jnp

    from defensive_model_vae_tpu.models import (
        CVAEConfig, LossWeights, init_params,
    )
    from defensive_model_vae_tpu.ops import fused_train_scale
    from defensive_model_vae_tpu.ops.fused_scale import (
        _fused_scale_call, _pack_corpus,
    )
    from defensive_model_vae_tpu.ops.fused_trainer import (
        _flatten_params, fused_inputs,
    )

    windows = _scale_corpus(n)
    sbase = _fresh_seed()
    t0 = time.time()
    _, hist = fused_train_scale(
        windows, epochs=epochs, tile=tile, compute_dtype=compute_dtype,
        seed=sbase,
    )
    cold = time.time() - t0
    last = float(hist["total"][-1])
    if not np.isfinite(last) or last > float(hist["total"][0]):
        raise RuntimeError(
            f"fused scale bench diverged (loss {hist['total'][0]:.2f} -> {last})"
        )
    # timed loop: stage corpus + params on device ONCE and call the jitted
    # kernel directly, so the measurement matches bench_scale's (kernel
    # only — no per-call host prep / ~16 MB corpus re-upload in the timed
    # window).  The entropy seed feeds the on-core PRNG, so every rep
    # computes fresh values (identical-repeat elision, CLAUDE.md); the
    # metrics fetch forces completion.
    cfg = CVAEConfig(seq_len=windows.shape[1], dim=windows.shape[2])
    assert n % tile == 0, "staged bench path skips fused_train_scale's padding"
    x_flat, start = fused_inputs(windows)
    packed = _pack_corpus(
        x_flat, start, jnp.ones((x_flat.shape[0],), jnp.float32), None,
        cfg.latent_dim,
    )
    cdt = None if compute_dtype is None else jnp.dtype(compute_dtype)
    if cdt is not None:
        packed = packed.astype(cdt)
    # force staging with real fetches — block_until_ready is not a reliable
    # barrier on the tunnel (CLAUDE.md hazards), and hbm's rep 0 is TIMED
    # (its executable was loaded by the cold call), so a lazy ~16 MB corpus
    # transfer must not land inside it.  The corpus barrier is a tiny
    # last-element fetch; the params are ~0.4 MB total, fetched whole.
    np.asarray(packed[-1, -1])
    plist = tuple(_flatten_params(init_params(jax.random.PRNGKey(0), cfg)))
    for p in plist:
        np.asarray(p)
    # three kernel variants, timed INTERLEAVED over 4 entropy-seeded rounds
    # (median + best — the cross-round variance protocol).  hbm records 4
    # timed reps (its executable was loaded by the cold call above); the
    # other two variants' rep 0 absorbs their executable load untimed, so
    # they record 3 — per-variant counts are emitted alongside the rates:
    #   hbm          noise='hbm', manual backward — the production default
    #   manual_prng  noise='prng', manual backward — r03's headline
    #                definition, kept as its own series key
    #   autodiff     noise='prng', traced jax.value_and_grad — the
    #                pre-manual series, re-measuring the manual edge
    variants = {
        "hbm": ("hbm", "manual"),
        "manual_prng": ("prng", "manual"),
        "autodiff": ("prng", "auto"),
    }
    times = {k: [] for k in variants}
    for rep in range(4):
        for j, (name, (noise, bw)) in enumerate(variants.items()):
            seed_arr = jnp.array(
                [[sbase + (1 << 16) * (4 * j + rep) + 1]], jnp.int32
            )
            # stage + fetch the seed BEFORE the window opens: a lazy (1,1)
            # transfer is one 4-30 ms RPC against a ~0.3 s timed kernel
            # (CLAUDE.md hazards (2)+(3))
            np.asarray(seed_arr)
            t0 = time.time()
            _, metrics = _fused_scale_call(
                plist, packed, seed_arr, cfg, LossWeights(), epochs, 1e-3,
                tile, float(n), cdt, "f32_acts", noise, backward=bw,
            )
            np.asarray(metrics)
            dt = time.time() - t0
            if rep == 0 and name != "hbm":
                # first hbm rep is warm (the cold fused_train_scale call
                # above compiled+loaded it); the other variants' first rep
                # absorbs their executable load — untimed
                continue
            times[name].append(dt)
    best = min(times["hbm"])
    med = _median(times["hbm"])
    rate = epochs * n / best
    rate_median = epochs * n / med
    fpw = _flops_per_window(windows)
    tflops = rate * fpw / 1e12
    # corpus-stream traffic: the packed (x|cond|mask) row plus the hbm eps
    # stream, read once per epoch in the compute dtype — the kernel's only
    # per-epoch HBM traffic (hbm/prng corpora carry no eps columns)
    width = cfg.seq_len * cfg.dim + cfg.cond_dim + 1 + cfg.latent_dim
    bpw = width * (2 if compute_dtype == "bfloat16" else 4)
    gbps = rate * bpw / 1e9
    rate_prng = epochs * n / min(times["manual_prng"])
    rate_auto = epochs * n / min(times["autodiff"])
    tag = f" [{compute_dtype}]" if compute_dtype else ""
    _log(
        f"scale-fused{tag}: {n} windows x {epochs} epochs in ONE kernel "
        f"(tile {tile}; cold {cold:.1f}s, warm best {best:.2f}s / median "
        f"{med:.2f}s of {len(times['hbm'])}) → "
        f"{rate/1e6:.1f}M windows/s, {tflops:.1f} TFLOP/s "
        f"({100 * tflops * 1e12 / V5E_PEAK_FLOPS:.1f}% of v5e bf16 peak; "
        f"corpus+eps stream {gbps:.0f} GB/s — HBM retired as the binding "
        f"resource, ceiling is per-tile VPU/relayout work); "
        f"manual+prng {rate_prng/1e6:.1f}M, autodiff {rate_auto/1e6:.1f}M "
        f"(hbm vs autodiff {rate/rate_auto:.2f}x)"
    )
    return {
        "rate": rate, "rate_median": rate_median, "tflops": tflops,
        "gbps": gbps, "rate_prng": rate_prng, "rate_auto": rate_auto,
        "n_reps": len(times["hbm"]),
        "n_reps_prng": len(times["manual_prng"]),
        "n_reps_auto": len(times["autodiff"]),
    }


def bench_torch_baseline(windows, epochs=200):
    """Torch-CPU equivalent of the reference trainer (same architecture,
    loss, optimizer, full-batch loop) — measured live, rate extrapolated."""
    import torch
    import torch.nn as nn

    torch.set_num_threads(os.cpu_count() or 8)
    T, D, H, Z = windows.shape[1], windows.shape[2], 128, 8

    class CVAE(nn.Module):
        def __init__(self):
            super().__init__()
            self.cond = nn.Sequential(
                nn.Linear(2, H), nn.ReLU(), nn.Linear(H, H), nn.ReLU()
            )
            self.enc = nn.Sequential(
                nn.Flatten(), nn.Linear(T * D, H), nn.ReLU(),
                nn.Linear(H, H), nn.ReLU(), nn.Linear(H, H), nn.ReLU(),
                nn.Linear(H, H), nn.ReLU(),
            )
            self.mu = nn.Linear(2 * H, Z)
            self.logvar = nn.Linear(2 * H, Z)
            self.dec = nn.Sequential(
                nn.Linear(Z + H, H), nn.ReLU(), nn.Linear(H, H), nn.ReLU(),
                nn.Linear(H, H), nn.ReLU(), nn.Linear(H, T * D),
            )

        def forward(self, x, c):
            hc = self.cond(c)
            h = torch.cat([self.enc(x), hc], 1)
            mu, logvar = self.mu(h), self.logvar(h)
            z = mu + torch.randn_like(mu) * torch.exp(0.5 * logvar)
            return self.dec(torch.cat([z, hc], 1)).view(-1, T, D), mu, logvar

    model = CVAE()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    batch = torch.from_numpy(np.asarray(windows, np.float32))
    start = batch[:, 0, 1:3]
    rel = batch.clone()
    rel[:, :, 1:3] -= start.unsqueeze(1)

    # one untimed epoch to absorb lazy torch init
    def _epoch():
        opt.zero_grad()
        recon, mu, logvar = model(rel, start)
        recon_l = nn.functional.mse_loss(recon, rel)
        kld = -0.5 * torch.mean(1 + logvar - mu**2 - logvar.exp())
        start_l = nn.functional.mse_loss(recon[:, 0, 1:3], rel[:, 0, 1:3])
        tdiff = recon[:, 1:, 0] - recon[:, :-1, 0]
        time_l = nn.functional.mse_loss(
            recon[:, 0, 0], torch.zeros_like(recon[:, 0, 0])
        ) + torch.mean(torch.relu(-tdiff))
        loss = 0.1 * recon_l + 0.1 * kld + start_l + time_l
        loss.backward()
        opt.step()

    _epoch()
    times = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(epochs):
            _epoch()
        times.append(time.time() - t0)
    dt = sorted(times)[1]  # median of 3
    rate = epochs * len(windows) / dt
    _log(f"torch-cpu baseline: {epochs} epochs in {dt:.1f}s → {rate:.0f} windows/s")
    return rate


def bench_multi_kernel():
    """Convergence check for the multi-scenario grid kernel
    (``ops/fused_trainer._make_multi_kernel``).

    This is the automated coverage the CPU test suite cannot provide: the
    kernel needs the TPU core PRNG (interpret mode stubs
    ``prng_random_bits`` to zeros, which inf's the Box–Muller transform),
    so the convergence assertion lives here — bench.py runs on the real
    chip every round and its result lands in ``BENCH_r*.json``.  A
    regression raises; main() records it as multi_kernel_converged=false
    so the round's JSON line survives with the failure visible.
    """
    from defensive_model_vae_tpu.ops import fused_train_multi

    from defensive_model_vae_tpu import scenarios

    here = os.path.dirname(os.path.abspath(__file__))
    corpora = {}
    for key in scenarios.REGISTRY:
        fix = os.path.join(here, "fixtures", f"trajectory_{key}_cond.npy")
        if os.path.exists(fix):
            corpora[key] = np.load(fix)
    if len(corpora) < len(scenarios.REGISTRY):
        _log("multi-kernel check skipped (fixtures missing)")
        return None
    t0 = time.time()
    # entropy seed: an identical repeat would be served from the tunnel's
    # cross-process result cache without loading the executable; the
    # convergence assertion below is seed-generic (relative loss drop)
    _, hist_by = fused_train_multi(corpora, epochs=300, seed=_fresh_seed())
    dt = time.time() - t0
    for key, h in hist_by.items():
        first, last = float(h["total"][0]), float(h["total"][-1])
        _log(f"multi-kernel {key}: loss {first:.2f} → {last:.4f}")
        if not np.isfinite(last) or last >= first / 5:
            raise RuntimeError(
                f"multi-scenario grid kernel regressed: {key} loss "
                f"{first:.3f} → {last:.3f} (needs < first/5)"
            )
    _log(f"multi-kernel: all four corpora converged in {dt:.2f}s")
    return True


def bench_seed_grid(windows, n_seeds=32, epochs=3000):
    """Seed sweep: n_seeds full trainings of one corpus in one compiled
    pipelined sweep (``ops.fused_train_seeds`` — per-seed single-run
    kernels dispatched back-to-back, stacked device-side harvest; replaced
    the grid-axis sweep in round 4 — the end-to-end win is host-side
    prep/harvest, not the kernel body; results/grid_probe.json) — the
    train-seed selection sweep's workload.  Asserts every seed converges;
    returns warm seconds."""
    from defensive_model_vae_tpu.ops import fused_train_seeds

    # compile/warm-up with entropy seeds too — an elided warm-up would
    # leave the executable load charged to the timed launch
    wbase = _fresh_seed()
    fused_train_seeds(windows, list(range(wbase, wbase + n_seeds)), epochs=epochs)
    # fresh seed values per timed rep (identical-repeat hazard is
    # cross-process — CLAUDE.md; a fixed literal range can time the cache);
    # 2 reps: this kernel's wall has a documented ~2x lowering/tunnel
    # spread, so a single-shot number is the noisiest key in the record
    rep_times, rep_hists = [], []
    for _ in range(2):
        base = _fresh_seed()
        t0 = time.time()
        _, hist_by = fused_train_seeds(
            windows, list(range(base, base + n_seeds)), epochs=epochs
        )
        rep_times.append(time.time() - t0)
        rep_hists.append(hist_by)
    dt = min(rep_times)
    # validate EVERY timed rep, not just the last: dt is min() over the
    # reps, so a diverging seed in an earlier rep would otherwise be
    # reported as the headline time with converged=true
    for rep, hists in enumerate(rep_hists):
        for s, h in hists.items():
            first, last = float(h["total"][0]), float(h["total"][-1])
            if not np.isfinite(last) or last >= first / 5:
                raise RuntimeError(
                    f"seed-grid kernel regressed (rep {rep}): "
                    f"seed {s} loss {first:.3f} → {last:.3f}"
                )
    rate = n_seeds * epochs * len(windows) / dt
    _log(f"seed-grid: {n_seeds} trainings x {epochs} epochs pipelined, "
         f"best {dt:.2f}s / median {_median(rep_times):.2f}s of "
         f"{len(rep_times)} warm ({rate/1e6:.2f}M windows/s aggregate)")
    return dt


def _jittered_sut_copy(src_dir, dst_dir, eps=1e-3):
    """Copy the SUT corpus with surrounding-vehicle velocities shifted by
    +``eps`` m/s.  Same episodes, same frame selection and padded device
    shapes (SV count is column-presence-based; no stop condition or path
    clustering reads SV velocities — ``dnda/calculator.py``), but every
    device input buffer differs — so a warm pass on one copy compiles and
    loads the exact executables while the timed pass on a copy with a
    DIFFERENT eps is a fresh (inputs, executable) pair (identical-repeat
    hazard, CLAUDE.md; the tunnel's result cache is cross-process, so the
    timed eps must come from OS entropy, not a constant)."""
    import re

    import pandas as pd

    os.makedirs(dst_dir, exist_ok=True)
    for name in sorted(os.listdir(src_dir)):
        if not name.endswith(".csv"):
            continue
        df = pd.read_csv(os.path.join(src_dir, name))
        sv_vel = [c for c in df.columns if re.fullmatch(r"sv\d+_v[xy]", c)]
        if sv_vel:
            df[sv_vel] = df[sv_vel] + eps
        df.to_csv(os.path.join(dst_dir, name), index=False)


def bench_dnda_sweep():
    """Full 21-episode SUT DNDA sweep (host prep + ONE batched device SAT
    program); returns warm seconds or None when the corpus is absent."""
    import tempfile

    d = "/root/reference/SUT_Testing/collected_data"
    if not os.path.isdir(d):
        _log("dnda sweep skipped (no SUT corpus)")
        return None
    from defensive_model_vae_tpu.dnda import score_directory

    # warm on one value-jittered copy (cold compiles + executable loads
    # land here), then TIME a copy jittered with an OS-entropy eps: the
    # real corpus is byte-identical every invocation, and the tunnel's
    # cross-process result cache can elide a repeated identical sweep
    # (CLAUDE.md hazards) — the entropy copy has identical shapes and
    # per-frame compute, so its timing is the honest corpus-sweep number
    with tempfile.TemporaryDirectory() as tmp:
        _jittered_sut_copy(d, os.path.join(tmp, "warm"))
        score_directory(os.path.join(tmp, "warm"))
        # 2^30 distinct eps values per rep, structurally distinct from the
        # warm copy's 1e-3 (a small discrete space can collide with the
        # warm copy or the cross-process result cache); 3 entropy-seeded
        # reps for the cross-round variance protocol
        rep_times = []
        for rep in range(3):
            timed = os.path.join(tmp, f"timed{rep}")
            _jittered_sut_copy(d, timed, eps=2e-3 + 1e-12 * _fresh_seed())
            t0 = time.time()
            rows = score_directory(timed)
            rep_times.append(time.time() - t0)
    best, med = min(rep_times), _median(rep_times)
    _log(f"dnda sweep: {len(rows)} episodes in best {best:.1f}s / median "
         f"{med:.1f}s of {len(rep_times)} (warm)")
    return best, med, len(rep_times)


def bench_mpc_corpus():
    """Whole-corpus MPC tracking (sce1 fixture-shaped synthetic paths, 38
    paths × ~500 steps, one vmapped device program); warm seconds."""
    from defensive_model_vae_tpu.control import MPCConfig, track_batch

    rng = np.random.default_rng(0)
    B, N = 38, 10
    t = np.sort(rng.uniform(0.5, 11.0, (B, N)), axis=1)
    t[:, 0] = 0.0
    y = 40.0 + np.cumsum(rng.uniform(2.0, 8.0, (B, N)), axis=1)
    x = -194.5 + rng.normal(0, 0.4, (B, N)).cumsum(axis=1)
    wps = np.stack([x, y, t], axis=-1)
    inits = np.stack(
        [x[:, 0], y[:, 0], np.full(B, np.pi / 2), np.full(B, 8.0), np.zeros(B)],
        axis=1,
    )
    cfg = MPCConfig(prediction_horizon=30, control_horizon=20, dt=0.02)
    # compile/warm-up AND timed inputs both perturbed with OS-entropy
    # noise — fixed values repeat identical calls every invocation, and
    # the tunnel's result cache is cross-process: an elided warm-up would
    # leave the executable load charged to the timed call (CLAUDE.md)
    erng = np.random.default_rng()
    track_batch(wps, inits + erng.normal(0, 1e-3, inits.shape), cfg)
    rep_times = []
    for _ in range(3):  # entropy-fresh inits per rep (variance protocol)
        inits2 = inits + erng.normal(0, 1e-3, inits.shape)
        t0 = time.time()
        _, states, _, steps = track_batch(wps, inits2, cfg)
        rep_times.append(time.time() - t0)
    best, med = min(rep_times), _median(rep_times)
    n_solves = int(steps.sum())
    _log(f"mpc corpus: {B} paths, {n_solves} control steps in best "
         f"{best:.2f}s / median {med:.2f}s of {len(rep_times)} "
         f"({n_solves/best:,.0f} solves/s)")
    return best, med, len(rep_times)


def bench_generation(windows, n=4096):
    """Sampling throughput (stderr detail only)."""
    try:
        import jax

        from defensive_model_vae_tpu.generate import generate_trajectories
        from defensive_model_vae_tpu.models import CVAEConfig, init_params

        cfg = CVAEConfig(seq_len=windows.shape[1], dim=windows.shape[2])
        params = init_params(jax.random.PRNGKey(0), cfg)
        starts = np.tile(windows[0, 0, 1:3], (n, 1))
        gbase = _fresh_seed()  # cross-process identical-repeat hazard
        generate_trajectories(params, cfg, starts, seed=gbase + 999)  # compile
        t0 = time.time()
        # generate_trajectories materializes to host numpy internally, so
        # this timing already awaits execution through the axon tunnel
        generate_trajectories(params, cfg, starts, seed=gbase)
        dt = time.time() - t0
        # sustained device throughput: pipeline K batches with
        # materialize=False, sync once on the last (RTT + the ~0.5 MB host
        # fetch dominate the single-call number; a device-resident
        # consumer — e.g. the MPC tracker — never pays either)
        K = 8

        def _k_batches(base):
            # fresh seeds per timed rep (identical-repeat hazard, CLAUDE.md);
            # completion barrier = a TINY fetch of the last batch's last
            # row — block_until_ready is not a reliable barrier on the
            # tunnel (CLAUDE.md hazards), and the chip executes batches
            # serially so the last row being fetchable implies all K done
            outs = [
                generate_trajectories(params, cfg, starts, seed=base + s,
                                      materialize=False)
                for s in range(K)
            ]
            np.asarray(outs[-1][-1, -1])

        _k_batches(gbase + 5000)  # untimed warm rep (entropy: see gbase)
        dt_pipe = float("inf")
        for rep in range(1, 4):  # best-of-3 to damp tunnel/host jitter
            t0 = time.time()
            _k_batches(gbase + 100 * rep)
            dt_pipe = min(dt_pipe, (time.time() - t0) / K)
        _log(f"generation: {n} trajectories in {dt*1e3:.0f} ms → {n/dt:,.0f} traj/s "
             f"(sustained {n/dt_pipe:,.0f} traj/s device-resident)")
    except Exception as e:
        _log(f"generation bench skipped ({e})")


def _timed_reps(fn, n_reps=3):
    """Untimed warm rep + ``n_reps`` entropy-seeded timed reps of ``fn(seed)``
    (the cross-round protocol of the other headlines: best + median; fresh
    seed VALUES per rep because the tunnel's identical-repeat result cache
    is cross-process — CLAUDE.md measurement hazards).  ``fn`` must block
    on completion itself (both scan trainers fetch their metrics to host)."""
    base = _fresh_seed()
    fn(base + 7919)  # warm-up/compile, never re-timed
    times = []
    for rep in range(n_reps):
        t0 = time.time()
        fn(base + rep)
        times.append(time.time() - t0)
    return times


def bench_conv_long(n=256, seq_len=50, epochs=500):
    """BASELINE config 3 (Conv1D VAE over long windows) as a per-round
    drift series — the one-shot number in results/baseline_configs.json
    had no cross-round key, so a regression there went unnoticed (VERDICT
    r04 item 6).  Same shapes/epochs as scripts/run_baseline_configs.py.
    Returns (best_rate, median_rate, n_reps) in windows/s."""
    from defensive_model_vae_tpu.data import generate_random_trajectories
    from defensive_model_vae_tpu.train import TrainConfig, train_conv

    windows = generate_random_trajectories(n, seq_len, 5.0, seed=0).astype(
        np.float32
    )

    def run(seed):
        _, hist, _ = train_conv(
            windows, train_cfg=TrainConfig(epochs=epochs, seed=seed)
        )
        if not np.isfinite(hist["total"][-1]):
            raise RuntimeError("conv training diverged")

    times = _timed_reps(run)
    _log(
        f"conv_long[{n}x{seq_len}x2, {epochs}ep]: best {min(times):.2f}s, "
        f"median {_median(times):.2f}s (n={len(times)})"
    )
    total = epochs * n
    return total / min(times), total / _median(times), len(times)


def bench_conditioned(epochs=3000):
    """BASELINE config 4 (scenario-class + THW conditioned CVAE) as a
    per-round drift series (VERDICT r04 item 6).  Corpus = the four
    fixture scenario sets with default trial suffixes (data-root
    independent, deterministic across machines).
    Returns (best_rate, median_rate, n_reps) in windows/s."""
    from defensive_model_vae_tpu import scenarios
    from defensive_model_vae_tpu.data.features import build_conditioned_corpus
    from defensive_model_vae_tpu.train import TrainConfig, train_conditioned

    here = os.path.dirname(os.path.abspath(__file__))
    windows = {
        k: np.load(os.path.join(here, "fixtures", f"trajectory_{k}_cond.npy"))
        for k in scenarios.REGISTRY
    }
    corpus, extra = build_conditioned_corpus(windows)

    def run(seed):
        _, hist, _ = train_conditioned(
            corpus, extra, TrainConfig(epochs=epochs, seed=seed)
        )
        if not np.isfinite(hist["total"][-1]):
            raise RuntimeError("conditioned training diverged")

    times = _timed_reps(run)
    _log(
        f"conditioned[{corpus.shape[0]}x{corpus.shape[1]}, {epochs}ep]: "
        f"best {min(times):.2f}s, median {_median(times):.2f}s (n={len(times)})"
    )
    total = epochs * corpus.shape[0]
    return total / min(times), total / _median(times), len(times)


def main():
    # deterministic Mosaic lowering -> persistent-cache hits for the
    # fused kernels (re-execs once if hash randomization is live)
    from defensive_model_vae_tpu.utils.cache import ensure_deterministic_hash_seed
    ensure_deterministic_hash_seed()
    warm_only = "--warm-only" in sys.argv
    windows = _load_windows()
    _log(f"corpus: {windows.shape}")
    (jax_rate, jax_rate_sync, final_loss, timing, jax_rate_median,
     jax_n_reps) = bench_jax(windows)
    multi_ok = None
    if warm_only:
        # --warm-only: headline warm throughput without the slow extras
        # (generation bench, multi-kernel check, live torch re-baseline) —
        # for wall-clock-constrained driver rounds; the persistent
        # .jax_cache keeps even the 'cold' compile cheap on repeats
        torch_rate = RECORDED_TORCH_CPU_RATE
    dnda_s = mpc_s = grid_s = grid_ok = scale = scale_bf16 = scale_fused = None
    conv_long = cond_rate = None
    if not warm_only:
        bench_generation(windows)
        # a convergence regression must be VISIBLE, not fatal: record
        # multi_kernel_converged=false in the JSON line rather than losing
        # the whole bench record for the round
        try:
            multi_ok = bench_multi_kernel()
        except Exception as e:
            _log(f"MULTI-KERNEL CHECK FAILED ({e})")
            multi_ok = False
        # same visibility rule as the multi-kernel check: a convergence
        # regression (RuntimeError) must land in the JSON line, not vanish
        # into stderr — a missing seed_grid key would be indistinguishable
        # from the bench being skipped
        try:
            grid_s = bench_seed_grid(windows)
            grid_ok = True
        except Exception as e:
            _log(f"SEED-GRID BENCH FAILED ({e})")
            grid_ok = False
        try:
            dnda_s = bench_dnda_sweep()
        except Exception as e:
            _log(f"dnda sweep failed ({e})")
        try:
            mpc_s = bench_mpc_corpus()
        except Exception as e:
            _log(f"mpc corpus bench failed ({e})")
        try:
            scale = bench_scale()
        except Exception as e:
            _log(f"scale bench failed ({e})")
        try:
            scale_bf16 = bench_scale(compute_dtype="bfloat16")
        except Exception as e:
            _log(f"bf16 scale bench failed ({e})")
        try:
            scale_fused = bench_scale_fused()
        except Exception as e:
            _log(f"fused scale bench failed ({e})")
        # secondary BASELINE.json configs (3: Conv1D long windows, 4:
        # scenario+THW conditioned) join the per-round drift series —
        # their keys were pre-registered in _DRIFT_KEYS from r05 on
        try:
            conv_long = bench_conv_long()
        except Exception as e:
            _log(f"conv_long bench failed ({e})")
        try:
            cond_rate = bench_conditioned()
        except Exception as e:
            _log(f"conditioned bench failed ({e})")
        try:
            torch_rate = bench_torch_baseline(windows)
        except Exception as e:  # torch missing/broken → recorded rate
            _log(f"torch baseline failed ({e}); using recorded CPU rate")
            torch_rate = RECORDED_TORCH_CPU_RATE
    # hardware anchor: FLOPs/window from the layer spec → sustained TFLOP/s
    # and % of v5e peak.  Single-digit-percent MFU is EXPECTED here: at
    # batch 38 / hidden 128 the workload is dispatch-bound, not MXU-bound
    # (the Pallas kernel wins by deleting per-epoch dispatches, not by
    # feeding the MXU — see DESIGN.md "Where the MXU earns its keep");
    # the anchor makes that ceiling auditable across rounds.
    fpw = _flops_per_window(windows)
    tflops = jax_rate * fpw / 1e12
    _log(
        f"roofline: {fpw/1e6:.3f} MFLOP/window → sustained {tflops:.2f} TFLOP/s "
        f"({100 * tflops * 1e12 / V5E_PEAK_FLOPS:.2f}% of v5e bf16 peak; "
        f"dispatch-bound at this model size)"
    )
    result = {
        "metric": "vae_train_windows_per_sec_per_chip",
        "value": round(jax_rate, 1),
        "unit": "windows/s",
        "vs_baseline": round(jax_rate / torch_rate, 1),
        # "pipelined" = RTT-amortized sustained chip throughput;
        # "sync" = per-call wall time incl. one tunnel round-trip —
        # value_sync keeps the cross-round series comparable with
        # pre-pipelining rounds (BENCH_r01 was sync-timed)
        "timing": timing,
        "value_median": round(jax_rate_median, 1),
        "n_reps": jax_n_reps,
        "value_sync": round(jax_rate_sync, 1),
        "vs_baseline_sync": round(jax_rate_sync / torch_rate, 1),
        "flops_per_window": fpw,
        "tflops_sustained": round(tflops, 3),
        "mfu_pct": round(100 * tflops * 1e12 / V5E_PEAK_FLOPS, 3),
    }
    if multi_ok is not None:
        result["multi_kernel_converged"] = bool(multi_ok)
    if grid_ok is not None:
        result["seed_grid_converged"] = bool(grid_ok)
    if grid_s is not None:
        result["seed_grid_32x3000_s"] = round(grid_s, 2)
    if dnda_s is not None:
        result["dnda_sweep_21ep_s"] = round(dnda_s[0], 1)
        result["dnda_sweep_21ep_s_median"] = round(dnda_s[1], 1)
        result["dnda_sweep_n_reps"] = dnda_s[2]
    if mpc_s is not None:
        result["mpc_corpus_38path_s"] = round(mpc_s[0], 2)
        result["mpc_corpus_38path_s_median"] = round(mpc_s[1], 2)
        result["mpc_corpus_n_reps"] = mpc_s[2]
    if scale is not None:
        # production-batch ceiling (131072-window synthetic corpus, same
        # trainer) — the headline stays the reference-sized workload; these
        # keys make the MXU-fed ceiling auditable across rounds
        result["scale_windows_per_sec"] = round(scale[0], 1)
        result["scale_windows_per_sec_median"] = round(scale[3], 1)
        result["scale_tflops_sustained"] = round(scale[1], 3)
        result["scale_mfu_pct"] = round(100 * scale[1] * 1e12 / V5E_PEAK_FLOPS, 3)
        if scale[2]:
            # the workload is HBM-bandwidth-bound: achieved GB/s vs HBM
            # peak is the honest speed-of-light anchor at this shape
            result["scale_gbps"] = round(scale[2], 1)
            result["scale_hbm_pct"] = round(
                100 * scale[2] * 1e9 / V5E_HBM_BYTES_PER_S, 1
            )
    if scale_bf16 is not None:
        # mixed-precision (TrainConfig.compute_dtype="bfloat16") variant:
        # bf16 forward/backward halves activation traffic — the throughput
        # lever for a bandwidth-bound MLP
        result["scale_bf16_windows_per_sec"] = round(scale_bf16[0], 1)
        result["scale_bf16_windows_per_sec_median"] = round(scale_bf16[3], 1)
        result["scale_bf16_tflops_sustained"] = round(scale_bf16[1], 3)
        result["scale_bf16_mfu_pct"] = round(
            100 * scale_bf16[1] * 1e12 / V5E_PEAK_FLOPS, 3
        )
        if scale_bf16[2]:
            result["scale_bf16_gbps"] = round(scale_bf16[2], 1)
            result["scale_bf16_hbm_pct"] = round(
                100 * scale_bf16[2] * 1e9 / V5E_HBM_BYTES_PER_S, 1
            )
    if scale_fused is not None:
        # whole-run-in-one-kernel scale trainer (ops/fused_scale): corpus
        # streamed through VMEM, activations never in HBM.  gbps shows the
        # corpus stream is far off the HBM roof (HBM retired); measured
        # ceiling is per-tile VPU/relayout work, NOT the MXU — the low
        # mfu_pct is expected, don't chase it (see bench_scale_fused
        # docstring / DESIGN.md).  Headline variant = noise='hbm' + manual
        # backward (the production default); manual+prng continues r03's
        # headline series, autodiff the pre-manual series.
        result["scale_fused_windows_per_sec"] = round(scale_fused["rate"], 1)
        result["scale_fused_windows_per_sec_median"] = round(
            scale_fused["rate_median"], 1
        )
        result["scale_fused_n_reps"] = scale_fused["n_reps"]
        result["scale_fused_tflops_sustained"] = round(
            scale_fused["tflops"], 3
        )
        result["scale_fused_mfu_pct"] = round(
            100 * scale_fused["tflops"] * 1e12 / V5E_PEAK_FLOPS, 3
        )
        result["scale_fused_gbps"] = round(scale_fused["gbps"], 1)
        result["scale_fused_manual_prng_windows_per_sec"] = round(
            scale_fused["rate_prng"], 1
        )
        result["scale_fused_manual_prng_n_reps"] = scale_fused["n_reps_prng"]
        result["scale_fused_autodiff_windows_per_sec"] = round(
            scale_fused["rate_auto"], 1
        )
        result["scale_fused_autodiff_n_reps"] = scale_fused["n_reps_auto"]
    if conv_long is not None:
        result["conv_long_windows_per_sec"] = round(conv_long[0], 1)
        result["conv_long_windows_per_sec_median"] = round(conv_long[1], 1)
        result["conv_long_n_reps"] = conv_long[2]
    if cond_rate is not None:
        result["conditioned_windows_per_sec"] = round(cond_rate[0], 1)
        result["conditioned_windows_per_sec_median"] = round(cond_rate[1], 1)
        result["conditioned_n_reps"] = cond_rate[2]
    drift = _drift_report(result)
    if drift is not None and drift["flagged"]:
        result["drift_flags"] = drift["flagged"]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
