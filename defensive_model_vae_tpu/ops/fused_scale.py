"""Fused Pallas trainer for PRODUCTION-SCALE corpora: the whole run in one
kernel launch, with the corpus streamed through VMEM tile by tile.

The whole-run kernel in :mod:`.fused_trainer` owns the reference-sized
regime (≤136 windows resident in VMEM; its win is deleting per-epoch
dispatch).  At production batch sizes (``bench.py``'s scale bench: 131072
windows) the corpus no longer fits in VMEM and the binding resource flips
to HBM bandwidth: the XLA scan trainer materializes every layer activation
to HBM between ops (~14% MFU measured in bf16).  This kernel keeps the
model on-core instead:

- **grid = (epochs, batch tiles)**, iterated sequentially (epochs outer);
- the packed corpus is streamed from HBM one ``(tile, F)`` block per grid
  step — Pallas double-buffers the DMA behind the compute — and is read
  EXACTLY ONCE per epoch: activations never touch HBM;
- parameters live in the output blocks (constant index map → VMEM-resident
  for the whole grid, written back once at the end); Adam moments and the
  gradient accumulator live in VMEM scratch, which persists across grid
  steps;
- each grid step computes the tile's forward + backward (``value_and_grad``
  traced inside the kernel) and accumulates gradients; the last tile of an
  epoch applies one Adam update — bit-for-bit the full-batch objective,
  because per-tile losses are scaled by the GLOBAL valid-row count
  (``_forward_loss(n_valid=N)``) so grads/metrics sum across tiles to the
  full-batch means;
- reparameterization noise (``noise=``): the default ``"hbm"`` pre-generates
  EVERY epoch's eps with one cheap XLA program inside the same jitted
  program (hardware-RBG ``jax.random.normal`` by default — ``noise_impl``;
  ~16 B/window·epoch in bf16) and streams it from HBM as a second
  double-buffered input — fresh i.i.d. noise per epoch AND tile, like the
  scan trainer, with none of the on-core PRNG's per-step Box–Muller cost.
  Measured at the bench shape: hbm+rbg 0.308 s vs hbm+threefry 0.395 s
  (``results/hot_probe.json``) vs on-core PRNG 0.383 s (the ``manual``
  variant of ``results/scale_ablation.json`` — a separate run of the
  same kernel/shape), so ``noise_impl`` defaults to rbg.  The ~87 ms threefry→rbg delta is NOT
  generation cost (the same artifact times generation standalone:
  threefry 33–47 ms, rbg 54 ms — threefry's is smaller); it is the
  threefry OUTPUT LAYOUT feeding the blocked Pallas custom-call
  operand, pinned by ``scripts/noise_consumer_probe.py`` →
  ``results/noise_consumer_probe.json``: a plain-XLA consumer of the
  same buffer shows the impls within 7 ms, while a stream-only Pallas
  consumer reproduces the full trainer's gap exactly (+0.087 s probe
  vs +0.086 s trainer).  ``"prng"`` keeps the on-core PRNG (re-seeded per grid
  step from ``seed + e·n_tiles + i``) for corpora/epoch counts where the
  eps buffer would not fit HBM (guarded).  The explicit-``eps`` escape
  hatch still holds one (N, Z) draw constant across epochs, like the
  other fused kernels.

Mixed precision (default ``compute_dtype="bfloat16"``) stores the streamed
corpus in bf16 (halving HBM traffic) and runs the forward/backward in bf16
over the f32 master params — the same recipe as
``train.TrainConfig.compute_dtype``, with the one documented delta that the
recon target is the bf16-rounded corpus.

Arithmetic-intensity note (why this kernel exists): at hidden=128 the MLP
moves ~64 FLOPs per activation byte — far under the ~240 needed to feed
the MXU from HBM — so the scan trainer is bandwidth-bound.  Streaming only
the corpus (~80 B/window in bf16 vs ~4.4 KB/window of activations) raises
the intensity to ~10k FLOP/B, retiring HBM as the binding resource.
Measured outcome (131072 windows × 200 epochs, on-chip tile sweep): the
kernel then hits a NEW ceiling of per-tile VPU/relayout work, not the
MXU.  The ceiling is decomposed by the on-chip ablation
(``scripts/scale_ablation.py`` → ``results/scale_ablation.json``): a
FLOP-equivalent pure-matmul kernel on the same streamed grid sustains
72% of MXU peak, and ~62% of the traced-autodiff kernel's wall time is
Mosaic's BACKWARD lowering (per-layer cast/select VJPs in the dy chain +
the 12 per-tile transposed dW dot_generals) — which is why the backward
is now HAND-WRITTEN by default (:mod:`.manual_grad`, ``backward``
option): measured 67.1M windows/s bf16 at tile=2048 vs the autodiff
kernel's 53.9M on the same grid (+24%; eps-streamed +34%), vs ~35M for
the scan trainer — on top of the structural win that the entire run is
ONE dispatch instead of one per epoch.  The autodiff kernel's historical
band was 26–55M across Mosaic lowering variants / tunnel conditions (the
known ~2× Pallas spread); see DESIGN.md for the decomposition table.

Unlike the VMEM-resident kernels this one has no epoch cap (the metrics
block is (1, 8) per grid step) and no corpus-size cap (tiles stream from
HBM) — the remaining limit is params+Adam fitting in VMEM
(``_check_vmem_budget``, shared).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import CVAEConfig, LossWeights, init_params
from ..models.cvae import Params
from .fused_trainer import (
    FUSED_METRIC_KEYS,
    _adam_step,
    _check_vmem_budget,
    _flatten_params,
    _forward_loss,
    _normal_noise,
    _unflatten_params,
    fused_inputs,
)


# PRNG implementation for the hbm noise buffer ("threefry2x32" | "rbg" |
# "unsafe_rbg"): rbg lowers to the hardware RngBitGenerator and is the
# measured END-TO-END winner — kernel wall 0.308 s vs 0.395 s under
# threefry at the bench shape (results/hot_probe.json).  Generation alone
# does NOT explain the delta (standalone: threefry 33-47 ms < rbg 54 ms,
# same artifact); it is the threefry output's layout feeding the blocked
# Pallas custom-call operand — pinned by scripts/noise_consumer_probe.py
# (plain-XLA consumer: impls within 7 ms; Pallas stream consumer:
# +0.087 s, the trainer's exact gap).  rbg's bit stream is
# backend-dependent (the oracle tests derive the expected stream with the
# SAME impl on the same backend; threefry stays available for a
# backend-stable stream).
_DEFAULT_NOISE_IMPL = "rbg"


def _value_and_grad(backward, params, x, cond, eps, cfg, weights, mask,
                    n_valid, compute_dtype, mixed_style, bias_via_dot=False,
                    dw_mode="contract0", chain_cd=False, grads_mode="full"):
    """Shared fwd+bwd step of both scale kernels: autodiff (traced
    ``jax.value_and_grad``) or the hand-written backward
    (:mod:`.manual_grad` — the ablation showed ~62% of kernel wall time is
    Mosaic's autodiff-lowering; see that module for what changes)."""
    if backward == "manual":
        from .manual_grad import manual_value_and_grad

        return manual_value_and_grad(
            params, x, cond, eps, cfg, weights, mask, n_valid=n_valid,
            compute_dtype=compute_dtype, mixed_style=mixed_style,
            bias_via_dot=bias_via_dot, dw_mode=dw_mode, chain_cd=chain_cd,
            grads_mode=grads_mode,
        )
    (_, comps), grads = jax.value_and_grad(
        lambda pl_: _forward_loss(
            pl_, x, cond, eps, cfg, weights, mask,
            n_valid=n_valid, compute_dtype=compute_dtype,
            mixed_style=mixed_style,
        ),
        has_aux=True,
    )(params)
    return comps, grads


def _resolve_backward(backward, compute_dtype, mixed_style):
    """Default (None): the hand-written backward wherever it is supported —
    measured 24-34% faster than the traced-autodiff kernel on-chip
    (results/scale_ablation.json: full 0.486 s -> manual 0.390 s,
    eps-streamed 0.433 -> 0.323 s at 131072x200) — with autodiff kept for
    the bf16_chain parity mode, whose whole-chain casts ARE the autodiff
    structure the manual path replaces."""
    manual_ok = compute_dtype is None or mixed_style == "f32_acts"
    if backward is None:
        return "manual" if manual_ok else "auto"
    if backward not in ("auto", "manual"):
        raise ValueError(
            f"backward must be 'auto' or 'manual' (got {backward!r})"
        )
    if backward == "manual" and not manual_ok:
        raise ValueError(
            "backward='manual' supports compute_dtype=None or the "
            "'f32_acts' mixed style (bf16_chain keeps the autodiff path)"
        )
    return backward


def _pack_corpus(x_flat, cond, mask, eps, latent_dim: int):
    """Pack [x_flat | cond | mask (| eps)] into ONE (N, F+C+1[+Z]) operand.

    One streamed input instead of four: the packed width (~33-41) still
    lane-pads to 128 in VMEM, so the narrow side arrays ride along for free
    instead of each paying their own (tile, 128) double-buffered block.
    The eps columns exist ONLY for the explicit-eps ('packed') mode — the
    hbm/prng modes never read them, and zero-filling them would stream
    Z dead columns (~20% of the corpus row) from HBM every epoch."""
    n = x_flat.shape[0]
    cols = [x_flat, cond, mask.reshape(n, 1)]
    if eps is not None:
        # the kernels slice the eps columns at [F+C+1 : F+C+1+latent_dim]
        if eps.shape[1] != latent_dim:
            raise ValueError(
                f"explicit eps has {eps.shape[1]} columns, expected "
                f"latent_dim={latent_dim}"
            )
        cols.append(eps)
    return jnp.concatenate(cols, axis=1)


def _make_scale_kernel(cfg: CVAEConfig, weights: LossWeights, lr: float,
                       n_params: int, n_tiles: int, n_valid: float,
                       noise: str, compute_dtype, mixed_style,
                       backward="auto", _ablate=()):
    """``_ablate`` is ABLATION-ONLY (scripts/scale_ablation.py): a tuple of
    knobs that remove one layer of work each to decompose the kernel's
    wall — "noadam" (skip the last-tile Adam update), "noacc" (overwrite
    instead of read-add in the cross-tile gradient accumulate), "biasdot"
    (bias grads via an MXU ones-row dot instead of a VPU reduction —
    measured 37 ms SLOWER, kept as evidence), "dwT" (dW via explicit
    transpose + plain matmul instead of the batch-dim-contracting
    dot_general), "chaincd" (manual backward with the dY chain in the
    compute dtype — the round-5 candidate), "nodw" / "fwdonly" (manual
    backward with dW dots / the whole backward removed — bucket timers).
    Production callers leave it empty."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    F = cfg.seq_len * cfg.dim
    C = cfg.cond_dim
    Z = cfg.latent_dim
    n_in = 2 + (1 if noise == "hbm" else 0)

    def kernel(*refs):
        # layout: [seed, packed, (eps if hbm), p_in0..] → [out_p0.., metrics]
        # + scratch [m0.., v0.., acc0..]
        seed_ref = refs[0]
        x_ref = refs[1]
        eps_ref = refs[2] if noise == "hbm" else None
        p_refs = refs[n_in : n_in + n_params]
        out_refs = refs[n_in + n_params : n_in + 2 * n_params]
        metrics_ref = refs[n_in + 2 * n_params]
        scratch = refs[n_in + 1 + 2 * n_params :]
        m_refs = scratch[:n_params]
        v_refs = scratch[n_params : 2 * n_params]
        acc_refs = scratch[2 * n_params : 3 * n_params]

        e = pl.program_id(0)
        i = pl.program_id(1)

        @pl.when(jnp.logical_and(e == 0, i == 0))
        def _init():
            for dst, src in zip(out_refs, p_refs):
                dst[:] = src[:]
            for r in m_refs:
                r[:] = jnp.zeros_like(r)
            for r in v_refs:
                r[:] = jnp.zeros_like(r)

        packed = x_ref[:]
        x = packed[:, :F]
        cond = packed[:, F : F + C]
        mask = packed[:, F + C : F + C + 1].astype(jnp.float32)
        if noise == "hbm":
            eps = eps_ref[:]
        elif noise == "packed":
            eps = packed[:, F + C + 1 : F + C + 1 + Z]
        else:  # "prng": on-core Box–Muller, fresh per (epoch, tile)
            pltpu.prng_seed(seed_ref[0, 0] + e * n_tiles + i)
            eps = _normal_noise((x.shape[0], Z))

        params = [r[:] for r in out_refs]
        comps, grads = _value_and_grad(
            backward, params, x, cond, eps, cfg, weights, mask, n_valid,
            compute_dtype, mixed_style, bias_via_dot="biasdot" in _ablate,
            dw_mode="transpose" if "dwT" in _ablate else "contract0",
            chain_cd="chaincd" in _ablate,
            grads_mode=(
                "nodw" if "nodw" in _ablate
                else "none" if "fwdonly" in _ablate else "full"
            ),
        )
        row = jnp.concatenate([comps, jnp.zeros(3)])

        # metrics block = 8 epochs × 8 (Mosaic requires sublane blocks of 8
        # or the full dim); this epoch's row inside the block:
        mrow = e % 8

        @pl.when(i == 0)
        def _first_tile():
            for r, g in zip(acc_refs, grads):
                r[:] = g
            metrics_ref[mrow, :] = row

        @pl.when(i != 0)
        def _accumulate():
            for r, g in zip(acc_refs, grads):
                r[:] = g if "noacc" in _ablate else r[:] + g
            metrics_ref[mrow, :] = metrics_ref[mrow, :] + row

        if "noadam" in _ablate:
            return

        @pl.when(i == n_tiles - 1)
        def _adam():
            g = [r[:] for r in acc_refs]
            m = [r[:] for r in m_refs]
            v = [r[:] for r in v_refs]
            new_p, new_m, new_v = _adam_step(
                params, g, m, v, (e + 1).astype(jnp.float32), lr
            )
            for r, val in zip(out_refs, new_p):
                r[:] = val
            for r, val in zip(m_refs, new_m):
                r[:] = val
            for r, val in zip(v_refs, new_v):
                r[:] = val

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "weights", "epochs", "lr", "tile", "n_valid", "compute_dtype",
        "mixed_style", "noise", "interpret", "backward", "noise_impl",
        "_ablate",
    ),
)
def _fused_scale_call(plist, packed, seed, cfg, weights, epochs, lr, tile,
                      n_valid, compute_dtype, mixed_style, noise,
                      interpret=False, backward="auto",
                      noise_impl=_DEFAULT_NOISE_IMPL, _ablate=()):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = len(plist)
    n_pad, width = packed.shape
    n_tiles = n_pad // tile
    kernel = _make_scale_kernel(
        cfg, weights, lr, n, n_tiles, n_valid, noise, compute_dtype,
        mixed_style, backward, _ablate=_ablate,
    )

    def const_block(arr):  # whole array, VMEM-resident across the grid
        return pl.BlockSpec(
            arr.shape, lambda e, i: (0,) * arr.ndim, memory_space=pltpu.VMEM
        )

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    in_specs.append(
        pl.BlockSpec((tile, width), lambda e, i: (i, 0), memory_space=pltpu.VMEM)
    )
    operands = [seed, packed]
    if noise == "hbm":
        # fresh-per-epoch reparameterization noise, pre-generated by ONE
        # cheap XLA program in the same jitted program as the kernel (so
        # its cost is inside every timing) and streamed from HBM one
        # (tile, Z) block per grid step.  Layout: epoch-major rows, so the
        # grid's (e, i) step reads block e·n_tiles + i — sequential blocks,
        # double-buffered by Pallas like the corpus stream.
        Z = cfg.latent_dim
        noise_key = jax.random.fold_in(
            jax.random.key(seed[0, 0], impl=noise_impl), 1
        )
        # generate FLAT, then reshape: a (rows, 8) generation request pads
        # its u32 bits temp to 128 lanes — measured 12.5 GiB for the bench
        # shape under rbg, an instant HBM OOM — while the flat request is
        # unpadded and value-identical (row-major) for every impl
        eps_all = jax.random.normal(
            noise_key, (epochs * n_pad * Z,), jnp.float32
        )
        if compute_dtype is not None:
            eps_all = eps_all.astype(compute_dtype)
        eps_all = eps_all.reshape(epochs * n_pad, Z)
        in_specs.append(
            pl.BlockSpec(
                (tile, Z), lambda e, i, _nt=n_tiles: (e * _nt + i, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(eps_all)
    in_specs += [const_block(p) for p in plist]
    # metrics rows are grouped 8 epochs per block (Mosaic block-shape rule:
    # sublane dim must be a multiple of 8 or the full array dim); callers
    # slice the [:epochs] rows
    e_pad = -(-epochs // 8) * 8
    out_shape = tuple(
        jax.ShapeDtypeStruct(p.shape, p.dtype) for p in plist
    ) + (jax.ShapeDtypeStruct((e_pad, 8), jnp.float32),)
    out_specs = tuple(const_block(p) for p in plist) + (
        pl.BlockSpec((8, 8), lambda e, i: (e // 8, 0), memory_space=pltpu.VMEM),
    )
    scratch = [pltpu.VMEM(p.shape, jnp.float32) for p in plist] * 3

    outs = pl.pallas_call(
        kernel,
        grid=(epochs, n_tiles),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        # the default 16 MB scoped-vmem limit is far under the v5e core's
        # 128 MiB; raising it is what makes MXU-efficient tiles (>=1024
        # rows) compile — measured: tile=1024 bf16 needs 16.23 MB scoped
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(*operands, *plist)
    return outs[:n], outs[n]


def fused_train_scale(
    windows: np.ndarray,
    epochs: int = 200,
    lr: float = 1e-3,
    weights: LossWeights = LossWeights(),
    seed: int = 0,
    tile: int = 2048,
    compute_dtype: str | None = "bfloat16",
    mixed_style: str = "f32_acts",
    eps: np.ndarray = None,
    noise: str = "hbm",
    noise_impl: str = _DEFAULT_NOISE_IMPL,
    interpret: bool = False,
    backward: str = None,
) -> Tuple[Params, Dict[str, np.ndarray]]:
    """Train on a production-scale corpus entirely inside ONE kernel launch.

    Full-batch-Adam equivalent of ``train.train(windows, ...)`` on large
    corpora (same init, objective, optimizer; noise stream differs as for
    the other fused kernels): the corpus is streamed through VMEM in
    ``tile``-row blocks with exact gradient accumulation — see the module
    docstring for the roofline argument.

    Args:
        tile: streamed block height; must keep the tile's activations in
            VMEM (guarded).  Rows are padded to a multiple of ``tile`` with
            masked zero windows, so any corpus size works.
        compute_dtype: ``"bfloat16"`` (default — stores the streamed corpus
            in bf16 and feeds the MXU bf16 operands over f32 masters) or
            ``None`` (pure f32, the oracle-matched mode).
        mixed_style: ``"f32_acts"`` (default — only matmul operands are
            cast; activations/loss stay f32, deleting per-layer VPU casts)
            or ``"bf16_chain"`` (the scan trainer's whole-chain recipe);
            see ``_forward_loss``.
        eps: optional (N, latent) explicit noise held constant across
            epochs — the interpret-mode escape hatch shared with the other
            fused kernels.  Overrides ``noise``.
        noise: ``"hbm"`` (default — every epoch's eps pre-generated by XLA
            in the same jitted program and streamed from HBM; fresh i.i.d.
            noise per epoch like the scan trainer, measured fastest) or
            ``"prng"`` (on-core Box–Muller; same statistical semantics, no
            eps buffer — the fallback when ``epochs × N`` would not fit
            HBM, guarded).
        noise_impl: PRNG behind the hbm buffer — ``"rbg"`` (default, the
            hardware RngBitGenerator; bit stream is backend-dependent) or
            ``"threefry2x32"`` (backend-stable; 28% slower END-TO-END at
            the bench shape — results/hot_probe.json, mechanism note in
            the module docstring).
        backward: ``"auto"`` (``jax.value_and_grad`` traced inside the
            kernel) or ``"manual"`` (the hand-written backward of
            :mod:`.manual_grad` — same math, restructured ops that dodge
            Mosaic's autodiff-lowering overhead; f32 is fp-equivalent up
            to merged-head sum reassociation, f32_acts additionally
            differs in the last bf16 bit).  Default
            ``None`` selects manual wherever supported (measured 24-34%
            faster on-chip — see ``_resolve_backward``).
    """
    if mixed_style not in ("f32_acts", "bf16_chain"):
        raise ValueError(
            f"mixed_style must be 'f32_acts' or 'bf16_chain' "
            f"(got {mixed_style!r})"
        )
    backward = _resolve_backward(backward, compute_dtype, mixed_style)
    cfg = CVAEConfig(seq_len=windows.shape[1], dim=windows.shape[2])
    _check_vmem_budget(cfg)
    _check_scale_tile(cfg, tile, compute_dtype, mixed_style)
    x_flat, start = fused_inputs(windows)
    n = x_flat.shape[0]
    n_pad = -(-n // tile) * tile

    # 'packed' (eps baked into the corpus rows) is reachable ONLY via the
    # explicit-eps override: the corpus carries eps columns exactly when an
    # explicit eps is given (hbm/prng corpora are packed without them —
    # zero-filled eps columns would be dead HBM traffic every epoch)
    if eps is not None:
        noise = "packed"
    elif noise not in ("hbm", "prng"):
        raise ValueError(f"noise must be 'hbm' or 'prng' (got {noise!r})")
    if noise == "hbm":
        _check_eps_hbm_budget(epochs, n_pad, cfg.latent_dim, compute_dtype)
    eps_j = None if eps is None else jnp.asarray(eps, jnp.float32)
    packed = _pack_corpus(
        x_flat, start, jnp.ones((n,), jnp.float32), eps_j, cfg.latent_dim
    )
    if n_pad != n:
        packed = jnp.concatenate(
            [packed, jnp.zeros((n_pad - n, packed.shape[1]), jnp.float32)]
        )
    cdt = None if compute_dtype is None else jnp.dtype(compute_dtype)
    if cdt is not None:
        packed = packed.astype(cdt)

    params = init_params(jax.random.PRNGKey(seed), cfg)
    plist = _flatten_params(params)
    seed_arr = jnp.array([[seed]], jnp.int32)

    out_plist, metrics = _fused_scale_call(
        tuple(plist), packed, seed_arr, cfg, weights, epochs, lr, tile,
        float(n), cdt, mixed_style, noise, interpret=interpret,
        backward=backward, noise_impl=noise_impl,
    )
    metrics = np.asarray(metrics)[:epochs, :5]
    history = {k: metrics[:, i] for i, k in enumerate(FUSED_METRIC_KEYS)}
    return _unflatten_params(list(out_plist)), history


def _make_grad_kernel(cfg: CVAEConfig, weights: LossWeights, n_params: int,
                      n_tiles: int, n_valid: float, noise: str,
                      compute_dtype, mixed_style, backward="auto"):
    """ONE-EPOCH gradient kernel: grid over corpus tiles only.

    The whole-run kernel above owns the single-chip regime; this kernel is
    the data-parallel building block — it returns the tile-summed gradients
    and loss components for its device's corpus shard, so the caller can
    ``psum`` them over the mesh 'data' axis and apply a replicated Adam
    step (``fused_train_scale_dp``).  Gradients accumulate directly in the
    output blocks (constant index map → VMEM-resident across the grid)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    F = cfg.seq_len * cfg.dim
    C = cfg.cond_dim
    Z = cfg.latent_dim
    n_in = 2 + (1 if noise == "hbm" else 0)

    def kernel(*refs):
        # layout: [stream_base, packed, (eps if hbm), p0..] → [g0.., metrics]
        base_ref = refs[0]
        x_ref = refs[1]
        eps_ref = refs[2] if noise == "hbm" else None
        p_refs = refs[n_in : n_in + n_params]
        g_refs = refs[n_in + n_params : n_in + 2 * n_params]
        metrics_ref = refs[n_in + 2 * n_params]

        i = pl.program_id(0)
        packed = x_ref[:]
        x = packed[:, :F]
        cond = packed[:, F : F + C]
        mask = packed[:, F + C : F + C + 1].astype(jnp.float32)
        if noise == "hbm":
            # this epoch's eps shard, generated by the scan body's XLA
            # program and streamed alongside the corpus
            eps = eps_ref[:]
        elif noise == "packed":
            eps = packed[:, F + C + 1 : F + C + 1 + Z]
        else:
            # stream base = seed + (device·epochs + epoch)·n_tiles, threaded
            # from the scan body — i.i.d. draws across devices, epochs, tiles
            pltpu.prng_seed(base_ref[0, 0] + i)
            eps = _normal_noise((x.shape[0], Z))

        params = [r[:] for r in p_refs]
        comps, grads = _value_and_grad(
            backward, params, x, cond, eps, cfg, weights, mask, n_valid,
            compute_dtype, mixed_style,
        )
        row = jnp.concatenate([comps, jnp.zeros(3)])

        @pl.when(i == 0)
        def _first_tile():
            for r, g in zip(g_refs, grads):
                r[:] = g
            metrics_ref[0, :] = row

        @pl.when(i != 0)
        def _accumulate():
            for r, g in zip(g_refs, grads):
                r[:] = r[:] + g
            metrics_ref[0, :] = metrics_ref[0, :] + row

    return kernel


def _grad_epoch_call(plist, packed, stream_base, cfg, weights, tile, n_valid,
                     compute_dtype, mixed_style, noise, eps_epoch=None,
                     interpret=False, backward="auto"):
    """One epoch's (grads, loss row) over one device's corpus shard.

    NOT jitted itself — it is traced inside ``fused_train_scale_dp``'s scan
    body (one kernel launch per epoch inside one compiled program).
    ``eps_epoch`` ((n_pad, Z), required iff ``noise == "hbm"``) is this
    epoch's noise, generated by the scan body and streamed tile by tile."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad, width = packed.shape
    n_tiles = n_pad // tile
    kernel = _make_grad_kernel(
        cfg, weights, len(plist), n_tiles, n_valid, noise, compute_dtype,
        mixed_style, backward,
    )

    def const_block(arr):
        return pl.BlockSpec(
            arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM
        )

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    in_specs.append(
        pl.BlockSpec((tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM)
    )
    operands = [stream_base, packed]
    if noise == "hbm":
        in_specs.append(
            pl.BlockSpec(
                (tile, cfg.latent_dim), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(eps_epoch)
    in_specs += [const_block(p) for p in plist]
    out_shape = tuple(
        jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in plist
    ) + (jax.ShapeDtypeStruct((1, 8), jnp.float32),)
    out_specs = tuple(const_block(p) for p in plist) + (
        pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
    )
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(*operands, *plist)
    return list(outs[:-1]), outs[-1]


def fused_train_scale_dp(
    windows: np.ndarray,
    mesh=None,
    epochs: int = 200,
    lr: float = 1e-3,
    weights: LossWeights = LossWeights(),
    seed: int = 0,
    tile: int = 2048,
    compute_dtype: str | None = "bfloat16",
    mixed_style: str = "f32_acts",
    eps: np.ndarray = None,
    noise: str = "hbm",
    noise_impl: str = _DEFAULT_NOISE_IMPL,
    interpret: bool = False,
    backward: str = None,
) -> Tuple[Params, Dict[str, np.ndarray]]:
    """Data-parallel production-scale training with the streaming kernel.

    The multi-chip tier of :func:`fused_train_scale` (SURVEY §2 parallelism
    directive: DP over trajectories is the one axis this workload warrants):
    the corpus is sharded over the mesh 'data' axis, each device runs the
    per-epoch gradient kernel (:func:`_grad_epoch_call` — activations never
    in HBM, exactly like the whole-run kernel) on its shard, gradients ride
    ICI through one ``lax.psum`` per epoch, and a replicated Adam step
    keeps parameters identical on every device.  The whole run is still ONE
    compiled program (``lax.scan`` over epochs inside ``jax.shard_map``);
    what moves from the whole-run kernel to XLA is only the per-epoch
    grad-sync + Adam, which is what makes the cross-device reduction
    possible at all.

    Objective and optimizer match ``fused_train_scale`` exactly: per-tile
    losses are scaled by the GLOBAL valid-row count, so tile sums + the
    cross-device psum reproduce the full-batch means regardless of dp/tile
    layout.

    Args:
        mesh: ``jax.sharding.Mesh`` with a 'data' axis (e.g.
            ``parallel.create_mesh()``).  ``None`` runs the same per-epoch
            program on one device (no shard_map) — the single-chip
            per-epoch variant.
        eps: optional (N, latent) explicit noise held constant across
            epochs — the interpret-mode escape hatch shared with the other
            fused kernels.  Overrides ``noise``.
        noise: ``"hbm"`` (default — each epoch's eps generated by XLA in
            the scan body, per device from
            ``fold_in(key, device·epochs + epoch)``, and streamed to the
            kernel tile by tile) or ``"prng"`` (on-core Box–Muller, seeded
            i.i.d. per device × epoch × tile).  Same statistical
            semantics; the per-epoch buffer here is only (shard, Z), so
            there is no HBM budget concern.
        backward: ``"auto"`` or ``"manual"`` — see
            :func:`fused_train_scale`.
    """
    if mixed_style not in ("f32_acts", "bf16_chain"):
        raise ValueError(
            f"mixed_style must be 'f32_acts' or 'bf16_chain' "
            f"(got {mixed_style!r})"
        )
    backward = _resolve_backward(backward, compute_dtype, mixed_style)
    cfg = CVAEConfig(seq_len=windows.shape[1], dim=windows.shape[2])
    _check_vmem_budget(cfg)
    _check_scale_tile(cfg, tile, compute_dtype, mixed_style)
    dp = 1 if mesh is None else mesh.shape["data"]
    x_flat, start = fused_inputs(windows)
    n = x_flat.shape[0]
    chunk = dp * tile
    n_pad = -(-n // chunk) * chunk

    # as in fused_train_scale: 'packed' (and its eps columns) only via the
    # explicit-eps override
    if eps is not None:
        noise = "packed"
    elif noise not in ("hbm", "prng"):
        raise ValueError(f"noise must be 'hbm' or 'prng' (got {noise!r})")
    eps_j = None if eps is None else jnp.asarray(eps, jnp.float32)
    packed = _pack_corpus(
        x_flat, start, jnp.ones((n,), jnp.float32), eps_j, cfg.latent_dim
    )
    if n_pad != n:
        packed = jnp.concatenate(
            [packed, jnp.zeros((n_pad - n, packed.shape[1]), jnp.float32)]
        )
    cdt = None if compute_dtype is None else jnp.dtype(compute_dtype)
    if cdt is not None:
        packed = packed.astype(cdt)

    params = init_params(jax.random.PRNGKey(seed), cfg)
    plist = _flatten_params(params)
    local_tiles = (n_pad // dp) // tile

    def run(plist, packed_local, seed_val):
        dev = (
            jnp.int32(0)
            if mesh is None
            else jax.lax.axis_index("data").astype(jnp.int32)
        )

        def body(carry, e):
            pl_, m, v = carry
            base = seed_val + (dev * epochs + e) * local_tiles
            eps_epoch = None
            if noise == "hbm":
                # fresh eps for this (device, epoch): one cheap XLA normal
                # per scan step, streamed into the kernel alongside the
                # corpus shard
                k = jax.random.fold_in(
                    jax.random.key(seed_val, impl=noise_impl),
                    dev * epochs + e,
                )
                eps_epoch = jax.random.normal(
                    k, (packed_local.shape[0], cfg.latent_dim), jnp.float32
                )
                if cdt is not None:
                    eps_epoch = eps_epoch.astype(cdt)
            grads, mrow = _grad_epoch_call(
                pl_, packed_local, base.reshape(1, 1).astype(jnp.int32),
                cfg, weights, tile, float(n), cdt, mixed_style, noise,
                eps_epoch=eps_epoch, interpret=interpret, backward=backward,
            )
            if mesh is not None:
                grads = [jax.lax.psum(g, "data") for g in grads]
                mrow = jax.lax.psum(mrow, "data")
            pl_, m, v = _adam_step(
                pl_, grads, m, v, (e + 1).astype(jnp.float32), lr
            )
            return (tuple(pl_), tuple(m), tuple(v)), mrow[0, :5]

        zeros = tuple(jnp.zeros_like(p) for p in plist)
        (plist_out, _, _), metrics = jax.lax.scan(
            body, (tuple(plist), zeros, zeros), jnp.arange(epochs)
        )
        return tuple(plist_out), metrics

    if mesh is None:
        run_c = jax.jit(run)
        out_plist, metrics = run_c(
            tuple(plist), packed, jnp.int32(seed)
        )
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_p = len(plist)
        shard_spec = P("data", *([None] * (packed.ndim - 1)))
        run_s = jax.shard_map(
            run,
            mesh=mesh,
            in_specs=((P(),) * n_p, shard_spec, P()),
            out_specs=((P(),) * n_p, P()),
            # pallas_call's out_shape carries no varying-mesh-axes (vma)
            # annotation in this jax version, so the automatic replication
            # checker cannot type it; the replication contract is enforced
            # by the tests instead (sharded == single-device == oracle)
            check_vma=False,
        )
        packed = jax.device_put(packed, NamedSharding(mesh, shard_spec))
        plist = [
            jax.device_put(p, NamedSharding(mesh, P())) for p in plist
        ]
        out_plist, metrics = jax.jit(run_s)(
            tuple(plist), packed, jnp.int32(seed)
        )

    metrics = np.asarray(metrics)
    history = {k: metrics[:, i] for i, k in enumerate(FUSED_METRIC_KEYS)}
    return _unflatten_params(list(out_plist)), history


# scoped-vmem ceiling requested from Mosaic (v5e physical VMEM: 128 MiB /
# core; leave headroom for the framework's own scoped use)
_VMEM_LIMIT_BYTES = 100 * 2**20


def _check_scale_tile(cfg: CVAEConfig, tile: int, compute_dtype,
                      mixed_style="f32_acts"):
    """Refuse tile shapes that cannot compile: Mosaic sublane alignment (8
    for f32, 16 for bf16) and the scoped-vmem envelope for the tile's
    backward-pass activation set.  Calibrated against the compiler's own
    accounting: tile=1024 bf16_chain measured 16.23 MB scoped → ~12.5
    KB/row variable part on top of ~3.5 MB fixed (params+Adam+acc+corpus
    blocks); f32 activations (pure f32 AND the f32_acts mixed style)
    double the per-row bytes."""
    align = 16 if compute_dtype is not None else 8
    if tile % align != 0 or tile <= 0:
        raise ValueError(
            f"tile must be a positive multiple of {align} for "
            f"compute_dtype={compute_dtype} (got {tile})"
        )
    bf16_acts = compute_dtype is not None and mixed_style == "bf16_chain"
    per_row_kb = 12.5 if bf16_acts else 25.0
    est_mb = 3.5 + tile * per_row_kb / 1024
    if est_mb * 2**20 > _VMEM_LIMIT_BYTES:
        raise ValueError(
            f"tile={tile} needs ~{est_mb:.0f} MB scoped VMEM for "
            f"backward-pass activations (> {_VMEM_LIMIT_BYTES >> 20} MB "
            f"limit); use a smaller tile"
        )


def _check_eps_hbm_budget(epochs: int, n_pad: int, latent_dim: int,
                          compute_dtype, limit_bytes: int = 2 << 30):
    """The hbm noise mode materializes every epoch's eps at once
    (epochs × n_pad × Z); refuse configurations that would not comfortably
    fit v5e HBM (16 GB) next to the corpus, and point at the prng mode,
    whose semantics are identical.  The accounting includes the
    GENERATION transient, not just the final buffer: the XLA program
    materializes the RngBitGenerator's u32 bits (4 B/elem) before the
    normal-transform + cast can fuse into the compute-dtype output, so
    peak allocation is ~(4 + itemsize) B/elem — 3× the bf16 buffer
    alone."""
    itemsize = 4 if compute_dtype is None else jnp.dtype(compute_dtype).itemsize
    elems = epochs * n_pad * latent_dim
    need = elems * (4 + itemsize)  # u32 bits temp + final buffer
    if need > limit_bytes:
        raise ValueError(
            f"noise='hbm' peaks at {need / 2**30:.1f} GiB for the eps "
            f"buffer + its u32 generation temp ({epochs} epochs x {n_pad} "
            f"rows x {latent_dim}) — over the {limit_bytes >> 30} GiB "
            f"guard; use noise='prng' (same statistical semantics, "
            f"on-core generation)"
        )


def fused_scale_reference(
    params: Params,
    windows: np.ndarray,
    eps: np.ndarray,
    epochs: int,
    lr: float = 1e-3,
    weights: LossWeights = LossWeights(),
    tile: int = None,
) -> Tuple[Params, np.ndarray]:
    """Plain-XLA mirror of the kernel's tiled accumulation — the oracle the
    scale kernel is validated against in tests (explicit eps, f32).

    ``eps`` is either (N, Z) — held constant across epochs, mirroring the
    kernels' explicit-``eps`` escape hatch — or (epochs, N, Z) — one draw
    per epoch, mirroring the ``noise='hbm'``/``'prng'`` production
    semantics (tests feed it the byte-identical stream the hbm mode
    generates on device).

    ``tile=None`` runs full-batch (mathematically identical; fp summation
    order differs); an explicit ``tile`` reproduces the kernel's exact
    per-tile partial-sum order."""
    cfg = CVAEConfig(seq_len=windows.shape[1], dim=windows.shape[2])
    x_flat, start = fused_inputs(windows)
    n = x_flat.shape[0]
    eps_j = jnp.asarray(eps, jnp.float32)
    per_epoch = eps_j.ndim == 3
    mask = jnp.ones((n, 1), jnp.float32)
    if tile is None:
        tile = n
    n_pad = -(-n // tile) * tile
    if n_pad != n:
        pad = n_pad - n
        x_flat = jnp.concatenate([x_flat, jnp.zeros((pad, x_flat.shape[1]))])
        start = jnp.concatenate([start, jnp.zeros((pad, start.shape[1]))])
        zpad = jnp.zeros(
            eps_j.shape[:-2] + (pad, eps_j.shape[-1]), jnp.float32
        )
        eps_j = jnp.concatenate([eps_j, zpad], axis=-2)
        mask = jnp.concatenate([mask, jnp.zeros((pad, 1))])

    plist = _flatten_params(params)
    m = [jnp.zeros_like(p) for p in plist]
    v = [jnp.zeros_like(p) for p in plist]
    hist = []
    for t in range(epochs):
        eps_t = eps_j[t] if per_epoch else eps_j
        acc = None
        comps_sum = None
        for i in range(n_pad // tile):
            sl = slice(i * tile, (i + 1) * tile)
            (_, comps), grads = jax.value_and_grad(
                lambda pl_: _forward_loss(
                    pl_, x_flat[sl], start[sl], eps_t[sl], cfg, weights,
                    mask[sl], n_valid=float(n),
                ),
                has_aux=True,
            )(plist)
            acc = grads if acc is None else [a + g for a, g in zip(acc, grads)]
            comps_sum = comps if comps_sum is None else comps_sum + comps
        plist, m, v = _adam_step(plist, acc, m, v, jnp.asarray(t + 1.0), lr)
        hist.append(np.asarray(comps_sum))
    return _unflatten_params(plist), np.stack(hist)
