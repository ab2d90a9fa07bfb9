"""Fused Pallas training kernel: the ENTIRE training run in one kernel.

The scan-based trainer (``train.train``) already compiles the 3000-epoch
run into one device program, but each epoch still lowers to ~25 small HLO
ops whose fixed launch cost dominates at this model size (~0.6 ms/epoch on
v5e).  This kernel goes further: parameters, Adam state, and activations
live in VMEM for the whole run; a single ``fori_loop`` over epochs does
forward + backward (via ``jax.value_and_grad`` traced *inside* the kernel)
+ Adam in place, with reparameterization noise from the on-core PRNG
(Box–Muller over ``pltpu.prng_random_bits``).  No HBM traffic between
epochs except the per-epoch metric row.

VMEM budget: ~110k parameters ×3 (p, m, v) ≈ 1.3 MB + batch ≤ 136×30 —
far under the ~16 MB/core limit, which is what makes the
whole-run-in-VMEM design possible.

Semantics match ``train.train`` exactly (same init, loss, Adam) except the
noise stream: the scan trainer uses jax PRNG keys, this kernel uses the
TPU core PRNG — both are i.i.d. N(0, I) draws, and training curves agree
statistically (see tests).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import CVAEConfig, LossWeights, init_params, to_relative
from ..models.cvae import Params

FUSED_METRIC_KEYS = ("total", "recon", "kld", "start", "time")

# fixed parameter order for the flat kernel operand list
_LAYERS = (
    "cond_0", "cond_1",
    "enc_0", "enc_1", "enc_2", "enc_3",
    "fc_mu", "fc_logvar",
    "dec_0", "dec_1", "dec_2", "dec_3",
)


def _flatten_params(params: Params):
    flat = []
    for name in _LAYERS:
        flat.append(params[name]["w"])
        flat.append(params[name]["b"].reshape(1, -1))  # 2-D for VMEM tiling
    return flat


def _unflatten_params(flat) -> Params:
    out: Params = {}
    for i, name in enumerate(_LAYERS):
        out[name] = {"w": flat[2 * i], "b": flat[2 * i + 1].reshape(-1)}
    return out


def _forward_loss(plist, x_flat, cond, eps, cfg: CVAEConfig, w: LossWeights,
                  mask=None, n_valid=None, compute_dtype=None,
                  mixed_style="f32_acts"):
    """Pure loss over the flat param list; mirrors models.cvae.forward +
    losses.cvae_loss on flattened (B, T·D) windows with explicit noise.
    ``mask`` (B,) enables padded multi-scenario batches (same semantics as
    models.losses masked means).

    ``n_valid`` (optional, static float) overrides the masked denominator
    ``sum(mask)``: with the GLOBAL valid-row count, per-tile losses become
    partial sums of the full-batch mean — summing them over tiles
    reproduces the full-batch objective exactly (the grad-accumulation
    contract of :mod:`.fused_scale`).

    ``compute_dtype`` (e.g. ``jnp.bfloat16``) enables mixed precision in
    one of two styles (``mixed_style``):

    - ``"f32_acts"`` (default): only the MATMUL OPERANDS are cast to the
      compute dtype — activations, biases, transcendentals, and the loss
      stay f32 (the dtype the MXU accumulates in anyway).  Same MXU rate,
      but the per-layer down-casts and the f32-compare relu workaround
      disappear, which matters inside the Pallas kernel where the VPU is
      the ceiling.
    - ``"bf16_chain"``: the whole forward/backward chain runs in the
      compute dtype with f32 loss reductions — the scan trainer's
      (``train.TrainConfig.compute_dtype``) recipe, kept for parity
      comparisons.

    Grads flow back through the casts and land in f32 against the f32
    masters either way."""
    f32_acts = compute_dtype is not None and mixed_style == "f32_acts"
    if compute_dtype is not None and not f32_acts:
        plist = [a.astype(compute_dtype) for a in plist]
        cond = cond.astype(compute_dtype)
        eps = eps.astype(compute_dtype)
        x_cast = x_flat.astype(compute_dtype)
    elif f32_acts:
        # the streamed corpus arrives in the compute dtype; one up-cast of
        # the narrow input columns, then everything but dot operands is f32
        cond = cond.astype(jnp.float32)
        eps = eps.astype(jnp.float32)
        x_cast = x_flat.astype(jnp.float32)
    else:
        x_cast = x_flat
    p = {n: (plist[2 * i], plist[2 * i + 1]) for i, n in enumerate(_LAYERS)}

    def lin(name, h):
        W, b = p[name]
        # Always accumulate in f32: the MXU accumulates bf16 matmuls in
        # f32 regardless (Mosaic REJECTS a bf16 acc — 'Expected matmul acc
        # to be 32-bit'), and XLA's bf16 dot has the same round-after-
        # f32-accumulate semantics, so the mixed path stays equivalent to
        # the scan trainer's.
        if f32_acts:
            out = jnp.dot(
                h.astype(compute_dtype), W.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            return out + b  # b stays f32
        out = jnp.dot(h, W, preferred_element_type=jnp.float32)
        if compute_dtype is not None:
            out = out.astype(compute_dtype)
        return out + b

    if compute_dtype is None or f32_acts:
        relu = lambda h: jnp.maximum(h, jnp.zeros((), h.dtype))
    else:
        # Mosaic can't cmpf bf16 vectors ('Target does not support this
        # comparison' — jnp.maximum's VJP emits an eq in the operand
        # dtype); compare in f32 and select instead.  Same values; the
        # gradient mask is h>0 vs maximum's h>=0 — they differ only on
        # exact zeros, measure-zero for training and irrelevant to the
        # bf16 mode's descend-contract.
        def relu(h):
            keep = h.astype(jnp.float32) > 0.0
            return jnp.where(keep, h, jnp.zeros((), h.dtype))

    hc = relu(lin("cond_1", relu(lin("cond_0", cond))))
    h = x_cast
    for name in ("enc_0", "enc_1", "enc_2", "enc_3"):
        h = relu(lin(name, h))
    hcat = jnp.concatenate([h, hc], axis=1)
    mu = lin("fc_mu", hcat)
    logvar = lin("fc_logvar", hcat)
    if compute_dtype is None or f32_acts:
        z = mu + eps * jnp.exp(0.5 * logvar)
    else:
        # transcendentals run on the f32 VPU path (Mosaic's bf16
        # exp support is spotty like cmpf); round the std back down
        std = jnp.exp(0.5 * logvar.astype(jnp.float32)).astype(compute_dtype)
        z = mu + eps * std
    g = jnp.concatenate([z, hc], axis=1)
    for name in ("dec_0", "dec_1", "dec_2"):
        g = relu(lin(name, g))
    recon = lin("dec_3", g)  # (B, T·D)

    if compute_dtype is not None:
        # loss terms (squared errors, exp, means) reduce in float32 —
        # mirrors train.make_train_step's post-forward up-cast.  The recon
        # TARGET is the compute-dtype x (the streamed corpus is stored in
        # that dtype), so the objective is the bf16-rounded corpus's.
        recon, mu, logvar = (a.astype(jnp.float32) for a in (recon, mu, logvar))
        x_flat = x_cast.astype(jnp.float32)

    T, D = cfg.seq_len, cfg.dim
    if mask is None:
        mean_rows = jnp.mean
    else:
        # keep the mask 2-D throughout: Mosaic rejects 1-D reductions
        m_col = mask if mask.ndim == 2 else mask[:, None]
        denom = (
            jnp.maximum(jnp.sum(m_col), 1.0)
            if n_valid is None
            else jnp.asarray(n_valid, jnp.float32)
        )

        def mean_rows(arr):
            per_row_elems = arr.shape[1]
            return jnp.sum(arr * m_col) / (denom * per_row_elems)

    recon_loss = mean_rows((recon - x_flat) ** 2)
    kld = -0.5 * mean_rows(1.0 + logvar - mu**2 - jnp.exp(logvar))
    # flattened [t, dx, dy] layout: row-0 start offsets at columns 1, 2
    start_loss = mean_rows((recon[:, 1:3] - x_flat[:, 1:3]) ** 2)
    # time columns live at flat indices 0, D, 2D, …; a strided slice lowers
    # to a gather Mosaic rejects, so select the successive time DIFFS with a
    # (T·D, T−1) ±1 matrix built from iota — one small matmul on the MXU.
    rows = jax.lax.broadcasted_iota(jnp.int32, (T * D, T - 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (T * D, T - 1), 1)
    diff_mat = (
        (rows == D * (cols + 1)).astype(jnp.float32)
        - (rows == D * cols).astype(jnp.float32)
    )
    t_diffs = jnp.dot(recon, diff_mat, preferred_element_type=jnp.float32)
    time_loss = mean_rows(recon[:, 0:1] ** 2) + mean_rows(
        jnp.maximum(-t_diffs, 0.0)
    )
    total = (
        w.recon * recon_loss + w.kld * kld + w.start * start_loss + w.time * time_loss
    )
    return total, jnp.stack([total, recon_loss, kld, start_loss, time_loss])


def _check_backward_arg(backward):
    """These kernels are pure-f32, so both gradient paths are always
    available (no mixed-style restriction like fused_scale's)."""
    if backward not in ("auto", "manual"):
        raise ValueError(
            f"backward must be 'auto' or 'manual' (got {backward!r})"
        )


def _check_epoch_budget(epochs: int, buffers: int = 2):
    """The kernels' metrics block ((epochs, 8) in VMEM, lane-padded to 128,
    and DOUBLE-buffered by the grid pipeline — ``buffers=2`` for the grid
    kernels, 1 for the single whole-run kernel) caps epochs: measured on
    v5e, the grid at 3000 epochs compiles (~3 MB) and 30000 fails the
    16 MB scoped-vmem limit at 31 MB.  Refuse early with an actionable
    message instead of a Mosaic compiler OOM.  Note the fused kernels
    CANNOT resume (they re-init params and Adam state from the seed every
    call) — longer runs belong to the scan trainer's chunked resume."""
    mb = epochs * 128 * 4 * buffers / 1e6
    if mb > 12.5:
        raise ValueError(
            f"fused-kernel metrics buffer needs ~{mb:.0f} MB VMEM at "
            f"{epochs} epochs (~16 MB scoped limit incl. params/Adam); the "
            f"fused kernels cannot resume, so for longer runs use the scan "
            f"trainer's bit-exact chunked resume — train.train(epochs=N, "
            f"init_state=..., start_epoch=already_trained)"
        )


# back-compat alias (grid callers/tests)
_check_grid_epoch_budget = _check_epoch_budget


def _check_vmem_budget(cfg: CVAEConfig, limit_mb: float = 12.0):
    """The whole-run kernel holds params + Adam m/v in VMEM; refuse configs
    that cannot fit (measured envelope on v5e: hidden=256 works at ~6 MB,
    hidden=512 fails at ~23 MB against the ~16 MB core).  Use the XLA scan
    trainer (``train.train``) for larger models."""
    n = sum(fi * fo + fo for fi, fo in cfg.layer_spec().values())
    mb = n * 3 * 4 / 1e6
    if mb > limit_mb:
        raise ValueError(
            f"fused trainer needs ~{mb:.1f} MB VMEM for params+Adam state "
            f"(> {limit_mb} MB budget); use train.train for this model size"
        )


def _normal_noise(shape):
    """Box–Muller over the core PRNG → N(0, 1)."""
    from jax.experimental.pallas import tpu as pltpu

    def uniform():
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        # keep 24 high bits → non-negative int32 → f32 (Mosaic has no
        # uint32→f32 cast)
        small = pltpu.bitcast(bits >> 8, jnp.int32)
        return small.astype(jnp.float32) * (1.0 / (1 << 24))

    u1 = uniform() + 1e-7
    u2 = uniform()
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(2.0 * jnp.pi * u2)


def _adam_step(params, grads, m, v, tf, lr):
    """One Adam update over flat param lists (b1/b2/eps = optax defaults,
    matching the scan trainer).  ``tf`` is the 1-based step index as f32;
    bias correction uses ``b**t = exp(t·ln b)`` — Mosaic has no powf
    legalization.  Shared by every fused kernel so they cannot drift."""
    b1, b2, adam_eps = 0.9, 0.999, 1e-8
    bc1 = 1.0 - jnp.exp(tf * np.log(b1))
    bc2 = 1.0 - jnp.exp(tf * np.log(b2))
    new_p, new_m, new_v = [], [], []
    for p, g, mi, vi in zip(params, grads, m, v):
        mi = b1 * mi + (1 - b1) * g
        vi = b2 * vi + (1 - b2) * g * g
        update = (mi / bc1) / (jnp.sqrt(vi / bc2) + adam_eps)
        new_p.append(p - lr * update)
        new_m.append(mi)
        new_v.append(vi)
    return new_p, new_m, new_v


def _epoch_body(cfg, weights, lr, x, cond, mask, get_eps, write_metrics,
                backward="manual"):
    """The per-epoch training step shared by BOTH Pallas kernels (single
    whole-run and grid): explicit-or-core-PRNG noise, forward+backward over
    the flat params, Adam via :func:`_adam_step`, metric write.  One body →
    the single/grid kernels cannot drift apart.

    ``backward`` selects the gradient path: ``"manual"`` (default) is the
    hand-written backward of :mod:`.manual_grad` — fp-order-equivalent to
    autodiff in these kernels' pure-f32 regime, measured faster on-chip
    (the scale-kernel ablation pinned ~62% of traced-autodiff wall time on
    Mosaic's backward lowering; see fused_scale) — ``"auto"`` keeps the
    traced ``jax.value_and_grad``."""

    def body(t, carry):
        params, m, v = carry
        eps = get_eps()
        if backward == "manual":
            from .manual_grad import manual_value_and_grad

            comps, grads = manual_value_and_grad(
                params, x, cond, eps, cfg, weights, mask
            )
        else:
            (_, comps), grads = jax.value_and_grad(
                lambda pl_: _forward_loss(
                    pl_, x, cond, eps, cfg, weights, mask
                ),
                has_aux=True,
            )(params)
        new_p, new_m, new_v = _adam_step(
            params, grads, m, v, (t + 1).astype(jnp.float32), lr
        )
        write_metrics(t, comps)
        return new_p, new_m, new_v

    return body


def _make_kernel(cfg: CVAEConfig, weights: LossWeights, epochs: int, lr: float,
                 n_params: int, eps_input: bool, backward="manual"):
    from jax.experimental.pallas import tpu as pltpu

    def kernel(*refs):
        # layout: [seed, x, cond, (eps?), p0..pN-1] then outputs [out_p0..,
        # metrics] then scratch [m0.., v0..]
        seed_ref = refs[0]
        x_ref = refs[1]
        cond_ref = refs[2]
        off = 3
        eps_ref = None
        if eps_input:
            eps_ref = refs[3]
            off = 4
        p_refs = refs[off : off + n_params]
        out_refs = refs[off + n_params : off + 2 * n_params]
        metrics_ref = refs[off + 2 * n_params]

        if not eps_input:
            pltpu.prng_seed(seed_ref[0, 0])
        x = x_ref[:]
        cond = cond_ref[:]
        B = x.shape[0]

        params0 = [r[:] for r in p_refs]
        zeros = [jnp.zeros_like(p) for p in params0]

        def get_eps():
            if eps_input:
                return eps_ref[:]
            return _normal_noise((B, cfg.latent_dim))

        def write_metrics(t, comps):
            metrics_ref[t, :] = jnp.concatenate([comps, jnp.zeros(3)])

        body = _epoch_body(cfg, weights, lr, x, cond, None, get_eps,
                           write_metrics, backward)
        params, m, v = jax.lax.fori_loop(0, epochs, body, (params0, zeros, zeros))
        for r, p in zip(out_refs, params):
            r[:] = p

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "weights", "epochs", "lr", "interpret", "backward"),
)
def _fused_call(plist, x_flat, cond, seed, cfg, weights, epochs, lr,
                eps=None, interpret=False, backward="manual"):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = len(plist)
    eps_input = eps is not None
    kernel = _make_kernel(cfg, weights, epochs, lr, n, eps_input, backward)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 + (1 if eps_input else 0) + n)
    out_shape = tuple(
        jax.ShapeDtypeStruct(p.shape, p.dtype) for p in plist
    ) + (jax.ShapeDtypeStruct((epochs, 8), jnp.float32),)
    out_specs = tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n + 1))

    args = [seed, x_flat, cond]
    if eps_input:
        args.append(eps)
    args += list(plist)
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(*args)
    return outs[:n], outs[n]


def fused_train(
    windows: np.ndarray,
    epochs: int = 3000,
    lr: float = 1e-3,
    weights: LossWeights = LossWeights(),
    seed: int = 0,
    interpret: bool = False,
    backward: str = "manual",
) -> Tuple[Params, Dict[str, np.ndarray]]:
    """Train one scenario CVAE entirely inside one Pallas kernel.

    Drop-in equivalent of ``train.train(windows, ...)`` (same init, loss,
    optimizer; PRNG stream differs — see module docstring).  ``backward``:
    ``"manual"`` (default — the hand-written backward of
    :mod:`.manual_grad`, fp-order-equivalent in this kernel's pure-f32
    regime and measured faster on-chip) or ``"auto"`` (traced
    ``jax.value_and_grad``).
    """
    _check_backward_arg(backward)
    cfg = CVAEConfig(seq_len=windows.shape[1], dim=windows.shape[2])
    _check_vmem_budget(cfg)
    _check_epoch_budget(epochs, buffers=1)
    x_flat, start = fused_inputs(windows)

    params = init_params(jax.random.PRNGKey(seed), cfg)
    plist = _flatten_params(params)
    seed_arr = jnp.array([[seed]], jnp.int32)

    out_plist, metrics = _fused_call(
        tuple(plist), x_flat, start, seed_arr, cfg, weights, epochs, lr,
        interpret=interpret, backward=backward,
    )
    metrics = np.asarray(metrics)[:, :5]
    history = {k: metrics[:, i] for i, k in enumerate(FUSED_METRIC_KEYS)}
    return _unflatten_params(list(out_plist)), history


def fused_inputs(windows: np.ndarray) -> Tuple[jax.Array, jax.Array]:
    """Host→device input prep for the fused kernel: ``(x_flat, start)``.

    Delegates the abs→rel transform to the same :func:`to_relative` the
    scan trainer uses (reference ``Training_VAE.py:343-348``), so the two
    trainer tiers — and bench.py's pipelined throughput measurement —
    consume byte-identical inputs by construction."""
    batch = jnp.asarray(windows, jnp.float32)
    rel, start = to_relative(batch)
    return rel.reshape(batch.shape[0], -1), start


def _make_multi_kernel(cfg: CVAEConfig, weights: LossWeights, epochs: int,
                       lr: float, n_params: int, eps_input: bool,
                       backward="manual", use_mask=True, _metrics="full"):
    """Grid kernel: grid index = scenario; each program trains its own
    model on its own (padded, masked) batch block.

    ``eps_input`` swaps the on-core PRNG for an explicit per-scenario noise
    block (held constant across epochs), the same escape hatch the
    single-scenario kernel has — it is what lets interpret mode (whose
    ``prng_random_bits`` stub yields zeros that inf the Box–Muller
    transform) cover this kernel in the CPU suite.

    ``use_mask=False`` runs the UNMASKED epoch body (same one the
    single-scenario kernel uses): for callers whose batches have no
    padding (``fused_train_seeds`` — every program trains the full
    corpus) the all-ones mask only added dead VPU work to the per-epoch
    dependent chain.  ``_metrics`` is ABLATION-ONLY
    (scripts/grid_probe.py): "static" replaces the per-epoch
    dynamic-index metrics store with a row-0 overwrite to isolate its
    cost — history is invalid in that mode."""
    from jax.experimental.pallas import tpu as pltpu

    def kernel(*refs):
        seed_ref = refs[0]
        x_ref, cond_ref, mask_ref = refs[1], refs[2], refs[3]
        off = 4
        eps_ref = None
        if eps_input:
            eps_ref = refs[4]
            off = 5
        p_refs = refs[off : off + n_params]
        out_refs = refs[off + n_params : off + 2 * n_params]
        metrics_ref = refs[off + 2 * n_params]

        import jax.experimental.pallas as pl

        s = pl.program_id(0)
        if not eps_input:
            # per-program stream seed from the (1, S) SMEM row — lets the
            # grid axis carry arbitrary seed lists (fused_train_seeds), not
            # just base+index (fused_train_multi passes base+i rows)
            pltpu.prng_seed(seed_ref[0, s])
        x = x_ref[0]
        cond = cond_ref[0]
        # (B, 1), kept 2-D for Mosaic-friendly reductions
        mask = mask_ref[0] if use_mask else None
        B = x.shape[0]

        params0 = [r[0] for r in p_refs]
        zeros = [jnp.zeros_like(p) for p in params0]

        def get_eps():
            if eps_input:
                return eps_ref[0]
            return _normal_noise((B, cfg.latent_dim))

        if _metrics == "static":
            def write_metrics(t, comps):
                metrics_ref[0, 0, :] = jnp.concatenate([comps, jnp.zeros(3)])
        else:
            def write_metrics(t, comps):
                metrics_ref[0, t, :] = jnp.concatenate([comps, jnp.zeros(3)])

        body = _epoch_body(cfg, weights, lr, x, cond, mask, get_eps,
                           write_metrics, backward)
        params, _, _ = jax.lax.fori_loop(0, epochs, body, (params0, zeros, zeros))
        for r, p in zip(out_refs, params):
            r[0] = p

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "weights", "epochs", "lr", "interpret", "backward",
                     "use_mask", "_metrics"),
)
def _fused_multi_call(plists, x_flat, cond, mask, seed, cfg, weights, epochs, lr,
                      eps=None, interpret=False, backward="manual",
                      use_mask=True, _metrics="full"):
    """plists: per-param stacked arrays with leading scenario axis (S, …)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S = x_flat.shape[0]
    n = len(plists)
    eps_input = eps is not None
    kernel = _make_multi_kernel(cfg, weights, epochs, lr, n, eps_input, backward,
                                use_mask=use_mask, _metrics=_metrics)

    def block(arr):  # per-scenario block: slice leading axis by grid index
        shape = (1,) + arr.shape[1:]
        return pl.BlockSpec(shape, lambda i: (i,) + (0,) * (arr.ndim - 1),
                            memory_space=pltpu.VMEM)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    in_specs += [block(x_flat), block(cond), block(mask)]
    args = [seed, x_flat, cond, mask]
    if eps_input:
        in_specs.append(block(eps))
        args.append(eps)
    in_specs += [block(p) for p in plists]
    args += list(plists)
    out_shape = tuple(jax.ShapeDtypeStruct(p.shape, p.dtype) for p in plists) + (
        jax.ShapeDtypeStruct((S, epochs, 8), jnp.float32),
    )
    out_specs = tuple(block(p) for p in plists) + (
        pl.BlockSpec((1, epochs, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )
    outs = pl.pallas_call(
        kernel,
        grid=(S,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(*args)
    return outs[:n], outs[n]


def fused_train_multi(
    windows_by_scenario: Dict[str, np.ndarray],
    epochs: int = 3000,
    lr: float = 1e-3,
    weights: LossWeights = LossWeights(),
    seed: int = 0,
    eps_by_scenario: Dict[str, np.ndarray] = None,
    interpret: bool = False,
    backward: str = "manual",
) -> Tuple[Dict[str, Params], Dict[str, Dict[str, np.ndarray]]]:
    """Train every scenario model inside ONE Pallas kernel launch.

    The Pallas grid axis enumerates scenarios; each grid program runs the
    full training loop for its model on its own padded batch block (with a
    sample mask), so the whole four-corpus job is one compile and one
    launch.  Each scenario i trains with its own derived seeds
    (init ``PRNGKey(seed + i)``, core PRNG stream ``seed + grid index``) so
    the models are independent — NOT bit-identical to calling
    :func:`fused_train` per scenario with the same base ``seed``.

    ``eps_by_scenario`` (per-scenario ``(B_i, latent_dim)`` noise, held
    constant across epochs) replaces the on-core PRNG — the deterministic
    mode the CPU-suite equivalence test runs in interpret mode
    (``test_fused.py::test_fused_train_multi_matches_single_kernel``).
    """
    _check_backward_arg(backward)
    keys = sorted(windows_by_scenario.keys())
    first = next(iter(windows_by_scenario.values()))
    cfg = CVAEConfig(seq_len=first.shape[1], dim=first.shape[2])
    _check_grid_epoch_budget(epochs)
    n_max = max(w.shape[0] for w in windows_by_scenario.values())

    xs, conds, masks = [], [], []
    for k in keys:
        w = jnp.asarray(windows_by_scenario[k], jnp.float32)
        pad = n_max - w.shape[0]
        w = jnp.concatenate([w, jnp.tile(w[:1], (pad, 1, 1))], axis=0)
        # shared abs→rel transform (models.to_relative) — the grid kernel
        # must consume byte-identical inputs to the single kernel/scan tier
        rel, start = to_relative(w)
        xs.append(rel.reshape(n_max, -1))
        conds.append(start)
        masks.append(
            jnp.concatenate([jnp.ones(n_max - pad), jnp.zeros(pad)])[:, None]
        )
    x_flat = jnp.stack(xs)
    cond = jnp.stack(conds)
    mask = jnp.stack(masks)

    per_scenario_params = [
        _flatten_params(init_params(jax.random.PRNGKey(seed + i), cfg))
        for i in range(len(keys))
    ]
    plists = tuple(
        jnp.stack([p[j] for p in per_scenario_params])
        for j in range(len(per_scenario_params[0]))
    )
    seed_arr = jnp.array([[seed + i for i in range(len(keys))]], jnp.int32)

    eps = None
    if eps_by_scenario is not None:
        eps_blocks = []
        for k in keys:
            e = jnp.asarray(eps_by_scenario[k], jnp.float32)
            eps_blocks.append(
                jnp.concatenate([e, jnp.zeros((n_max - e.shape[0], e.shape[1]))])
            )
        eps = jnp.stack(eps_blocks)

    out_p, metrics = _fused_multi_call(
        plists, x_flat, cond, mask, seed_arr, cfg, weights, epochs, lr,
        eps=eps, interpret=interpret, backward=backward,
    )
    # fetch each STACKED array once, slice on host: per-buffer RPCs through
    # the remote tunnel cost ~30 ms each, so fetching S×24 param slices
    # would multiply host time by S (measured: 32-seed grid 29 s → ~2 s)
    out_host = [np.asarray(p) for p in out_p]
    metrics = np.asarray(metrics)[:, :, :5]
    params_by, hist_by = {}, {}
    for i, k in enumerate(keys):
        params_by[k] = _unflatten_params([p[i] for p in out_host])
        hist_by[k] = {
            m: metrics[i, :, j] for j, m in enumerate(FUSED_METRIC_KEYS)
        }
    return params_by, hist_by


def fused_train_seeds(
    windows: np.ndarray,
    seeds,
    epochs: int = 3000,
    lr: float = 1e-3,
    weights: LossWeights = LossWeights(),
    eps_by_seed=None,
    interpret: bool = False,
    backward: str = "manual",
) -> Tuple[Dict[int, Params], Dict[int, Dict[str, np.ndarray]]]:
    """Train the SAME corpus under many train seeds in one compiled sweep.

    BIT-IDENTICAL to calling :func:`fused_train` per seed BY CONSTRUCTION:
    each seed is its own single-run kernel launch (init ``PRNGKey(seed)``,
    core PRNG stream ``seed``), dispatched back-to-back without
    intermediate syncs — the chip executes them serially while dispatch
    and tunnel RTT amortize — and harvested through ONE device-side stack
    per parameter (a per-launch fetch pays 4–30 ms per buffer through the
    tunnel; the stacked fetch is the documented mitigation, CLAUDE.md).

    This replaced the round-2 grid-axis kernel in round 4.  The original
    probe appeared to show a 6× per-epoch kernel gap, but that reading
    timed 32 host ``init_params`` + 25 stacking dispatches inside the
    grid variants' window (and a later pass found its fetch asymmetric
    and its block_until_ready barrier a no-op — CLAUDE.md hazards); the
    CORRECTED probe (prep hoisted, symmetric tiny-fetch barriers —
    ``scripts/grid_probe.py`` → ``results/grid_probe.json``) shows the
    grid body runs at PARITY with pipelined single-run kernels (5.7 vs
    5.7 µs/epoch·seed across regenerations; the masked grid body is 28%
    faster at 4.1).
    The real, end-to-end win of the pipelined path is HOST-side: one
    vmapped init instead of K host ``init_params``, one shared
    seed-indexed executable, and the packed two-buffer harvest instead
    of 24 per-buffer tunnel fetches — measured by bench as 2.58 s →
    1.1–1.7 s for the 32×3000 sweep — plus bit-identity with
    :func:`fused_train` per seed by construction.  The grid kernel
    remains the right shape for :func:`fused_train_multi`, whose
    per-scenario padded batches share one executable.

    ``eps_by_seed`` (optional ``{seed: (B, latent)}``) swaps the on-core
    PRNG for explicit noise, the interpret-mode escape hatch shared with
    the other kernels.
    """
    _check_backward_arg(backward)
    seeds = [int(s) for s in seeds]
    if len(set(seeds)) != len(seeds):
        # results are keyed by seed value — duplicates would silently
        # collapse to fewer entries than programs launched
        raise ValueError("duplicate seeds in fused_train_seeds")
    cfg = CVAEConfig(seq_len=windows.shape[1], dim=windows.shape[2])
    _check_vmem_budget(cfg)
    _check_epoch_budget(epochs, buffers=1)
    x_flat, start = fused_inputs(windows)
    seeds_arr = jnp.asarray(seeds, jnp.int32)

    # dispatch hygiene (measured: the naive per-seed loop spent 4 s of a
    # 0.7 s sweep on host-side op dispatch through the tunnel): ONE vmapped
    # init program for all seeds' params, ONE kernel executable that
    # slices the stacked params by a traced index (so every launch is a
    # single dispatch of the same executable), ONE harvest program that
    # stacks all outputs for a single-buffer-per-leaf fetch
    stacked_p = _stacked_init(seeds_arr, cfg)
    eps_stacked = (
        None if eps_by_seed is None
        else jnp.stack(
            [jnp.asarray(eps_by_seed[s], jnp.float32) for s in seeds]
        )
    )
    outs = [
        _fused_call_at(
            stacked_p, x_flat, start, seeds_arr, jnp.int32(i), cfg, weights,
            epochs, lr, eps_stacked=eps_stacked, interpret=interpret,
            backward=backward,
        )
        for i in range(len(seeds))
    ]
    packed, metrics = _stack_outputs(outs)
    packed = np.asarray(packed)  # ONE (S, n_param_floats) fetch
    metrics = np.asarray(metrics)[:, :, :5]
    shapes = [p.shape for p in outs[0][0]]
    sizes = np.cumsum([0] + [int(np.prod(sh)) for sh in shapes])
    params_by, hist_by = {}, {}
    for i, s in enumerate(seeds):
        flat = [
            packed[i, sizes[j]:sizes[j + 1]].reshape(shapes[j])
            for j in range(len(shapes))
        ]
        params_by[s] = _unflatten_params(flat)
        hist_by[s] = {m: metrics[i, :, j] for j, m in enumerate(FUSED_METRIC_KEYS)}
    return params_by, hist_by


@functools.partial(jax.jit, static_argnames=("cfg",))
def _stacked_init(seeds_arr, cfg):
    """All seeds' init params in ONE device program: (S, …) per leaf.
    vmapped jax.random is elementwise-identical to per-seed
    ``init_params(PRNGKey(s))`` (asserted by the seeds-vs-single test)."""
    return jax.vmap(
        lambda s: tuple(_flatten_params(init_params(jax.random.PRNGKey(s), cfg)))
    )(seeds_arr)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "weights", "epochs", "lr", "interpret", "backward"),
)
def _fused_call_at(stacked_p, x_flat, cond, seeds_arr, idx, cfg, weights,
                   epochs, lr, eps_stacked=None, interpret=False,
                   backward="manual"):
    """One sweep launch: slice seed ``idx``'s params/eps from the stacked
    buffers INSIDE the jit, then run the single-run kernel — every seed is
    one dispatch of one shared executable (idx is traced)."""
    plist = tuple(a[idx] for a in stacked_p)
    seed = seeds_arr[idx].reshape(1, 1)
    eps = None if eps_stacked is None else eps_stacked[idx]
    return _fused_call(
        plist, x_flat, cond, seed, cfg, weights, epochs, lr, eps=eps,
        interpret=interpret, backward=backward,
    )


@jax.jit
def _stack_outputs(outs):
    """Pack every launch's plist into ONE (S, n_param_floats) buffer and
    stack the metrics, in one device program — the host fetch is then TWO
    buffers total instead of S×25 small ones (per-buffer tunnel RPC
    overhead, 4–30 ms each — CLAUDE.md measurement hazards)."""
    packed = jnp.stack([
        jnp.concatenate([a.reshape(-1) for a in o[0]]) for o in outs
    ])
    metrics = jnp.stack([o[1] for o in outs])
    return packed, metrics


def fused_step_reference(params: Params, windows, eps, lr=1e-3,
                         weights: LossWeights = LossWeights(),
                         cfg: CVAEConfig = None):
    """XLA (non-Pallas) single Adam step with explicit eps — the oracle the
    kernel is validated against in tests."""
    if cfg is None:
        cfg = CVAEConfig(seq_len=windows.shape[1], dim=windows.shape[2])
    batch = jnp.asarray(windows, jnp.float32)
    rel, start = to_relative(batch)  # shared transform — cannot drift
    x_flat = rel.reshape(batch.shape[0], -1)
    plist = _flatten_params(params)

    (_, comps), grads = jax.value_and_grad(
        lambda pl_: _forward_loss(pl_, x_flat, start, eps, cfg, weights),
        has_aux=True,
    )(plist)
    b1, b2, adam_eps = 0.9, 0.999, 1e-8
    new = []
    for p, g in zip(plist, grads):
        m = (1 - b1) * g
        v = (1 - b2) * g * g
        update = (m / (1 - b1)) / (jnp.sqrt(v / (1 - b2)) + adam_eps)
        new.append(p - lr * update)
    return _unflatten_params(new), comps
