"""Hand-written backward pass for the fused scale kernel.

``ops/fused_scale`` traces ``jax.value_and_grad(_forward_loss)`` inside the
Pallas kernel.  The six-variant on-chip ablation
(``scripts/scale_ablation.py`` → ``results/scale_ablation.json``) showed
that ~62% of the kernel's wall time is Mosaic's lowering of that
autodiff-emitted backward — the dy-chain cast/select VJPs plus the 12
transposed dW ``dot_general``s — while a FLOP-equivalent pure-matmul kernel
sustains 72% of MXU peak on the same streamed grid.  This module is the
hand-written backward that chases that headroom (DESIGN.md "Where the MXU
earns its keep"): same math, restructured ops.

What it changes relative to the autodiff trace (everything is validated
against ``jax.grad`` of the shared ``_forward_loss`` — see
``tests/test_fused_scale.py``):

- **Merged μ/logσ² head.**  ``fc_mu`` and ``fc_logvar`` share the input
  ``hcat`` and their Z=8-wide outputs each lane-pad to 128, so the forward
  dot, the dW dot, and the d_hcat dot are each done ONCE on the
  concatenated ``(2H, 2Z)`` weight instead of twice at 16× lane padding.
- **One fused d_recon construction.**  Autodiff scatters the four loss
  terms' cotangents through slice-VJPs (pads) and adds them pairwise; here
  the recon/start/time gradients are one masked elementwise expression
  (iota column masks) plus the single ``diff_mat`` back-dot.
- **Backward dots cast like the forward.**  In the ``f32_acts`` mixed
  style autodiff runs the backward dots with mixed (bf16, f32) operands —
  the f32 cotangent is consumed as-is.  Here dy is cast to the compute
  dtype per dot, so every backward matmul is a pure-bf16 MXU op (f32
  accumulate as always).  The rounding differs from autodiff in the last
  bf16 bit; the f32 path is fp-equivalent to autodiff up to reassociation
  of the merged-head sums (the (2H, 2Z) d_hcat dot contracts 2Z=16
  columns in one accumulation where autodiff adds two Z-column dots —
  same terms, different summation tree; tests bound the compounded
  difference at 1e-5 over a full training run, tests/test_fused.py).
- **No d_x / d_cond / d_eps.**  Gradients are taken w.r.t. parameters
  only, which drops the ``enc_0``/``cond_0``/ε input back-dots that
  ``jax.grad`` over the param list also avoids — listed here because the
  hand-written chain must stop at the same place to stay FLOP-equal.

Behavioral contract: ``manual_value_and_grad(...)`` returns exactly what
``jax.value_and_grad(_forward_loss, has_aux=True)`` returns, reshaped as
``(comps, grads)`` with ``comps`` the 5-component loss row and ``grads``
in the flat ``_LAYERS`` parameter order.  Reference lineage: the loss is
the reference's 4-term objective (``Training_VAE.py:229-268``), the model
the reference CVAE (``Training_VAE.py:118-226``); see
``fused_trainer._forward_loss`` for the per-term citations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import CVAEConfig, LossWeights
from .fused_trainer import _LAYERS

# chain segments of the single source of truth for the flat parameter
# order (gradients are returned positionally, so deriving these from
# _LAYERS — rather than re-declaring them — makes drift impossible)
_ENC = _LAYERS[2:6]
_DEC = _LAYERS[8:12]
assert ("cond_0", "cond_1") + _ENC + ("fc_mu", "fc_logvar") + _DEC == _LAYERS


def manual_value_and_grad(plist, x_flat, cond, eps, cfg: CVAEConfig,
                          w: LossWeights, mask=None, n_valid=None,
                          compute_dtype=None, mixed_style="f32_acts",
                          bias_via_dot=False, dw_mode="contract0",
                          chain_cd=False, grads_mode="full"):
    """Forward loss + hand-written parameter gradients.

    Mirrors ``_forward_loss(plist, ...)`` (same args, same masked/global-
    denominator semantics) and returns ``(comps, grads)`` where ``comps``
    is the stacked ``[total, recon, kld, start, time]`` row and ``grads``
    matches ``plist``'s flat layout ``[W, b(1,-1), ...]`` in ``_LAYERS``
    order.  Supports ``compute_dtype=None`` (pure f32, fp-equivalent to
    autodiff up to merged-head sum reassociation — module docstring) and
    the ``f32_acts`` mixed style (bf16 matmul operands,
    f32 everything else).  ``bf16_chain`` is not supported — its whole-
    chain casts are exactly the autodiff structure this module replaces.

    ``chain_cd=True`` (requires a compute dtype) keeps the dY CHAIN in the
    compute dtype end-to-end: chain back-dots emit compute-dtype outputs,
    relu masking is a compute-dtype select on the saved f32 activations,
    and the dW/db dots consume the chain dy without a per-dot f32→bf16
    cast (the f32 cotangent is quantized ONCE at the d_recon entry and
    once at the f32 head math, instead of at all 12 dot operands).  The
    forward and the loss components are bit-identical to the default;
    gradients round once more per chain hop (chain depth ≤ 4), bounded by
    the tests at bf16 tolerance.  Parameter gradients stay f32 (the dW
    dots keep a f32 ``preferred_element_type``).

    ``grads_mode`` is ABLATION-ONLY (scripts/scale_ablation.py):
    ``"nodw"`` runs the full dY chain but replaces every dW/db dot with
    zeros (a checksum of the two terminal chain cotangents is planted in
    the ``cond_0`` bias gradient so the chain cannot be dead-code
    eliminated) — the hbm−nodw delta isolates the dW-side cost;
    ``"none"`` returns zero gradients outright (forward-only timing).
    """
    if compute_dtype is not None and mixed_style != "f32_acts":
        raise ValueError(
            "manual backward supports compute_dtype=None or the 'f32_acts' "
            f"mixed style (got mixed_style={mixed_style!r})"
        )
    if chain_cd and compute_dtype is None:
        raise ValueError("chain_cd requires a compute dtype (it keeps the "
                         "dY chain in that dtype)")
    if grads_mode not in ("full", "nodw", "none"):
        raise ValueError(f"grads_mode must be 'full', 'nodw' or 'none' "
                         f"(got {grads_mode!r})")
    cd = compute_dtype
    dc = (lambda a: a) if cd is None else (lambda a: a.astype(cd))
    chain_dt = cd if chain_cd else jnp.float32

    def fdot(a, b):  # forward matmul: operands in compute dtype, f32 acc
        return jnp.dot(dc(a), dc(b), preferred_element_type=jnp.float32)

    def ddot_act(dy, W):  # dy @ W^T without materializing the transpose
        return jax.lax.dot_general(
            dc(dy), dc(W), (((1,), (1,)), ((), ())),
            preferred_element_type=chain_dt,
        )

    if dw_mode == "transpose":
        # ablation lever: materialize aᵀ (a Mosaic relayout) and run a
        # standard matmul, instead of the batch-dim-contracting dot_general
        # — A/B for which formulation Mosaic lowers faster
        def ddot_w(a, dy):
            return jnp.dot(
                jnp.transpose(dc(a)), dc(dy),
                preferred_element_type=jnp.float32,
            )
    else:
        def ddot_w(a, dy):  # a^T @ dy: contract the batch dim directly
            return jax.lax.dot_general(
                dc(a), dc(dy), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    if bias_via_dot:
        # db as a (1, B)·(B, fo) MXU dot instead of a VPU sublane
        # reduction — an ablation lever for the Pallas kernel, where the
        # VPU (not the MXU) is the measured ceiling.  fp: in f32 the only
        # difference is the dot's accumulation order vs jnp.sum's tree
        # (same terms); under a bf16 compute dtype dc() additionally
        # QUANTIZES dy to bf16 before the dot, where the default sums the
        # f32 dy — a precision change, not just reassociation (covered at
        # bf16 tolerance by test_manual_bias_via_dot_matches_sum).
        def dbias(dy):
            ones_row = jnp.ones((1, dy.shape[0]), jnp.float32)
            return jnp.dot(
                dc(ones_row), dc(dy), preferred_element_type=jnp.float32
            )
    else:
        def dbias(dy):  # (1, fo) — matches the flat plist bias layout
            # f32 accumulation regardless of the chain dtype (identity for
            # the default f32 chain)
            return jnp.sum(dy, axis=0, keepdims=True, dtype=jnp.float32)

    if chain_cd:
        # compute-dtype select on the f32 saved activation: no f32 mask
        # materialization, no per-hop convert
        def relu_bwd(d_prev, act):
            return jnp.where(act > 0, d_prev, jnp.zeros((), chain_dt))
    else:
        def relu_bwd(d_prev, act):
            return d_prev * (act > 0).astype(jnp.float32)

    F = cfg.seq_len * cfg.dim
    T, D, Z, H = cfg.seq_len, cfg.dim, cfg.latent_dim, cfg.hidden_dim
    names = _LAYERS
    p = {n: (plist[2 * i], plist[2 * i + 1]) for i, n in enumerate(names)}

    # ---- forward (saves post-relu activations for the backward) --------
    x = x_flat.astype(jnp.float32)
    cond = cond.astype(jnp.float32)
    eps = eps.astype(jnp.float32)

    relu = lambda h: jnp.maximum(h, jnp.zeros((), h.dtype))
    c0 = relu(fdot(cond, p["cond_0"][0]) + p["cond_0"][1])
    hc = relu(fdot(c0, p["cond_1"][0]) + p["cond_1"][1])
    enc_in = []  # input activation of each encoder layer
    h = x
    for name in _ENC:
        enc_in.append(h)
        h = relu(fdot(h, p[name][0]) + p[name][1])
    hcat = jnp.concatenate([h, hc], axis=1)
    # merged head: one (2H, 2Z) dot instead of two lane-padded (2H, Z) dots
    w_ml = jnp.concatenate([p["fc_mu"][0], p["fc_logvar"][0]], axis=1)
    b_ml = jnp.concatenate([p["fc_mu"][1], p["fc_logvar"][1]], axis=1)
    ml = fdot(hcat, w_ml) + b_ml
    mu, logvar = ml[:, :Z], ml[:, Z:]
    std = jnp.exp(0.5 * logvar)
    z = mu + eps * std
    gin = jnp.concatenate([z, hc], axis=1)
    dec_in = [gin]
    g = gin
    for name in _DEC[:3]:
        g = relu(fdot(g, p[name][0]) + p[name][1])
        dec_in.append(g)
    recon = fdot(g, p["dec_3"][0]) + p["dec_3"][1]

    # ---- loss (identical reductions to _forward_loss) ------------------
    if mask is None:
        m_col = jnp.ones((x.shape[0], 1), jnp.float32)
        denom = jnp.asarray(float(x.shape[0]), jnp.float32)
    else:
        m_col = mask if mask.ndim == 2 else mask[:, None]
        denom = (
            jnp.maximum(jnp.sum(m_col), 1.0)
            if n_valid is None
            else jnp.asarray(n_valid, jnp.float32)
        )

    def mean_rows(arr):
        return jnp.sum(arr * m_col) / (denom * arr.shape[1])

    recon_loss = mean_rows((recon - x) ** 2)
    kld = -0.5 * mean_rows(1.0 + logvar - mu**2 - jnp.exp(logvar))
    start_loss = mean_rows((recon[:, 1:3] - x[:, 1:3]) ** 2)
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
        w.recon * recon_loss + w.kld * kld
        + w.start * start_loss + w.time * time_loss
    )
    comps = jnp.stack([total, recon_loss, kld, start_loss, time_loss])

    # ---- backward -------------------------------------------------------
    if grads_mode == "none":  # forward-only timing lever
        return comps, [jnp.zeros_like(q) for q in plist]
    skip_dw = grads_mode == "nodw"
    S = 1.0 / denom
    # d_recon: recon + start + time terms fused into one masked expression
    col = jax.lax.broadcasted_iota(jnp.int32, (1, F), 1)
    start_cols = jnp.logical_or(col == 1, col == 2).astype(jnp.float32)
    t0_col = (col == 0).astype(jnp.float32)
    # d max(-t, 0)/dt = -1 where t < 0 (ties are measure-zero, as for relu)
    d_tdiff = (-w.time * S / (T - 1)) * m_col * (t_diffs < 0).astype(
        jnp.float32
    )
    d_recon = m_col * (
        (recon - x) * (w.recon * 2.0 * S / F + w.start * S * start_cols)
        + recon * (w.time * 2.0 * S * t0_col)
    ) + jax.lax.dot_general(
        d_tdiff, diff_mat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    grads = {}

    def back_linear(name, a_in, dy):
        """Accumulate (dW, db) for layer ``name``; return d(input)."""
        if not skip_dw:
            grads[name] = (ddot_w(a_in, dy), dbias(dy))
        return ddot_act(dy, p[name][0])

    # decoder chain (relu mask from the saved post-activations: act > 0
    # equals pre > 0 except on exact zeros, measure-zero like autodiff's
    # 0.5-at-tie subgradient).  Under chain_cd the cotangent is quantized
    # ONCE here; every chain hop below stays in the compute dtype.
    dy = d_recon if not chain_cd else dc(d_recon)
    d_gin = None
    for i in (3, 2, 1, 0):
        d_prev = back_linear(_DEC[i], dec_in[i], dy)
        if i == 0:
            d_gin = d_prev
        else:
            dy = relu_bwd(d_prev, dec_in[i])
    dz = d_gin[:, :Z]
    dhc_dec = d_gin[:, Z:]

    # heads: KLD cotangents + the reparameterization path in f32 (mixed
    # adds promote the chain-dtype dz), merged like the forward.
    # dμ = dz + wk·S/Z·m·μ;  dlogσ² = dz·ε·σ/2 − wk·S/(2Z)·m·(1−e^lv)
    kS = w.kld * S / Z
    d_mu = dz + kS * m_col * mu
    d_logvar = dz * eps * (0.5 * std) - (0.5 * kS) * m_col * (
        1.0 - jnp.exp(logvar)
    )
    d_ml = jnp.concatenate([d_mu, d_logvar], axis=1)
    if not skip_dw:
        dw_ml = ddot_w(hcat, d_ml)
        db_ml = dbias(d_ml)
        grads["fc_mu"] = (dw_ml[:, :Z], db_ml[:, :Z])
        grads["fc_logvar"] = (dw_ml[:, Z:], db_ml[:, Z:])
    d_hcat = ddot_act(d_ml, w_ml)
    d_h = d_hcat[:, :H]
    dhc = dhc_dec + d_hcat[:, H:]

    # encoder chain (enc_in[i] is layer i's input; its output is the next
    # layer's input, or h for the top).  No d_x at the bottom.
    enc_out = enc_in[1:] + [h]
    dy = relu_bwd(d_h, enc_out[3])
    for i in (3, 2, 1):
        d_prev = back_linear(_ENC[i], enc_in[i], dy)
        dy = relu_bwd(d_prev, enc_out[i - 1])
    dy_enc = dy
    if not skip_dw:
        grads["enc_0"] = (ddot_w(enc_in[0], dy), dbias(dy))

    # condition chain (shared by encoder concat and decoder concat; no
    # d_cond at the bottom)
    dy = relu_bwd(dhc, hc)
    d_c0 = back_linear("cond_1", c0, dy)
    dy = relu_bwd(d_c0, c0)
    if not skip_dw:
        grads["cond_0"] = (ddot_w(cond, dy), dbias(dy))
    else:
        # nodw ablation: both terminal cotangents depend on EVERY chain
        # dot, so planting their checksum in one bias gradient keeps the
        # whole dY chain live while all dW/db dots are dead code
        chk = jnp.sum(dy_enc, dtype=jnp.float32) + jnp.sum(
            dy, dtype=jnp.float32
        )
        flat_grads = []
        for i, name in enumerate(names):
            gw = jnp.zeros_like(plist[2 * i])
            gb = jnp.zeros_like(plist[2 * i + 1])
            if name == "cond_0":
                gb = gb + chk
            flat_grads.append(gw)
            flat_grads.append(gb)
        return comps, flat_grads

    flat_grads = []
    for name in names:
        gw, gb = grads[name]
        flat_grads.append(gw)
        flat_grads.append(gb)
    return comps, flat_grads
