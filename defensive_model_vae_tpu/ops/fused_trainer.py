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

from ..models import CVAEConfig, LossWeights, init_params
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


def _forward_loss(plist, x_flat, cond, eps, cfg: CVAEConfig, w: LossWeights):
    """Pure loss over the flat param list; mirrors models.cvae.forward +
    losses.cvae_loss on flattened (B, T·D) windows with explicit noise."""
    p = {n: (plist[2 * i], plist[2 * i + 1]) for i, n in enumerate(_LAYERS)}

    def lin(name, h):
        W, b = p[name]
        return jnp.dot(h, W, preferred_element_type=jnp.float32) + b

    relu = lambda h: jnp.maximum(h, 0.0)

    hc = relu(lin("cond_1", relu(lin("cond_0", cond))))
    h = x_flat
    for name in ("enc_0", "enc_1", "enc_2", "enc_3"):
        h = relu(lin(name, h))
    hcat = jnp.concatenate([h, hc], axis=1)
    mu = lin("fc_mu", hcat)
    logvar = lin("fc_logvar", hcat)
    z = mu + eps * jnp.exp(0.5 * logvar)
    g = jnp.concatenate([z, hc], axis=1)
    for name in ("dec_0", "dec_1", "dec_2"):
        g = relu(lin(name, g))
    recon = lin("dec_3", g)  # (B, T·D)

    T, D = cfg.seq_len, cfg.dim
    recon_loss = jnp.mean((recon - x_flat) ** 2)
    kld = -0.5 * jnp.mean(1.0 + logvar - mu**2 - jnp.exp(logvar))
    # flattened [t, dx, dy] layout: row-0 start offsets at columns 1, 2
    start_loss = jnp.mean((recon[:, 1:3] - x_flat[:, 1:3]) ** 2)
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
    time_loss = jnp.mean(recon[:, 0:1] ** 2) + jnp.mean(
        jnp.maximum(-t_diffs, 0.0)
    )
    total = (
        w.recon * recon_loss + w.kld * kld + w.start * start_loss + w.time * time_loss
    )
    return total, jnp.stack([total, recon_loss, kld, start_loss, time_loss])


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


def _make_kernel(cfg: CVAEConfig, weights: LossWeights, epochs: int, lr: float,
                 n_params: int, eps_input: bool):
    from jax.experimental.pallas import tpu as pltpu

    b1, b2, adam_eps = 0.9, 0.999, 1e-8

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

        def body(t, carry):
            params, m, v = carry
            if eps_input:
                eps = eps_ref[:]
            else:
                eps = _normal_noise((B, cfg.latent_dim))
            (_, comps), grads = jax.value_and_grad(
                lambda pl_: _forward_loss(pl_, x, cond, eps, cfg, weights),
                has_aux=True,
            )(params)
            tf = (t + 1).astype(jnp.float32)
            # b**t as exp(t·ln b): Mosaic has no powf legalization
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
            metrics_ref[t, :] = jnp.concatenate([comps, jnp.zeros(3)])
            return new_p, new_m, new_v

        params, m, v = jax.lax.fori_loop(0, epochs, body, (params0, zeros, zeros))
        for r, p in zip(out_refs, params):
            r[:] = p

    return kernel


@functools.partial(
    jax.jit, static_argnames=("cfg", "weights", "epochs", "lr", "interpret")
)
def _fused_call(plist, x_flat, cond, seed, cfg, weights, epochs, lr,
                eps=None, interpret=False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = len(plist)
    eps_input = eps is not None
    kernel = _make_kernel(cfg, weights, epochs, lr, n, eps_input)

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
) -> Tuple[Params, Dict[str, np.ndarray]]:
    """Train one scenario CVAE entirely inside one Pallas kernel.

    Drop-in equivalent of ``train.train(windows, ...)`` (same init, loss,
    optimizer; PRNG stream differs — see module docstring).
    """
    cfg = CVAEConfig(seq_len=windows.shape[1], dim=windows.shape[2])
    batch = jnp.asarray(windows, jnp.float32)
    start = batch[:, 0, 1:3]
    rel = batch.at[:, :, 1:3].add(-start[:, None, :])
    x_flat = rel.reshape(batch.shape[0], -1)

    params = init_params(jax.random.PRNGKey(seed), cfg)
    plist = _flatten_params(params)
    seed_arr = jnp.array([[seed]], jnp.int32)

    out_plist, metrics = _fused_call(
        tuple(plist), x_flat, start, seed_arr, cfg, weights, epochs, lr,
        interpret=interpret,
    )
    metrics = np.asarray(metrics)[:, :5]
    history = {k: metrics[:, i] for i, k in enumerate(FUSED_METRIC_KEYS)}
    return _unflatten_params(list(out_plist)), history


def fused_step_reference(params: Params, windows, eps, lr=1e-3,
                         weights: LossWeights = LossWeights(),
                         cfg: CVAEConfig = None):
    """XLA (non-Pallas) single Adam step with explicit eps — the oracle the
    kernel is validated against in tests."""
    if cfg is None:
        cfg = CVAEConfig(seq_len=windows.shape[1], dim=windows.shape[2])
    batch = jnp.asarray(windows, jnp.float32)
    start = batch[:, 0, 1:3]
    rel = batch.at[:, :, 1:3].add(-start[:, None, :])
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
