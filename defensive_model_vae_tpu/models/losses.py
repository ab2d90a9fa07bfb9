"""Conditional-VAE loss — 4-term objective with optional sample masking.

Reference semantics (``Training_VAE.conditional_vae_loss``, ``:229-268``):

- recon:  MSE(recon, x) mean over all elements
- kld:    -0.5 * mean(1 + logvar - mu² - exp(logvar)) over all elements
- start:  MSE of relative start points (should be ≈ (0,0))
- time:   MSE(t₀, 0) + mean(relu(-Δt))  (start-at-zero + monotonicity)

total = w_recon·recon + w_kld·kld + w_start·start + w_time·time

The mask argument enables padded multi-scenario batches (train all four
scenarios in one device-resident batch): masked means reduce to the
reference values when the mask is all ones.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LossWeights:
    # defaults = reference training config (``Training_VAE.py:299-306``)
    recon: float = 0.1
    kld: float = 0.1
    start: float = 1.0
    time: float = 1.0


def _masked_mean(x, mask_b):
    """Mean over elements, weighting each sample row by mask_b (B,)."""
    if mask_b is None:
        return jnp.mean(x)
    # broadcast mask over trailing dims
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    m = mask_b.reshape(shape)
    per_sample_elems = x[0].size if x.ndim > 1 else 1
    total = jnp.sum(x * m)
    count = jnp.sum(mask_b) * per_sample_elems
    return total / jnp.maximum(count, 1.0)


def cvae_loss(
    recon_x: jnp.ndarray,
    x: jnp.ndarray,
    mu: jnp.ndarray,
    logvar: jnp.ndarray,
    weights: LossWeights = LossWeights(),
    mask: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Returns (total, components) where components holds the *unweighted*
    recon/kld/start/time terms (the reference records unweighted values and
    scales them only for plotting, ``Training_VAE.py:385-388``)."""
    recon_loss = _masked_mean((recon_x - x) ** 2, mask)

    kld = -0.5 * _masked_mean(1.0 + logvar - mu**2 - jnp.exp(logvar), mask)

    start_loss = _masked_mean((recon_x[:, 0, 1:3] - x[:, 0, 1:3]) ** 2, mask)

    time_start = _masked_mean(recon_x[:, 0, 0] ** 2, mask)
    time_diff = recon_x[:, 1:, 0] - recon_x[:, :-1, 0]
    time_increasing = _masked_mean(jnp.maximum(-time_diff, 0.0), mask)
    time_loss = time_start + time_increasing

    total = (
        weights.recon * recon_loss
        + weights.kld * kld
        + weights.start * start_loss
        + weights.time * time_loss
    )
    return total, {
        "total": total,
        "recon": recon_loss,
        "kld": kld,
        "start": start_loss,
        "time": time_loss,
    }
