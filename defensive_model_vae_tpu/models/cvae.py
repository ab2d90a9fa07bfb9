"""Conditional trajectory VAE — pure-function JAX implementation.

Architecture mirrors the reference model (``Training_VAE.py:118-226``):

- condition encoder: ``Linear(cond_dim→H) → ReLU → Linear(H→H) → ReLU``
- trajectory encoder: ``Flatten → 4 × [Linear(·→H) → ReLU]``
- latent heads: ``fc_mu / fc_logvar : Linear(2H → Z)``
- decoder: ``Linear(Z+H→H) → ReLU → 2 × [Linear(H→H) → ReLU]
  → Linear(H → T·D)`` reshaped to ``(T, D)``

but is TPU-first in structure: parameters are a flat pytree, the whole
forward is a chain of ``(B, ·) @ (·, H)`` matmuls that XLA fuses and maps
onto the MXU, randomness is explicit (jax PRNG keys), and every function is
jit/vmap/pjit-compatible.  The condition dimension is configurable so the
same model family covers the start-point-conditioned reference model
(``cond_dim=2``) and the scenario-class + THW conditioned variant
(``cond_dim=2+4+1``).

Parameter initialization matches torch ``nn.Linear`` defaults
(uniform ±1/sqrt(fan_in) for both weight and bias) so training dynamics are
comparable with the reference runs.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Dict[str, jax.Array]]


@dataclasses.dataclass(frozen=True)
class CVAEConfig:
    seq_len: int = 10
    dim: int = 3
    latent_dim: int = 8
    hidden_dim: int = 128
    cond_dim: int = 2

    # layer widths as (in, out) pairs, in forward order
    def layer_spec(self) -> Dict[str, Tuple[int, int]]:
        H, Z, T, D, C = (
            self.hidden_dim,
            self.latent_dim,
            self.seq_len,
            self.dim,
            self.cond_dim,
        )
        return {
            "cond_0": (C, H),
            "cond_1": (H, H),
            "enc_0": (T * D, H),
            "enc_1": (H, H),
            "enc_2": (H, H),
            "enc_3": (H, H),
            "fc_mu": (2 * H, Z),
            "fc_logvar": (2 * H, Z),
            "dec_0": (Z + H, H),
            "dec_1": (H, H),
            "dec_2": (H, H),
            "dec_3": (H, T * D),
        }


def _init_linear(key: jax.Array, fan_in: int, fan_out: int) -> Dict[str, jax.Array]:
    """torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def init_params(key: jax.Array, cfg: CVAEConfig) -> Params:
    spec = cfg.layer_spec()
    keys = jax.random.split(key, len(spec))
    return {
        name: _init_linear(k, fi, fo)
        for k, (name, (fi, fo)) in zip(keys, spec.items())
    }


def _linear(p: Dict[str, jax.Array], x: jax.Array) -> jax.Array:
    return x @ p["w"] + p["b"]


def _relu(x: jax.Array) -> jax.Array:
    return jnp.maximum(x, 0.0)


def encode_condition(params: Params, condition: jax.Array) -> jax.Array:
    """(B, cond_dim) → (B, H) condition embedding."""
    h = _relu(_linear(params["cond_0"], condition))
    return _relu(_linear(params["cond_1"], h))


def encode(
    params: Params, x: jax.Array, condition: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Encode relative trajectories (B, T, D) + conditions (B, C).

    Returns (mu, logvar, h_condition) — reference ``encode``
    (``Training_VAE.py:180-197``).
    """
    B = x.shape[0]
    h = x.reshape(B, -1)
    for name in ("enc_0", "enc_1", "enc_2", "enc_3"):
        h = _relu(_linear(params[name], h))
    h_cond = encode_condition(params, condition)
    h_combined = jnp.concatenate([h, h_cond], axis=1)
    mu = _linear(params["fc_mu"], h_combined)
    logvar = _linear(params["fc_logvar"], h_combined)
    return mu, logvar, h_cond


def reparameterize(key: jax.Array, mu: jax.Array, logvar: jax.Array) -> jax.Array:
    """z = mu + sigma * eps (reference ``:199-206``)."""
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(key, std.shape, std.dtype)
    return mu + eps * std


def decode(
    params: Params, z: jax.Array, h_condition: jax.Array, cfg: CVAEConfig
) -> jax.Array:
    """(B, Z) + (B, H) → relative trajectories (B, T, D)."""
    h = jnp.concatenate([z, h_condition], axis=1)
    for name in ("dec_0", "dec_1", "dec_2"):
        h = _relu(_linear(params[name], h))
    out = _linear(params["dec_3"], h)
    return out.reshape(-1, cfg.seq_len, cfg.dim)


def forward(
    params: Params,
    key: jax.Array,
    x_rel: jax.Array,
    condition: jax.Array,
    cfg: CVAEConfig,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Full encode → reparameterize → decode pass.

    Returns (recon, mu, logvar, h_condition) like reference ``forward``
    (``Training_VAE.py:217-226``).
    """
    mu, logvar, h_cond = encode(params, x_rel, condition)
    z = reparameterize(key, mu, logvar)
    recon = decode(params, z, h_cond, cfg)
    return recon, mu, logvar, h_cond


def to_relative(batch: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Absolute [t, x, y] windows → (relative windows, start points).

    Mirrors the in-loop transform of the reference trainer
    (``Training_VAE.py:343-348``): dx = x - x_start, dy = y - y_start,
    t unchanged; condition is the absolute start point.
    """
    start_points = batch[:, 0, 1:3]
    rel = batch.at[:, :, 1:3].add(-start_points[:, None, :])
    return rel, start_points


def sample(
    params: Params,
    key: jax.Array,
    start_xy: jax.Array,
    cfg: CVAEConfig,
    extra_cond: jax.Array | None = None,
) -> jax.Array:
    """Generate global [t, x, y] trajectories for given start points.

    Mirrors the reference generation API
    (``Tools.load_model_and_generate_trajectory``, ``Tools.py:18-65``):
    sample z ~ N(0, I), embed the condition, decode the relative
    trajectory, then shift x/y by the start point.  Batched: ``start_xy``
    is (B, 2) and the output is (B, T, D).

    ``extra_cond`` (B, cond_dim-2) is appended for conditioned variants
    (scenario one-hot, THW features).
    """
    start_xy = jnp.atleast_2d(start_xy)
    B = start_xy.shape[0]
    cond = start_xy
    if extra_cond is not None:
        cond = jnp.concatenate([cond, jnp.atleast_2d(extra_cond)], axis=1)
    z = jax.random.normal(key, (B, cfg.latent_dim), jnp.float32)
    h_cond = encode_condition(params, cond)
    rel = decode(params, z, h_cond, cfg)
    return rel.at[:, :, 1:3].add(start_xy[:, None, :])
