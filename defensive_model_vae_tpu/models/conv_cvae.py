"""Temporal-convolution conditional VAE for long-horizon windows.

A new capability named in the driver's benchmark configs ("Temporal-conv
(Conv1D) VAE over long-horizon windows", BASELINE.json): for windows much
longer than the reference's 10 points (e.g. the (100, 50, 2) random-walk set,
reference ``Traj_Data_Process.py:186-199``), an MLP over the flattened window
wastes parameters; a 1-D conv stack shares them across time and maps onto
the MXU as batched matmuls via ``lax.conv_general_dilated``.

Layout: channels-last (B, T, D) with NWC convs — the tensor shapes XLA tiles
best on TPU.  Downsampling by stride-2 convs, upsampling by transposed convs.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .cvae import _init_linear, _linear, _relu, encode_condition  # reuse

Params = Dict[str, Dict[str, jax.Array]]


@dataclasses.dataclass(frozen=True)
class ConvCVAEConfig:
    seq_len: int = 50
    dim: int = 2
    latent_dim: int = 8
    hidden_dim: int = 128
    cond_dim: int = 2
    channels: Tuple[int, ...] = (32, 64, 128)  # stride-2 each
    kernel: int = 5

    @property
    def bottleneck_len(self) -> int:
        L = self.seq_len
        for _ in self.channels:
            L = (L + 1) // 2
        return L


def _init_conv(key, k, cin, cout):
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(cin * k)
    w = jax.random.uniform(kw, (k, cin, cout), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def init_conv_params(key: jax.Array, cfg: ConvCVAEConfig) -> Params:
    H, Z = cfg.hidden_dim, cfg.latent_dim
    n_enc = len(cfg.channels)
    keys = iter(jax.random.split(key, 2 * n_enc + 8))
    params: Params = {}
    cin = cfg.dim
    for i, c in enumerate(cfg.channels):
        params[f"conv_{i}"] = _init_conv(next(keys), cfg.kernel, cin, c)
        cin = c
    flat = cfg.bottleneck_len * cfg.channels[-1]
    params["enc_proj"] = _init_linear(next(keys), flat, H)
    params["cond_0"] = _init_linear(next(keys), cfg.cond_dim, H)
    params["cond_1"] = _init_linear(next(keys), H, H)
    params["fc_mu"] = _init_linear(next(keys), 2 * H, Z)
    params["fc_logvar"] = _init_linear(next(keys), 2 * H, Z)
    params["dec_proj"] = _init_linear(next(keys), Z + H, flat)
    cin = cfg.channels[-1]
    for i, c in enumerate(tuple(reversed(cfg.channels[:-1])) + (cfg.dim,)):
        params[f"deconv_{i}"] = _init_conv(next(keys), cfg.kernel, cin, c)
        cin = c
    return params


def _conv1d(p, x, stride=1):
    # x: (B, T, C) channels-last; w: (K, Cin, Cout)
    y = jax.lax.conv_general_dilated(
        x,
        p["w"],
        window_strides=(stride,),
        padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return y + p["b"]


def _deconv1d(p, x, stride=2, out_len=None):
    y = jax.lax.conv_transpose(
        x,
        p["w"],
        strides=(stride,),
        padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if out_len is not None:
        y = y[:, :out_len]
    return y + p["b"]


def conv_encode(params, x, condition, cfg: ConvCVAEConfig):
    h = x
    for i in range(len(cfg.channels)):
        h = _relu(_conv1d(params[f"conv_{i}"], h, stride=2))
    h = h.reshape(h.shape[0], -1)
    h = _relu(_linear(params["enc_proj"], h))
    h_cond = encode_condition(params, condition)
    hc = jnp.concatenate([h, h_cond], axis=1)
    return _linear(params["fc_mu"], hc), _linear(params["fc_logvar"], hc), h_cond


def conv_decode(params, z, h_cond, cfg: ConvCVAEConfig):
    h = _relu(_linear(params["dec_proj"], jnp.concatenate([z, h_cond], axis=1)))
    h = h.reshape(-1, cfg.bottleneck_len, cfg.channels[-1])
    # intermediate target lengths on the way back up
    lens = []
    L = cfg.seq_len
    for _ in cfg.channels:
        lens.append(L)
        L = (L + 1) // 2
    lens = list(reversed(lens))
    n = len(cfg.channels)
    for i in range(n):
        h = _deconv1d(params[f"deconv_{i}"], h, stride=2, out_len=lens[i])
        if i < n - 1:
            h = _relu(h)
    return h


def conv_forward(params, key, x_rel, condition, cfg: ConvCVAEConfig):
    mu, logvar, h_cond = conv_encode(params, x_rel, condition, cfg)
    std = jnp.exp(0.5 * logvar)
    z = mu + std * jax.random.normal(key, std.shape, std.dtype)
    recon = conv_decode(params, z, h_cond, cfg)
    return recon, mu, logvar, h_cond


def conv_sample(params, key, start_xy, cfg: ConvCVAEConfig):
    start_xy = jnp.atleast_2d(start_xy)
    z = jax.random.normal(key, (start_xy.shape[0], cfg.latent_dim), jnp.float32)
    # zero-pad the condition to cond_dim, mirroring train_conv — a
    # cond_dim>2 model's cond_0 weight is (cond_dim, H) and the raw
    # (B, 2) start would fail the matmul
    cond = start_xy
    if cond.shape[1] < cfg.cond_dim:
        cond = jnp.pad(cond, ((0, 0), (0, cfg.cond_dim - cond.shape[1])))
    h_cond = encode_condition(params, cond)
    rel = conv_decode(params, z, h_cond, cfg)
    if cfg.dim >= 3:
        return rel.at[:, :, 1:3].add(start_xy[:, None, :])
    return rel + start_xy[:, None, :]
