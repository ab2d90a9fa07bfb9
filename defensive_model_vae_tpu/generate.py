"""Trajectory generation API.

Mirrors the semantics of reference ``Tools.load_model_and_generate_trajectory``
(``Tools.py:18-65``) — sample z ~ N(0, I), condition on the absolute start
point, decode a relative [t, dx, dy] trajectory and shift to global [t, x, y]
— but batched: one jitted call produces any number of trajectories for any
number of start points (the reference generates one at a time in a Python
loop, ``Distribution.py:143-166``).
"""

from __future__ import annotations

import functools
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

from .models import CVAEConfig, sample
from .train.checkpoint import load_checkpoint, require_cvae_config


@functools.partial(jax.jit, static_argnames=("cfg", "shift_start"))
def _sample_jit(params, key, start_xy, cfg: CVAEConfig, shift_start: bool = True):
    if shift_start:
        return sample(params, key, start_xy, cfg)
    # legacy non-offset models decode absolute [t, x, y] directly
    from .models.cvae import decode, encode_condition

    z = jax.random.normal(key, (start_xy.shape[0], cfg.latent_dim), jnp.float32)
    h_cond = encode_condition(params, start_xy)
    return decode(params, z, h_cond, cfg)


def generate_trajectories(
    params,
    cfg: CVAEConfig,
    start_xy: np.ndarray,
    n_samples: int = 1,
    seed: Union[int, jax.Array] = 0,
    shift_start: bool = True,
    materialize: bool = True,
) -> np.ndarray:
    """Generate ``n_samples`` global [t, x, y] trajectories per start point.

    Args:
        start_xy: (B, 2) or (2,) start coordinates.
        n_samples: samples per start point (z draws).
        materialize: when False, return the un-awaited ``(B·n, T, D)``
            device array instead of host numpy — for device-resident
            consumers (pipelined sampling, feeding the on-device MPC)
            that must not pay a host round-trip per batch.

    Returns:
        (B, n_samples, T, D) array (squeezed to (T, D) for B=1, n=1 to match
        the reference's single-trajectory call signature).
    """
    # np.integer counts as a seed too (seeds loaded from npy / computed
    # with numpy arithmetic), not as a pre-built PRNG key
    key = (jax.random.PRNGKey(int(seed))
           if isinstance(seed, (int, np.integer)) else seed)
    start_xy = np.atleast_2d(np.asarray(start_xy, np.float32))
    B = start_xy.shape[0]
    tiled = jnp.asarray(np.repeat(start_xy, n_samples, axis=0))
    out = _sample_jit(params, key, tiled, cfg, shift_start)
    if not materialize:
        return out
    out = np.asarray(out).reshape(B, n_samples, cfg.seq_len, cfg.dim)
    if B == 1 and n_samples == 1:
        return out[0, 0]
    return out


def load_and_generate(
    checkpoint_dir: str,
    start_x: float,
    start_y: float,
    n_samples: int = 1,
    seed: int = 0,
) -> np.ndarray:
    """Checkpoint-path convenience mirroring the reference call shape.

    Honors the manifest's ``offset_mode`` (False for legacy non-offset
    imports, whose decoder emits absolute coordinates)."""
    params, cfg, manifest = load_checkpoint(checkpoint_dir)
    require_cvae_config(cfg, "load_and_generate")
    return generate_trajectories(
        params, cfg, np.array([start_x, start_y]), n_samples, seed,
        shift_start=manifest.get("offset_mode", True),
    )
