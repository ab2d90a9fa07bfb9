"""Device-mesh parallelism.

The reference is single-process CPU with no parallelism of any kind
(SURVEY §2, parallelism inventory).  At this workload's scale the
parallelism that actually pays is:

- **data parallelism** over trajectories (training) and over CSVs/rollouts
  (batched generation + MPC): batch axis sharded over the mesh ``data``
  axis, gradient all-reduce inserted implicitly by XLA/pjit over ICI;
- optional **tensor parallelism** over the MLP hidden dimension (``model``
  axis) — demonstrated and tested, though at hidden=128 it is about
  completeness, not speed.

Multi-host DCN is intentionally out of scope (the largest corpus is
135×10×3 floats); scaling past one host would only add latency.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_devices: Optional[int] = None,
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Create a (data, model) mesh over the available devices.

    Defaults to all devices on the data axis (pure DP).  ``shape=(dp, tp)``
    selects an explicit layout, e.g. (4, 2) on an 8-chip slice.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = shape[0] * shape[1] if shape is not None else len(devices)
    if n_devices > len(devices):
        raise ValueError(f"need {n_devices} devices, have {len(devices)}")
    devices = devices[:n_devices]
    if shape is None:
        shape = (n_devices, 1)
    if shape[0] * shape[1] != n_devices:
        raise ValueError(f"mesh shape {shape} != {n_devices} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def _batch_spec(ndim: int) -> P:
    return P("data", *([None] * (ndim - 1)))


def shard_batch(batch: jax.Array, mesh: Mesh) -> jax.Array:
    """Shard the leading (batch) axis over the mesh data axis.

    Pads the batch to a multiple of the data-axis size if needed (padding
    rows are duplicates of row 0; callers using masks should pad masks
    themselves — ``train.train`` passes full batches whose loss ignores
    padding via masking)."""
    dp = mesh.shape["data"]
    n = batch.shape[0]
    rem = (-n) % dp
    if rem:
        pad = jnp.repeat(batch[:1], rem, axis=0)
        batch = jnp.concatenate([batch, pad], axis=0)
    return jax.device_put(batch, NamedSharding(mesh, _batch_spec(batch.ndim)))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree on every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def tensor_shard_params(params, mesh: Mesh, hidden_dim: int = 128):
    """Column-parallel tensor sharding: shard any parameter axis equal to
    ``hidden_dim`` over the mesh ``model`` axis (weights and biases).  XLA
    inserts the required all-gathers/reduce-scatters over ICI."""
    tp = mesh.shape["model"]

    def spec_for(leaf):
        if tp == 1:
            return P()
        dims = []
        used = False
        for d in leaf.shape:
            if not used and d == hidden_dim and d % tp == 0:
                dims.append("model")
                used = True
            else:
                dims.append(None)
        return P(*dims)

    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, NamedSharding(mesh, spec_for(leaf))),
        params,
    )


def make_parallel_train_step(step, mesh: Mesh):
    """Wrap a train step for the mesh: jit with explicit output shardings so
    parameters stay replicated and the gradient all-reduce rides ICI."""
    rep = NamedSharding(mesh, P())

    def wrapped(params, opt_state, key, batch, mask=None):
        return step(params, opt_state, key, batch, mask)

    return jax.jit(wrapped, out_shardings=(rep, rep, rep))
