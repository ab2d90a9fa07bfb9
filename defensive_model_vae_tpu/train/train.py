"""Jitted full-batch CVAE trainer.

The reference trains each scenario full-batch for 3000 epochs in a Python
loop (``Training_VAE.py:338-380``).  Every corpus fits in one device batch
(≤135 × 10 × 3 floats), so the TPU-native formulation is a single
``lax.scan`` over epochs compiled once: the whole 3000-epoch run is one
device program with zero host round-trips.  The per-epoch work is the
absolute→relative transform, the CVAE forward, the 4-term loss, and one
Adam update — all fused by XLA.

``train_multi_scenario`` trains all four scenario models simultaneously by
stacking them into one leading axis and ``vmap``-ing the step: four models,
one device program (a capability the reference runs as four separate jobs).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import (
    CVAEConfig,
    LossWeights,
    cvae_loss,
    forward,
    init_params,
    to_relative,
)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    # defaults = reference training config (``Training_VAE.py:272-306``)
    epochs: int = 3000
    lr: float = 1e-3
    weights: LossWeights = LossWeights()
    seed: int = 0
    # mixed precision: run the CVAE forward/backward in this dtype (e.g.
    # "bfloat16") while master params, loss reductions, and Adam stay
    # float32.  None (default) = pure float32, bit-identical to the
    # reference-parity path.  The MLP at production batch sizes is
    # HBM-bandwidth-bound (see bench.py's scale roofline), so halving
    # activation bytes is the throughput lever, not extra MXU passes.
    compute_dtype: Optional[str] = None


def make_train_step(model_cfg: CVAEConfig, train_cfg: TrainConfig, optimizer):
    """Build one jittable epoch step:
    (params, opt_state, key, batch, mask[, extra]) →
    (params, opt_state, metrics).  ``extra`` is an optional (N, k) block of
    extra condition features appended to the start point (the conditioned
    variant); ``mask`` excludes padded rows from every loss mean."""

    cdt = (None if train_cfg.compute_dtype is None
           else jnp.dtype(train_cfg.compute_dtype))

    def loss_fn(params, key, batch, mask, extra):
        batch_rel, start_points = to_relative(batch)
        cond = (
            start_points
            if extra is None
            else jnp.concatenate([start_points, extra], axis=1)
        )
        fwd_in = (params, batch_rel, cond)
        if cdt is not None:
            # cast params + activations down for the forward/backward; the
            # cast's VJP casts gradients back up, so grads land in float32
            # against the float32 master params
            fwd_in = jax.tree_util.tree_map(
                lambda a: a.astype(cdt), fwd_in
            )
        p, x, c = fwd_in
        recon, mu, logvar, _ = forward(p, key, x, c, model_cfg)
        if cdt is not None:
            # loss terms (means, exp, squared errors) reduce in float32
            recon, mu, logvar = (
                a.astype(jnp.float32) for a in (recon, mu, logvar)
            )
        total, comps = cvae_loss(recon, batch_rel, mu, logvar, train_cfg.weights, mask)
        return total, comps

    def step(params, opt_state, key, batch, mask=None, extra=None):
        (_, comps), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, key, batch, mask, extra
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, comps

    return step


_METRIC_KEYS = ("total", "recon", "kld", "start", "time")


def _scan_trainer(step, epochs, start_epoch: int = 0):
    """Compile the whole training run as one scan over epochs.

    ``start_epoch`` offsets the per-epoch PRNG fold so a resumed chunk
    continues the noise stream instead of replaying the first chunk's
    (``start_epoch=0`` produces the identical program as before)."""

    def run(params, opt_state, key, batch, mask, extra):
        def body(carry, epoch):
            params, opt_state = carry
            k = jax.random.fold_in(key, epoch)
            params, opt_state, comps = step(params, opt_state, k, batch, mask, extra)
            return (params, opt_state), jnp.stack(
                [comps[k_] for k_ in _METRIC_KEYS]
            )

        (params, opt_state), metrics = jax.lax.scan(
            body, (params, opt_state), jnp.arange(start_epoch, start_epoch + epochs)
        )
        return params, opt_state, metrics

    return run


def train(
    windows: np.ndarray,
    model_cfg: Optional[CVAEConfig] = None,
    train_cfg: TrainConfig = TrainConfig(),
    extra_cond: Optional[np.ndarray] = None,
    mesh=None,
    init_state: Optional[Tuple[Dict, object]] = None,
    return_state: bool = False,
    start_epoch: int = 0,
) -> Tuple[Dict, Dict[str, np.ndarray]]:
    """Train one scenario model on its full window corpus.

    Args:
        windows: (N, T, D) absolute [t, x, y] windows.
        extra_cond: optional (N, cond_dim-2) extra condition features
            (scenario one-hot, THW) appended to the start point.
        mesh: optional ``jax.sharding.Mesh`` — the batch is sharded over its
            'data' axis and params are replicated (pjit data parallelism).
        init_state: optional (params, opt_state) to resume from (the
            reference cannot resume — weights-only checkpoints, SURVEY §5).
        return_state: also return the final optimizer state for
            checkpointing a resumable run.
        start_epoch: number of epochs already trained when resuming — the
            per-epoch reparameterization noise folds the GLOBAL epoch
            index, so chunked training reproduces one long run bit-exactly
            (without it a resumed chunk would replay the first chunk's
            noise stream).

    Returns:
        (params, history) — plus opt_state when ``return_state``.
    """
    if model_cfg is None:
        cond_dim = 2 + (0 if extra_cond is None else extra_cond.shape[1])
        model_cfg = CVAEConfig(
            seq_len=windows.shape[1], dim=windows.shape[2], cond_dim=cond_dim
        )
    batch = jnp.asarray(windows, jnp.float32)
    extra = None if extra_cond is None else jnp.asarray(extra_cond, jnp.float32)

    key = jax.random.PRNGKey(train_cfg.seed)
    optimizer = optax.adam(train_cfg.lr)
    if init_state is not None:
        params, opt_state = init_state
        params = jax.tree_util.tree_map(jnp.asarray, params)
    else:
        params = init_params(key, model_cfg)
        opt_state = optimizer.init(params)

    step = make_train_step(model_cfg, train_cfg, optimizer)
    run = _scan_trainer(step, train_cfg.epochs, start_epoch)

    mask = None
    if mesh is not None:
        from ..parallel import shard_batch, replicate

        n_real = batch.shape[0]
        batch = shard_batch(batch, mesh)
        if batch.shape[0] != n_real:
            # shard_batch pads with duplicates of row 0 — mask them out so
            # the loss means (and hence the gradients) match the unpadded
            # full-batch objective exactly
            mask = shard_batch(
                jnp.concatenate(
                    [jnp.ones((n_real, 1)), jnp.zeros((batch.shape[0] - n_real, 1))]
                ),
                mesh,
            )
        if extra is not None:
            extra = shard_batch(extra, mesh)
        params = replicate(params, mesh)
        opt_state = replicate(opt_state, mesh)

    run = jax.jit(run, static_argnames=())
    params, opt_state, metrics = run(params, opt_state, key, batch, mask, extra)
    metrics = np.asarray(metrics)
    history = {k: metrics[:, i] for i, k in enumerate(_METRIC_KEYS)}
    if return_state:
        return params, history, opt_state
    return params, history


def train_conditioned(
    windows: np.ndarray,
    extra_cond: np.ndarray,
    train_cfg: TrainConfig = TrainConfig(),
    mesh=None,
) -> Tuple[Dict, Dict[str, np.ndarray], CVAEConfig]:
    """Train the scenario-class/THW-conditioned variant.

    The condition vector is [start_x, start_y, extra...] — the generalized
    form of the reference's start-point conditioning.  Thin wrapper over
    :func:`train` (one trainer implementation — masking, mesh sharding,
    and metric plumbing live in one place)."""
    model_cfg = CVAEConfig(
        seq_len=windows.shape[1],
        dim=windows.shape[2],
        cond_dim=2 + np.asarray(extra_cond).shape[1],
    )
    params, history = train(
        windows, model_cfg, train_cfg, extra_cond=extra_cond, mesh=mesh
    )
    return params, history, model_cfg


def train_multi_scenario(
    windows_by_scenario: Dict[str, np.ndarray],
    train_cfg: TrainConfig = TrainConfig(),
) -> Tuple[Dict[str, Dict], Dict[str, Dict[str, np.ndarray]]]:
    """Train all scenario models in ONE device program via vmap.

    Corpora are padded to the largest N with a sample mask; the step is
    vmapped over a leading model axis so the four models' matmuls batch
    together on the MXU.
    """
    keys = list(windows_by_scenario.keys())
    seq_len = next(iter(windows_by_scenario.values())).shape[1]
    dim = next(iter(windows_by_scenario.values())).shape[2]
    model_cfg = CVAEConfig(seq_len=seq_len, dim=dim)

    n_max = max(w.shape[0] for w in windows_by_scenario.values())
    batches, masks = [], []
    for k in keys:
        w = windows_by_scenario[k]
        pad = n_max - w.shape[0]
        # pad with copies of row 0 and mask them out
        batches.append(np.concatenate([w, np.repeat(w[:1], pad, 0)], axis=0))
        masks.append(np.concatenate([np.ones(w.shape[0]), np.zeros(pad)]))
    batch = jnp.asarray(np.stack(batches), jnp.float32)  # (S, Nmax, T, D)
    mask = jnp.asarray(np.stack(masks), jnp.float32)  # (S, Nmax)

    base_key = jax.random.PRNGKey(train_cfg.seed)
    init_keys = jax.random.split(base_key, len(keys))
    params = jax.vmap(lambda k: init_params(k, model_cfg))(init_keys)
    optimizer = optax.adam(train_cfg.lr)
    opt_state = jax.vmap(optimizer.init)(params)

    step = make_train_step(model_cfg, train_cfg, optimizer)

    # the key is a runtime ARGUMENT, not a closed-over constant: a closure
    # would bake the seed into the HLO, so every new seed value would mint
    # a never-before-compiled program (defeating the persistent cache —
    # the scan trainer's run() threads its key the same way)
    def run(params, opt_state, key, batch, mask):
        def body(carry, epoch):
            params, opt_state = carry
            ks = jax.random.split(jax.random.fold_in(key, epoch), len(keys))
            params, opt_state, comps = jax.vmap(step)(
                params, opt_state, ks, batch, mask
            )
            return (params, opt_state), jnp.stack(
                [comps[m] for m in _METRIC_KEYS], axis=-1
            )

        (params, opt_state), metrics = jax.lax.scan(
            body, (params, opt_state), jnp.arange(train_cfg.epochs)
        )
        return params, metrics

    params, metrics = jax.jit(run)(params, opt_state, base_key, batch, mask)
    metrics = np.asarray(metrics)  # (epochs, S, 5)

    params_by = {
        k: jax.tree_util.tree_map(lambda p, i=i: p[i], params)
        for i, k in enumerate(keys)
    }
    history_by = {
        k: {m: metrics[:, i, j] for j, m in enumerate(_METRIC_KEYS)}
        for i, k in enumerate(keys)
    }
    return params_by, history_by


def train_conv(
    windows: np.ndarray,
    model_cfg=None,
    train_cfg: TrainConfig = TrainConfig(epochs=500),
    kld_weight: float = 0.05,
):
    """Train the temporal-conv VAE on long windows (BASELINE config 3).

    ``windows``: (N, T, D) trajectories (e.g. the 50-point random-walk set,
    reference ``Traj_Data_Process.py:186-199``); conditioned on the start
    point.  Returns (params, history dict, model_cfg).
    """
    from ..models import ConvCVAEConfig, conv_forward, init_conv_params

    if model_cfg is None:
        model_cfg = ConvCVAEConfig(seq_len=windows.shape[1], dim=windows.shape[2])
    x_abs = jnp.asarray(windows, jnp.float32)
    # RELATIVE targets + absolute-start condition, mirroring the dense CVAE
    # (and conv_sample, which decodes relative and shifts by start_xy):
    # dim>=3 windows are [t, x, y] → the ONE shared to_relative transform;
    # dim==2 are [x, y] (no time column, outside to_relative's contract)
    if x_abs.shape[2] >= 3:
        x, start = to_relative(x_abs)
    else:
        start = x_abs[:, 0, :2]
        x = x_abs - start[:, None, :]
    cond = start
    if cond.shape[1] < model_cfg.cond_dim:
        cond = jnp.pad(cond, ((0, 0), (0, model_cfg.cond_dim - cond.shape[1])))

    key = jax.random.PRNGKey(train_cfg.seed)
    params = init_conv_params(key, model_cfg)
    optimizer = optax.adam(train_cfg.lr)
    opt_state = optimizer.init(params)

    def loss_fn(p, k):
        recon, mu, lv, _ = conv_forward(p, k, x, cond, model_cfg)
        recon_l = jnp.mean((recon - x) ** 2)
        kld = -0.5 * jnp.mean(1 + lv - mu**2 - jnp.exp(lv))
        return recon_l + kld_weight * kld, (recon_l, kld)

    # key threaded as a runtime argument (a closure would bake the seed
    # into the HLO and defeat the persistent compilation cache)
    def run(params, opt_state, key):
        def body(carry, epoch):
            params, opt_state = carry
            k = jax.random.fold_in(key, epoch)
            (total, (r, kl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, k
            )
            updates, opt_state = optimizer.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), jnp.stack([total, r, kl])

        (params, _), metrics = jax.lax.scan(
            body, (params, opt_state), jnp.arange(train_cfg.epochs)
        )
        return params, metrics

    params, metrics = jax.jit(run)(params, opt_state, key)
    metrics = np.asarray(metrics)
    history = {
        "total": metrics[:, 0],
        "recon": metrics[:, 1],
        "kld": metrics[:, 2],
    }
    return params, history, model_cfg
