"""Fused-Pallas trainer tests (interpreter mode on CPU; the compiled path
is exercised on real TPU by bench.py and was validated live — 3000 epochs
in 0.11 s with the same loss trajectory as the scan trainer)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from defensive_model_vae_tpu.models import CVAEConfig, LossWeights, init_params
from defensive_model_vae_tpu.ops.fused_trainer import (
    FUSED_METRIC_KEYS,
    _flatten_params,
    _forward_loss,
    _fused_call,
    _unflatten_params,
    fused_inputs,
    fused_step_reference,
)


CFG = CVAEConfig()


def _prep(windows):
    # the REAL input prep — the oracle tests must consume exactly what the
    # kernels consume, so any transform change propagates here too
    return fused_inputs(windows)


def test_forward_loss_matches_model_stack(all_windows):
    """The kernel's flat-layout loss must equal models.forward + cvae_loss."""
    from defensive_model_vae_tpu.models import cvae_loss, forward, to_relative

    w = all_windows["sce2"]
    params = init_params(jax.random.PRNGKey(0), CFG)
    x_flat, cond = _prep(w)
    eps = jax.random.normal(jax.random.PRNGKey(5), (len(w), CFG.latent_dim))

    total_k, comps_k = _forward_loss(
        _flatten_params(params), x_flat, cond, eps, CFG, LossWeights()
    )

    batch = jnp.asarray(w, jnp.float32)
    rel, starts = to_relative(batch)
    from defensive_model_vae_tpu.models.cvae import decode, encode

    mu, logvar, hc = encode(params, rel, starts)
    z = mu + eps * jnp.exp(0.5 * logvar)
    recon = decode(params, z, hc, CFG)
    total_m, comps_m = cvae_loss(recon, rel, mu, logvar, LossWeights())

    assert np.isclose(float(total_k), float(total_m), rtol=1e-5)
    for i, key in enumerate(FUSED_METRIC_KEYS):
        assert np.isclose(float(comps_k[i]), float(comps_m[key]), rtol=1e-5), key


@pytest.mark.slow
def test_fused_single_step_matches_oracle(all_windows):
    w = all_windows["sce2"]
    params = init_params(jax.random.PRNGKey(0), CFG)
    x_flat, cond = _prep(w)
    eps = jax.random.normal(jax.random.PRNGKey(9), (len(w), CFG.latent_dim))
    plist = tuple(_flatten_params(params))

    out_p, metrics = _fused_call(
        plist, x_flat, cond, jnp.array([[0]], jnp.int32),
        CFG, LossWeights(), 1, 1e-3, eps=eps, interpret=True,
    )
    ref_params, ref_comps = fused_step_reference(params, w, eps)
    ref_list = _flatten_params(ref_params)
    for a, b in zip(out_p, ref_list):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert np.allclose(np.asarray(metrics)[0, :5], np.asarray(ref_comps), rtol=1e-5)


def test_fused_multi_step_descends(all_windows):
    """A few eps-driven steps in interpreter mode must reduce the loss and
    stay finite (exercises the in-kernel Adam state threading)."""
    w = all_windows["sce2"]
    params = init_params(jax.random.PRNGKey(0), CFG)
    x_flat, cond = _prep(w)
    eps = jax.random.normal(jax.random.PRNGKey(4), (len(w), CFG.latent_dim))
    plist = tuple(_flatten_params(params))
    out_p, metrics = _fused_call(
        plist, x_flat, cond, jnp.array([[0]], jnp.int32),
        CFG, LossWeights(), 30, 1e-3, eps=eps, interpret=True,
    )
    m = np.asarray(metrics)[:, 0]
    assert np.all(np.isfinite(m))
    assert m[-1] < m[0]
    final = _unflatten_params(list(out_p))
    assert set(final) == set(params)


def test_forward_loss_masked_matches_padded():
    """Kernel-side masked means must equal the unpadded loss (the invariant
    the multi-scenario grid kernel relies on)."""
    from defensive_model_vae_tpu.models import LossWeights

    from conftest import FIXTURES

    w = np.load(FIXTURES / "trajectory_sce2_cond.npy")
    params = init_params(jax.random.PRNGKey(0), CFG)
    plist = _flatten_params(params)
    x_flat, cond = _prep(w)
    eps = jax.random.normal(jax.random.PRNGKey(5), (len(w), CFG.latent_dim))

    total_ref, comps_ref = _forward_loss(plist, x_flat, cond, eps, CFG, LossWeights())

    # pad with junk rows + 2-D mask
    pad = 7
    x_pad = jnp.concatenate([x_flat, jnp.tile(x_flat[:1] * 3.3, (pad, 1))])
    c_pad = jnp.concatenate([cond, jnp.tile(cond[:1] + 5, (pad, 1))])
    e_pad = jnp.concatenate([eps, jnp.zeros((pad, CFG.latent_dim))])
    mask = jnp.concatenate([jnp.ones((len(w), 1)), jnp.zeros((pad, 1))])
    total_m, comps_m = _forward_loss(
        plist, x_pad, c_pad, e_pad, CFG, LossWeights(), mask
    )
    assert np.isclose(float(total_ref), float(total_m), rtol=1e-5)
    assert np.allclose(np.asarray(comps_ref), np.asarray(comps_m), rtol=1e-5)


@pytest.mark.slow
def test_fused_train_multi_matches_single_kernel(all_windows):
    """Multi-scenario grid kernel vs the single-scenario kernel, per-commit
    on the CPU suite: with explicit eps (the deterministic escape hatch both
    kernels share) the grid program for scenario i must reproduce
    ``_fused_call`` on that scenario's unpadded batch exactly — this pins
    the grid/BlockSpec plumbing and the padded-batch masking.  The single
    kernel is itself pinned to the XLA oracle above; the on-core-PRNG TPU
    path keeps its hardware check in bench.py::bench_multi_kernel (asserted
    every driver round, recorded as multi_kernel_converged in BENCH_r*.json)."""
    from defensive_model_vae_tpu.ops import fused_train_multi

    windows = {k: all_windows[k] for k in ("sce1", "sce2")}  # B=38 vs B=16
    epochs, seed = 5, 3
    eps_by = {
        k: np.asarray(
            jax.random.normal(jax.random.PRNGKey(11 + i), (len(w), CFG.latent_dim))
        )
        for i, (k, w) in enumerate(sorted(windows.items()))
    }
    params_by, hist_by = fused_train_multi(
        windows, epochs=epochs, seed=seed, eps_by_scenario=eps_by, interpret=True
    )

    for i, k in enumerate(sorted(windows)):
        w = windows[k]
        x_flat, cond = _prep(w)
        plist = tuple(_flatten_params(init_params(jax.random.PRNGKey(seed + i), CFG)))
        out_p, metrics = _fused_call(
            plist, x_flat, cond, jnp.array([[seed]], jnp.int32),
            CFG, LossWeights(), epochs, 1e-3,
            eps=jnp.asarray(eps_by[k]), interpret=True,
        )
        single = _unflatten_params(list(out_p))
        # atol is fp-order, not semantics: XLA fuses the grid and single
        # kernels' HLO differently, and the reassociation noise compounds
        # over the feedback epochs (measured ~1.3e-6 after 4 epochs under
        # the manual backward — same story as the scale-kernel oracle test)
        for name, lp in params_by[k].items():
            assert np.allclose(lp["w"], np.asarray(single[name]["w"]), atol=1e-5), (k, name)
            assert np.allclose(lp["b"], np.asarray(single[name]["b"]), atol=1e-5), (k, name)
        m = np.asarray(metrics)[:, :5]
        for j, key in enumerate(FUSED_METRIC_KEYS):
            assert np.allclose(hist_by[k][key], m[:, j], rtol=1e-5), (k, key)


@pytest.mark.slow
def test_fused_train_seeds_matches_single_kernel(all_windows):
    """Seed-grid kernel (one launch trains K seeds of one corpus) vs the
    single-scenario kernel, per seed, in interpret mode with explicit eps.
    The grid block shares one corpus copy and an all-ones mask, which must
    be arithmetically identical to the unmasked single-kernel loss."""
    from defensive_model_vae_tpu.ops import fused_train_seeds

    w = all_windows["sce2"]
    seeds = [3, 17]
    epochs = 4
    eps_by = {
        s: np.asarray(jax.random.normal(jax.random.PRNGKey(100 + s),
                                        (len(w), CFG.latent_dim)))
        for s in seeds
    }
    params_by, hist_by = fused_train_seeds(
        w, seeds, epochs=epochs, eps_by_seed=eps_by, interpret=True
    )
    assert set(params_by) == set(seeds)

    x_flat, cond = _prep(w)
    for s in seeds:
        plist = tuple(_flatten_params(init_params(jax.random.PRNGKey(s), CFG)))
        out_p, metrics = _fused_call(
            plist, x_flat, cond, jnp.array([[s]], jnp.int32),
            CFG, LossWeights(), epochs, 1e-3,
            eps=jnp.asarray(eps_by[s]), interpret=True,
        )
        single = _unflatten_params(list(out_p))
        # atol 1e-5: cross-kernel fp reassociation (see the multi test)
        for name, lp in params_by[s].items():
            assert np.allclose(lp["w"], np.asarray(single[name]["w"]), atol=1e-5), (s, name)
            assert np.allclose(lp["b"], np.asarray(single[name]["b"]), atol=1e-5), (s, name)
        # all five metric columns: the seeds-path history harvest is its
        # own slicing code, distinct from the multi-scenario harvest
        m = np.asarray(metrics)[:, :5]
        for j, key in enumerate(FUSED_METRIC_KEYS):
            assert np.allclose(hist_by[s][key], m[:, j], rtol=1e-5), (s, key)


def test_fused_vmem_budget_check():
    """Oversized configs get a clear error pointing at the scan trainer
    (measured envelope: hidden=256 fits, hidden=512 exceeds VMEM)."""
    from defensive_model_vae_tpu.ops.fused_trainer import _check_vmem_budget

    _check_vmem_budget(CVAEConfig(hidden_dim=256))  # fits
    with pytest.raises(ValueError, match="train.train"):
        _check_vmem_budget(CVAEConfig(hidden_dim=512))


def test_grid_epoch_budget_check():
    """Grid kernels refuse epoch counts whose double-buffered VMEM metrics
    block exceeds the scoped limit (measured on v5e: 3000 ok, 30000 OOMs
    at 31 MB vs the 16 MB limit), with a chunked-resume pointer."""
    import numpy as np
    import pytest as _pytest

    from defensive_model_vae_tpu.ops import (
        fused_train, fused_train_multi, fused_train_seeds,
    )
    from defensive_model_vae_tpu.ops.fused_trainer import _check_epoch_budget

    _check_epoch_budget(3000)  # the reference config fits
    _check_epoch_budget(20000, buffers=1)  # single kernel: no double buffer
    w = np.zeros((4, 10, 3), np.float32)
    # the fused kernels cannot resume — the message must steer to the scan
    # trainer's chunked path, not suggest re-running the kernel in chunks
    with _pytest.raises(ValueError, match="start_epoch"):
        fused_train_seeds(w, [0, 1], epochs=30000)
    with _pytest.raises(ValueError, match="start_epoch"):
        fused_train_multi({"sce2": w}, epochs=30000)
    with _pytest.raises(ValueError, match="start_epoch"):
        fused_train(w, epochs=60000)
    with _pytest.raises(ValueError, match="duplicate"):
        fused_train_seeds(w, [3, 3, 17], epochs=100)
