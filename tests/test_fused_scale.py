"""Scale-kernel tests (interpreter mode on CPU; the compiled path is
exercised on real TPU by bench.py's ``scale_fused_*`` measurement).

The oracle chain: ``fused_scale_reference`` with an explicit ``tile``
reproduces the kernel's exact per-tile partial-sum order in plain XLA, and
with ``tile=None`` it is the full-batch objective — so the tests pin both
(a) kernel == tiled oracle (same arithmetic) and (b) tiled oracle ==
full-batch oracle (the grad-accumulation contract: per-tile losses scaled
by the GLOBAL n_valid sum to the full-batch means)."""

import jax
import numpy as np
import pytest

from defensive_model_vae_tpu.models import CVAEConfig, init_params
from defensive_model_vae_tpu.ops.fused_scale import (
    fused_scale_reference,
    fused_train_scale,
    fused_train_scale_dp,
)
from defensive_model_vae_tpu.ops.fused_trainer import _flatten_params
from defensive_model_vae_tpu.parallel import create_mesh

CFG = CVAEConfig()


def _tiny_corpus(n, seed=3):
    rng = np.random.default_rng(seed)
    t = np.cumsum(rng.uniform(0.5, 2.0, (n, CFG.seq_len)), axis=1)
    t -= t[:, :1]
    xy = rng.normal(0.0, 5.0, (n, CFG.seq_len, 2)).cumsum(axis=1)
    return np.concatenate([t[..., None], xy], axis=-1).astype(np.float32)


@pytest.mark.slow
def test_scale_kernel_matches_tiled_oracle():
    """Kernel (interpret, f32, explicit eps) == the plain-XLA tiled oracle
    after several epochs — params AND the per-epoch metric rows."""
    w = _tiny_corpus(24)
    eps = np.asarray(
        jax.random.normal(jax.random.PRNGKey(7), (24, CFG.latent_dim))
    )
    params, hist = fused_train_scale(
        w, epochs=4, tile=8, compute_dtype=None, eps=eps, interpret=True
    )
    ref_params, ref_hist = fused_scale_reference(
        init_params(jax.random.PRNGKey(0), CFG), w, eps, epochs=4, tile=8
    )
    # XLA fuses the kernel trace and the oracle trace differently, so f32
    # reassociation noise compounds over the 4 feedback epochs (measured
    # max 2.7e-6 on params) — the tolerance is fp-order, not semantics
    for a, b in zip(_flatten_params(params), _flatten_params(ref_params)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    got = np.stack([hist[k] for k in ("total", "recon", "kld", "start", "time")], 1)
    assert np.allclose(got, ref_hist, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_tiled_oracle_matches_full_batch():
    """The grad-accumulation contract: tiling changes only fp summation
    order, so the tiled oracle tracks the full-batch objective."""
    w = _tiny_corpus(24, seed=11)
    eps = np.asarray(
        jax.random.normal(jax.random.PRNGKey(2), (24, CFG.latent_dim))
    )
    p0 = init_params(jax.random.PRNGKey(0), CFG)
    p_tiled, h_tiled = fused_scale_reference(p0, w, eps, epochs=3, tile=8)
    p_full, h_full = fused_scale_reference(p0, w, eps, epochs=3, tile=None)
    for a, b in zip(_flatten_params(p_tiled), _flatten_params(p_full)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    assert np.allclose(h_tiled, h_full, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_scale_kernel_pads_ragged_corpus():
    """N not a multiple of tile: padded rows are masked zero windows, so
    the result equals the unpadded oracle exactly."""
    w = _tiny_corpus(13, seed=5)
    eps = np.asarray(
        jax.random.normal(jax.random.PRNGKey(4), (13, CFG.latent_dim))
    )
    params, hist = fused_train_scale(
        w, epochs=2, tile=8, compute_dtype=None, eps=eps, interpret=True
    )
    ref_params, ref_hist = fused_scale_reference(
        init_params(jax.random.PRNGKey(0), CFG), w, eps, epochs=2, tile=8
    )
    for a, b in zip(_flatten_params(params), _flatten_params(ref_params)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert np.allclose(
        np.stack([hist[k] for k in ("total", "recon", "kld", "start", "time")], 1),
        ref_hist, rtol=1e-5, atol=1e-6,
    )


@pytest.mark.slow
def test_scale_kernel_bf16_descends():
    """Mixed-precision mode in interpret: finite history that descends over
    a short run (bit-parity is not the contract — the recon target is the
    bf16-rounded corpus; convergence on-chip is asserted by bench.py)."""
    w = _tiny_corpus(32, seed=9)
    eps = np.asarray(
        jax.random.normal(jax.random.PRNGKey(6), (32, CFG.latent_dim))
    )
    params, hist = fused_train_scale(
        w, epochs=6, tile=16, compute_dtype="bfloat16", eps=eps, interpret=True
    )
    assert np.all(np.isfinite(hist["total"]))
    assert hist["total"][-1] < hist["total"][0]
    for p in _flatten_params(params):
        assert np.asarray(p).dtype == np.float32  # masters stay f32
        assert np.all(np.isfinite(np.asarray(p)))


@pytest.mark.parametrize("impl", ["rbg", "threefry2x32"])
def test_scale_kernel_hbm_noise_matches_per_epoch_oracle(impl):
    """noise='hbm' (the production default: fresh-per-epoch eps pre-generated
    by XLA and streamed from HBM) == the tiled oracle fed the byte-identical
    per-epoch eps stream, reproduced on host from the same key derivation
    (fold_in(key(seed, impl), 1), flat row-major draw, epoch-major rows) —
    for both the rbg production default and the backend-stable threefry."""
    w = _tiny_corpus(24)
    seed, epochs, tile = 5, 4, 8
    n_pad = 24  # already a multiple of tile
    key = jax.random.fold_in(jax.random.key(seed, impl=impl), 1)
    eps_pe = np.asarray(
        jax.random.normal(key, (epochs * n_pad * CFG.latent_dim,))
    ).reshape(epochs, n_pad, CFG.latent_dim)
    params, hist = fused_train_scale(
        w, epochs=epochs, tile=tile, compute_dtype=None, seed=seed,
        noise="hbm", noise_impl=impl, interpret=True,
    )
    ref_params, ref_hist = fused_scale_reference(
        init_params(jax.random.PRNGKey(seed), CFG), w, eps_pe,
        epochs=epochs, tile=tile,
    )
    for a, b in zip(_flatten_params(params), _flatten_params(ref_params)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    got = np.stack(
        [hist[k] for k in ("total", "recon", "kld", "start", "time")], 1
    )
    assert np.allclose(got, ref_hist, rtol=1e-5, atol=1e-5)
    # the per-epoch draws actually differ (production semantics, unlike the
    # constant explicit-eps escape hatch)
    assert not np.allclose(eps_pe[0], eps_pe[1])


def test_scale_kernel_hbm_ragged_pads():
    """hbm noise + ragged corpus: padded rows are masked, so the kernel
    equals the oracle fed the same stream truncated to the real rows."""
    w = _tiny_corpus(13, seed=5)
    seed, epochs, tile = 3, 2, 8
    n_pad = 16
    key = jax.random.fold_in(jax.random.key(seed, impl="rbg"), 1)
    eps_pe = np.asarray(
        jax.random.normal(key, (epochs * n_pad * CFG.latent_dim,))
    ).reshape(epochs, n_pad, CFG.latent_dim)[:, :13]
    params, hist = fused_train_scale(
        w, epochs=epochs, tile=tile, compute_dtype=None, seed=seed,
        noise="hbm", interpret=True,
    )
    ref_params, ref_hist = fused_scale_reference(
        init_params(jax.random.PRNGKey(seed), CFG), w, eps_pe,
        epochs=epochs, tile=tile,
    )
    for a, b in zip(_flatten_params(params), _flatten_params(ref_params)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    got = np.stack(
        [hist[k] for k in ("total", "recon", "kld", "start", "time")], 1
    )
    assert np.allclose(got, ref_hist, rtol=1e-5, atol=1e-5)


def test_scale_dp_hbm_noise_matches_per_epoch_oracle():
    """The DP tier's hbm mode (per-epoch eps from fold_in(key, dev·E + e)
    generated in the scan body) == the full-batch oracle fed the host-
    reproduced stream, on one device."""
    w = _tiny_corpus(24, seed=7)
    seed, epochs, tile = 9, 3, 8
    eps_pe = np.stack([
        np.asarray(jax.random.normal(
            jax.random.fold_in(jax.random.key(seed, impl="rbg"), e),
            (24, CFG.latent_dim),
        ))
        for e in range(epochs)
    ])
    params, hist = fused_train_scale_dp(
        w, mesh=None, epochs=epochs, tile=tile, compute_dtype=None,
        seed=seed, noise="hbm", interpret=True,
    )
    ref_params, ref_hist = fused_scale_reference(
        init_params(jax.random.PRNGKey(seed), CFG), w, eps_pe,
        epochs=epochs, tile=None,
    )
    for a, b in zip(_flatten_params(params), _flatten_params(ref_params)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    got = np.stack(
        [hist[k] for k in ("total", "recon", "kld", "start", "time")], 1
    )
    assert np.allclose(got, ref_hist, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_scale_dp_hbm_descends_on_mesh():
    """hbm noise through shard_map on the 8-device CPU mesh: finite and
    descending (per-device eps streams differ by design, so sharded ==
    single does not hold for hbm; the objective/optimizer contract is
    covered by the oracle tests above)."""
    n = 64
    w = _tiny_corpus(n, seed=29)
    mesh = create_mesh(shape=(8, 1))
    params, hist = fused_train_scale_dp(
        w, mesh=mesh, epochs=6, tile=16, compute_dtype="bfloat16",
        noise="hbm", interpret=True,
    )
    assert np.all(np.isfinite(hist["total"]))
    assert hist["total"][-1] < hist["total"][0]
    for p in _flatten_params(params):
        assert np.asarray(p).dtype == np.float32


def test_scale_kernel_hbm_bf16_descends():
    w = _tiny_corpus(32, seed=9)
    params, hist = fused_train_scale(
        w, epochs=6, tile=16, compute_dtype="bfloat16", noise="hbm",
        interpret=True,
    )
    assert np.all(np.isfinite(hist["total"]))
    assert hist["total"][-1] < hist["total"][0]


def test_scale_noise_guards():
    w = _tiny_corpus(16)
    with pytest.raises(ValueError, match="noise"):
        fused_train_scale(w, epochs=1, tile=16, compute_dtype=None,
                          noise="vmem", interpret=True)
    # the internal 'packed' mode (eps baked into corpus rows) must NOT be
    # reachable without an explicit eps — the hbm/prng corpora are packed
    # WITHOUT eps columns, so the kernel's packed-eps slice would read
    # out-of-range lanes
    with pytest.raises(ValueError, match="noise"):
        fused_train_scale(w, epochs=1, tile=16, compute_dtype=None,
                          noise="packed", interpret=True)
    with pytest.raises(ValueError, match="noise"):
        fused_train_scale_dp(w, epochs=1, tile=16, compute_dtype=None,
                             noise="packed", interpret=True)
    with pytest.raises(ValueError, match="GiB for the eps buffer"):
        # 4M epochs x 2048-row pad x 8 x (4B u32 temp + 4B f32) ≈ 500 GiB
        fused_train_scale(w, epochs=1 << 22, tile=2048, compute_dtype=None,
                          noise="hbm", interpret=True)
    with pytest.raises(ValueError, match="noise"):
        fused_train_scale_dp(w, epochs=1, tile=16, compute_dtype=None,
                             noise="vmem", interpret=True)


def test_manual_bias_via_dot_matches_sum():
    """The biasdot ablation lever (db via an MXU ones-row dot) returns the
    same gradients as the VPU-reduction default to fp order (f32)."""
    from defensive_model_vae_tpu.models import LossWeights
    from defensive_model_vae_tpu.ops.fused_trainer import fused_inputs
    from defensive_model_vae_tpu.ops.manual_grad import manual_value_and_grad

    w = _tiny_corpus(24, seed=31)
    x_flat, start = fused_inputs(w)
    eps = jax.random.normal(jax.random.PRNGKey(12), (24, CFG.latent_dim))
    plist = _flatten_params(init_params(jax.random.PRNGKey(0), CFG))
    comps_a, grads_a = manual_value_and_grad(
        plist, x_flat, start, eps, CFG, LossWeights()
    )
    comps_b, grads_b = manual_value_and_grad(
        plist, x_flat, start, eps, CFG, LossWeights(), bias_via_dot=True
    )
    assert np.allclose(np.asarray(comps_a), np.asarray(comps_b), atol=1e-7)
    for a, b in zip(grads_a, grads_b):
        a, b = np.asarray(a), np.asarray(b)
        assert np.allclose(a, b, atol=2e-6 * max(np.abs(a).max(), 1e-3))
    # the transpose dW formulation (ablation lever "dwT") is the same
    # contraction written as explicit-transpose + plain matmul
    comps_t, grads_t = manual_value_and_grad(
        plist, x_flat, start, eps, CFG, LossWeights(), dw_mode="transpose"
    )
    assert np.allclose(np.asarray(comps_a), np.asarray(comps_t), atol=1e-7)
    for a, b in zip(grads_a, grads_t):
        a, b = np.asarray(a), np.asarray(b)
        assert np.allclose(a, b, atol=2e-6 * max(np.abs(a).max(), 1e-3))
    # under the bf16 f32_acts mode (where the ablation actually runs the
    # lever) the dot path additionally QUANTIZES dy to bf16 before the
    # ones-row dot, while the default sums the f32 dy — a precision
    # change, so the agreement bound is bf16 rounding, not fp reassociation
    import jax.numpy as jnp

    kw = dict(compute_dtype=jnp.bfloat16, mixed_style="f32_acts")
    comps_m, grads_m = manual_value_and_grad(
        plist, x_flat, start, eps, CFG, LossWeights(), **kw
    )
    comps_mb, grads_mb = manual_value_and_grad(
        plist, x_flat, start, eps, CFG, LossWeights(), bias_via_dot=True, **kw
    )
    assert np.allclose(np.asarray(comps_m), np.asarray(comps_mb), atol=1e-6)
    for a, b in zip(grads_m, grads_mb):
        a, b = np.asarray(a), np.asarray(b)
        assert np.allclose(a, b, atol=1e-2 * max(np.abs(a).max(), 1e-3))


def test_manual_chain_cd_and_grads_modes():
    """chain_cd (dY chain in the compute dtype) returns the same loss
    components bit-for-bit (the forward is untouched) and gradients within
    bf16 rounding of the default f32 chain; the ablation-only grads_mode
    levers return zero gradients (nodw plants its liveness checksum in the
    cond_0 bias only), and chain_cd without a compute dtype is refused."""
    import jax.numpy as jnp
    import pytest

    from defensive_model_vae_tpu.models import LossWeights
    from defensive_model_vae_tpu.ops.fused_trainer import fused_inputs
    from defensive_model_vae_tpu.ops.manual_grad import manual_value_and_grad

    w = _tiny_corpus(24, seed=41)
    x_flat, start = fused_inputs(w)
    eps = jax.random.normal(jax.random.PRNGKey(12), (24, CFG.latent_dim))
    plist = _flatten_params(init_params(jax.random.PRNGKey(0), CFG))
    args = (plist, x_flat.astype(jnp.bfloat16), start.astype(jnp.bfloat16),
            eps.astype(jnp.bfloat16), CFG, LossWeights())
    kw = dict(compute_dtype=jnp.bfloat16, mixed_style="f32_acts")

    comps, grads = manual_value_and_grad(*args, **kw)
    comps_c, grads_c = manual_value_and_grad(*args, chain_cd=True, **kw)
    assert np.array_equal(np.asarray(comps), np.asarray(comps_c))
    for a, b in zip(grads, grads_c):
        a, b = np.asarray(a), np.asarray(b)
        # one extra bf16 rounding per chain hop (depth <= 4)
        assert np.allclose(a, b, atol=2e-2 * max(np.abs(a).max(), 1e-3))
        assert a.dtype == b.dtype == np.float32

    comps_n, grads_n = manual_value_and_grad(*args, grads_mode="nodw", **kw)
    assert np.array_equal(np.asarray(comps), np.asarray(comps_n))
    nonzero = [i for i, g in enumerate(grads_n)
               if np.abs(np.asarray(g)).max() > 0]
    assert nonzero == [1]  # cond_0 bias carries the chain checksum

    comps_f, grads_f = manual_value_and_grad(*args, grads_mode="none", **kw)
    assert np.array_equal(np.asarray(comps), np.asarray(comps_f))
    assert all(np.abs(np.asarray(g)).max() == 0 for g in grads_f)

    with pytest.raises(ValueError, match="chain_cd requires"):
        manual_value_and_grad(plist, x_flat, start, eps, CFG, LossWeights(),
                              chain_cd=True)
    with pytest.raises(ValueError, match="grads_mode"):
        manual_value_and_grad(*args, grads_mode="bogus", **kw)


def test_manual_grads_match_autodiff():
    """The hand-written backward (ops/manual_grad) == jax.grad of the
    shared _forward_loss to fp order in f32, for every masking mode; the
    f32_acts mixed style agrees within bf16 rounding (its backward dots
    cast dy to bf16 where autodiff keeps the f32 cotangent)."""
    import jax.numpy as jnp

    from defensive_model_vae_tpu.models import LossWeights
    from defensive_model_vae_tpu.ops.fused_trainer import (
        _forward_loss,
        fused_inputs,
    )
    from defensive_model_vae_tpu.ops.manual_grad import manual_value_and_grad

    w = _tiny_corpus(24, seed=21)
    x_flat, start = fused_inputs(w)
    eps = jax.random.normal(jax.random.PRNGKey(12), (24, CFG.latent_dim))
    plist = _flatten_params(init_params(jax.random.PRNGKey(0), CFG))
    lw = LossWeights()
    part_mask = jnp.concatenate([jnp.ones((20, 1)), jnp.zeros((4, 1))])

    for mask, nv in [(None, None), (part_mask, 24.0), (part_mask, None)]:
        (_, comps), grads = jax.value_and_grad(
            lambda pl_: _forward_loss(
                pl_, x_flat, start, eps, CFG, lw, mask, n_valid=nv
            ),
            has_aux=True,
        )(plist)
        comps_m, grads_m = manual_value_and_grad(
            plist, x_flat, start, eps, CFG, lw, mask, n_valid=nv
        )
        assert np.allclose(np.asarray(comps), np.asarray(comps_m), atol=1e-7)
        for a, b in zip(grads, grads_m):
            a, b = np.asarray(a), np.asarray(b)
            assert np.allclose(a, b, atol=2e-6 * max(np.abs(a).max(), 1e-3))

    x_bf = x_flat.astype(jnp.bfloat16)
    (_, comps), grads = jax.value_and_grad(
        lambda pl_: _forward_loss(
            pl_, x_bf, start.astype(jnp.bfloat16), eps.astype(jnp.bfloat16),
            CFG, lw, jnp.ones((24, 1)), n_valid=24.0,
            compute_dtype=jnp.bfloat16, mixed_style="f32_acts",
        ),
        has_aux=True,
    )(plist)
    comps_m, grads_m = manual_value_and_grad(
        plist, x_bf, start.astype(jnp.bfloat16), eps.astype(jnp.bfloat16),
        CFG, lw, jnp.ones((24, 1)), n_valid=24.0,
        compute_dtype=jnp.bfloat16, mixed_style="f32_acts",
    )
    assert np.allclose(np.asarray(comps), np.asarray(comps_m), atol=1e-6)
    for a, b in zip(grads, grads_m):
        a, b = np.asarray(a), np.asarray(b)
        assert np.allclose(a, b, atol=2e-2 * max(np.abs(a).max(), 1e-3))


def test_scale_kernel_autodiff_backward_matches_tiled_oracle():
    """backward='auto' (the traced-jax.value_and_grad path, no longer the
    default — _resolve_backward picks the hand-written backward where
    supported) still matches the tiled oracle: both gradient paths stay
    oracle-pinned.  The default-path tests above now cover 'manual'."""
    w = _tiny_corpus(24)
    eps = np.asarray(
        jax.random.normal(jax.random.PRNGKey(7), (24, CFG.latent_dim))
    )
    params, hist = fused_train_scale(
        w, epochs=4, tile=8, compute_dtype=None, eps=eps, interpret=True,
        backward="auto",
    )
    ref_params, ref_hist = fused_scale_reference(
        init_params(jax.random.PRNGKey(0), CFG), w, eps, epochs=4, tile=8
    )
    for a, b in zip(_flatten_params(params), _flatten_params(ref_params)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    got = np.stack(
        [hist[k] for k in ("total", "recon", "kld", "start", "time")], 1
    )
    assert np.allclose(got, ref_hist, rtol=1e-5, atol=1e-5)


def test_scale_kernel_autodiff_backward_bf16_descends():
    """Autodiff backward in the f32_acts mixed style (the non-default
    path): finite, descending, f32 masters."""
    w = _tiny_corpus(32, seed=9)
    eps = np.asarray(
        jax.random.normal(jax.random.PRNGKey(6), (32, CFG.latent_dim))
    )
    params, hist = fused_train_scale(
        w, epochs=6, tile=16, compute_dtype="bfloat16",
        mixed_style="f32_acts", eps=eps, interpret=True, backward="auto",
    )
    assert np.all(np.isfinite(hist["total"]))
    assert hist["total"][-1] < hist["total"][0]
    for p in _flatten_params(params):
        assert np.asarray(p).dtype == np.float32
        assert np.all(np.isfinite(np.asarray(p)))


@pytest.mark.slow
def test_scale_dp_autodiff_backward_matches_oracle_on_mesh():
    """backward='auto' through the DP tier (per-epoch grad kernel in
    shard_map) still reproduces the full-batch objective on the CPU mesh
    (the DP default-path tests now cover the manual backward)."""
    n = 64
    w = _tiny_corpus(n, seed=13)
    eps = np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (n, CFG.latent_dim))
    )
    mesh = create_mesh(shape=(8, 1))
    params, hist = fused_train_scale_dp(
        w, mesh=mesh, epochs=3, tile=8, compute_dtype=None, eps=eps,
        interpret=True, backward="auto",
    )
    ref_params, ref_hist = fused_scale_reference(
        init_params(jax.random.PRNGKey(0), CFG), w, eps, epochs=3, tile=None
    )
    for a, b in zip(_flatten_params(params), _flatten_params(ref_params)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    got = np.stack(
        [hist[k] for k in ("total", "recon", "kld", "start", "time")], 1
    )
    assert np.allclose(got, ref_hist, rtol=1e-4, atol=1e-5)


def test_scale_backward_guards():
    w = _tiny_corpus(16)
    with pytest.raises(ValueError, match="backward"):
        fused_train_scale(w, epochs=1, tile=16, compute_dtype=None,
                          backward="handrolled", interpret=True)
    with pytest.raises(ValueError, match="bf16_chain"):
        fused_train_scale(w, epochs=1, tile=16, compute_dtype="bfloat16",
                          mixed_style="bf16_chain", backward="manual",
                          interpret=True)


def test_scale_dp_matches_oracle_on_mesh():
    """The data-parallel tier (per-epoch grad kernel in shard_map + psum +
    replicated Adam) reproduces the full-batch objective on the 8-device
    CPU mesh: sharding/tiling changes only fp summation order."""
    n = 64  # 8 devices x tile=8 → one tile per device
    w = _tiny_corpus(n, seed=13)
    eps = np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (n, CFG.latent_dim))
    )
    mesh = create_mesh(shape=(8, 1))
    params, hist = fused_train_scale_dp(
        w, mesh=mesh, epochs=3, tile=8, compute_dtype=None, eps=eps,
        interpret=True,
    )
    ref_params, ref_hist = fused_scale_reference(
        init_params(jax.random.PRNGKey(0), CFG), w, eps, epochs=3, tile=None
    )
    for a, b in zip(_flatten_params(params), _flatten_params(ref_params)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    got = np.stack([hist[k] for k in ("total", "recon", "kld", "start", "time")], 1)
    assert np.allclose(got, ref_hist, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_scale_dp_sharded_equals_single_device():
    """Sharded-vs-single equality (the dryrun pattern): the mesh run and the
    mesh=None run execute the same per-epoch program modulo psum order."""
    n = 48  # ragged over 8x8 → padded, masked rows exercise the dp padding
    w = _tiny_corpus(n, seed=17)
    eps = np.asarray(
        jax.random.normal(jax.random.PRNGKey(5), (n, CFG.latent_dim))
    )
    mesh = create_mesh(shape=(8, 1))
    p_mesh, h_mesh = fused_train_scale_dp(
        w, mesh=mesh, epochs=2, tile=8, compute_dtype=None, eps=eps,
        interpret=True,
    )
    p_one, h_one = fused_train_scale_dp(
        w, mesh=None, epochs=2, tile=8, compute_dtype=None, eps=eps,
        interpret=True,
    )
    for a, b in zip(_flatten_params(p_mesh), _flatten_params(p_one)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for k in ("total", "recon", "kld", "start", "time"):
        assert np.allclose(h_mesh[k], h_one[k], rtol=1e-4, atol=1e-5)


def test_scale_dp_matches_whole_run_kernel():
    """Single-device DP tier (per-epoch kernel + XLA Adam) == the whole-run
    kernel (in-kernel Adam): same objective, same accumulation granularity,
    different program structure."""
    w = _tiny_corpus(24, seed=19)
    eps = np.asarray(
        jax.random.normal(jax.random.PRNGKey(8), (24, CFG.latent_dim))
    )
    p_dp, h_dp = fused_train_scale_dp(
        w, mesh=None, epochs=3, tile=8, compute_dtype=None, eps=eps,
        interpret=True,
    )
    p_wr, h_wr = fused_train_scale(
        w, epochs=3, tile=8, compute_dtype=None, eps=eps, interpret=True
    )
    for a, b in zip(_flatten_params(p_dp), _flatten_params(p_wr)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for k in ("total", "recon", "kld", "start", "time"):
        assert np.allclose(h_dp[k], h_wr[k], rtol=1e-4, atol=1e-5)


def test_scale_dp_bf16_descends_on_mesh():
    """Mixed-precision DP on the mesh: finite, descending, f32 masters."""
    n = 64
    w = _tiny_corpus(n, seed=23)
    eps = np.asarray(
        jax.random.normal(jax.random.PRNGKey(9), (n, CFG.latent_dim))
    )
    mesh = create_mesh(shape=(8, 1))
    params, hist = fused_train_scale_dp(
        w, mesh=mesh, epochs=6, tile=16, compute_dtype="bfloat16", eps=eps,
        interpret=True,
    )
    assert np.all(np.isfinite(hist["total"]))
    assert hist["total"][-1] < hist["total"][0]
    for p in _flatten_params(params):
        assert np.asarray(p).dtype == np.float32
        assert np.all(np.isfinite(np.asarray(p)))


def test_scale_tile_guards():
    w = _tiny_corpus(16)
    with pytest.raises(ValueError, match="multiple of 16"):
        fused_train_scale(w, epochs=1, tile=8, compute_dtype="bfloat16",
                          interpret=True)
    with pytest.raises(ValueError, match="multiple of 8"):
        fused_train_scale(w, epochs=1, tile=12, compute_dtype=None,
                          interpret=True)
    with pytest.raises(ValueError, match="VMEM"):
        fused_train_scale(w, epochs=1, tile=1 << 16, compute_dtype=None,
                          interpret=True)
    with pytest.raises(ValueError, match="mixed_style"):
        fused_train_scale(w, epochs=1, tile=16, compute_dtype="bfloat16",
                          mixed_style="f32-acts", interpret=True)
