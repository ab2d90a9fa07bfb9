"""Model / loss / training tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from defensive_model_vae_tpu.models import (
    CVAEConfig,
    ConvCVAEConfig,
    LossWeights,
    conv_forward,
    cvae_loss,
    forward,
    init_conv_params,
    init_params,
    sample,
    to_relative,
)
from defensive_model_vae_tpu.train import TrainConfig, train, train_multi_scenario
from defensive_model_vae_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from defensive_model_vae_tpu.generate import generate_trajectories

from conftest import REFERENCE_ROOT, requires_reference


CFG = CVAEConfig(seq_len=10, dim=3)


def test_param_shapes_match_reference_architecture():
    params = init_params(jax.random.PRNGKey(0), CFG)
    spec = CFG.layer_spec()
    assert set(params) == set(spec)
    for name, (fi, fo) in spec.items():
        assert params[name]["w"].shape == (fi, fo)
        assert params[name]["b"].shape == (fo,)
    # reference dims: enc input 30, latent heads 256->8, dec output 30
    assert spec["enc_0"] == (30, 128)
    assert spec["fc_mu"] == (256, 8)
    assert spec["dec_3"] == (128, 30)


def test_to_relative():
    batch = jnp.asarray(np.random.default_rng(0).normal(size=(4, 10, 3)))
    rel, starts = to_relative(batch)
    assert np.allclose(rel[:, 0, 1:3], 0.0, atol=1e-6)
    assert np.allclose(starts, batch[:, 0, 1:3])
    assert np.allclose(rel[:, :, 0], batch[:, :, 0])  # time untouched


def test_loss_golden_values():
    # hand-computed reference semantics on tiny fixed tensors
    rng = np.random.default_rng(42)
    x = rng.normal(size=(3, 4, 3)).astype(np.float32)
    r = rng.normal(size=(3, 4, 3)).astype(np.float32)
    mu = rng.normal(size=(3, 2)).astype(np.float32)
    logvar = rng.normal(size=(3, 2)).astype(np.float32)

    total, comps = cvae_loss(
        jnp.asarray(r), jnp.asarray(x), jnp.asarray(mu), jnp.asarray(logvar),
        LossWeights(recon=0.1, kld=0.1, start=1.0, time=1.0),
    )
    recon = ((r - x) ** 2).mean()
    kld = -0.5 * (1 + logvar - mu**2 - np.exp(logvar)).mean()
    start = ((r[:, 0, 1:3] - x[:, 0, 1:3]) ** 2).mean()
    tdiff = r[:, 1:, 0] - r[:, :-1, 0]
    time = (r[:, 0, 0] ** 2).mean() + np.maximum(-tdiff, 0).mean()
    assert np.isclose(comps["recon"], recon, rtol=1e-5)
    assert np.isclose(comps["kld"], kld, rtol=1e-5)
    assert np.isclose(comps["start"], start, rtol=1e-5)
    assert np.isclose(comps["time"], time, rtol=1e-5)
    assert np.isclose(total, 0.1 * recon + 0.1 * kld + start + time, rtol=1e-5)


def test_masked_loss_ignores_padding():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 5, 3)), jnp.float32)
    r = jnp.asarray(rng.normal(size=(4, 5, 3)), jnp.float32)
    mu = jnp.asarray(rng.normal(size=(4, 2)), jnp.float32)
    lv = jnp.asarray(rng.normal(size=(4, 2)), jnp.float32)

    t_full, c_full = cvae_loss(r[:2], x[:2], mu[:2], lv[:2])
    # pad with junk rows and mask them
    mask = jnp.array([1.0, 1.0, 0.0, 0.0])
    t_masked, c_masked = cvae_loss(r, x, mu, lv, mask=mask)
    assert np.isclose(t_full, t_masked, rtol=1e-5)
    for k in c_full:
        assert np.isclose(c_full[k], c_masked[k], rtol=1e-5), k

    ones = jnp.ones(2)
    t_ones, _ = cvae_loss(r[:2], x[:2], mu[:2], lv[:2], mask=ones)
    assert np.isclose(t_full, t_ones, rtol=1e-6)


def test_forward_shapes_and_determinism():
    params = init_params(jax.random.PRNGKey(0), CFG)
    x = jnp.zeros((7, 10, 3))
    cond = jnp.zeros((7, 2))
    key = jax.random.PRNGKey(1)
    recon, mu, logvar, h = forward(params, key, x, cond, CFG)
    assert recon.shape == (7, 10, 3)
    assert mu.shape == (7, 8) and logvar.shape == (7, 8)
    assert h.shape == (7, 128)
    recon2, *_ = forward(params, key, x, cond, CFG)
    assert np.allclose(recon, recon2)  # same key → same sample


@pytest.fixture(scope="module")
def trained_sce1(windows_sce1):
    return train(windows_sce1, train_cfg=TrainConfig(epochs=300))


def test_training_converges(trained_sce1):
    _, hist = trained_sce1
    assert hist["total"][0] / hist["total"][-1] > 10
    assert np.all(np.isfinite(hist["total"]))


def test_generation_semantics(trained_sce1, windows_sce1):
    params, _ = trained_sce1
    start = windows_sce1[0, 0, 1:3]
    traj = generate_trajectories(params, CFG, start, n_samples=1, seed=5)
    assert traj.shape == (10, 3)
    # trained model: time starts near 0, increases, xy starts near condition
    assert abs(traj[0, 0]) < 1.0
    assert np.sum(np.diff(traj[:, 0]) > 0) >= 8
    assert np.linalg.norm(traj[0, 1:3] - start) < 5.0
    # batched path
    many = generate_trajectories(params, CFG, np.tile(start, (4, 1)), n_samples=3)
    assert many.shape == (4, 3, 10, 3)
    # distinct z draws give distinct trajectories
    assert not np.allclose(many[0, 0], many[0, 1])


def test_checkpoint_roundtrip(tmp_path, windows_sce1):
    params, hist = train(windows_sce1, train_cfg=TrainConfig(epochs=10))
    d = save_checkpoint(str(tmp_path / "ckpt"), params, CFG, "sce1", hist)
    params2, cfg2, manifest = load_checkpoint(d)
    assert cfg2 == CFG and manifest["scenario"] == "sce1"
    for name in params:
        assert np.allclose(params[name]["w"], params2[name]["w"])
    t1 = generate_trajectories(params, CFG, windows_sce1[0, 0, 1:3], seed=2)
    t2 = generate_trajectories(params2, CFG, windows_sce1[0, 0, 1:3], seed=2)
    assert np.allclose(t1, t2, atol=1e-6)

    # the saved loss history reads back (and absent history is None, not
    # an exception)
    from defensive_model_vae_tpu.train.checkpoint import load_history

    hist2 = load_history(d)
    np.testing.assert_array_equal(hist2["total"], np.asarray(hist["total"]))
    d2 = save_checkpoint(str(tmp_path / "nohist"), params, CFG, "sce1")
    assert load_history(d2) is None


@pytest.mark.slow
def test_conv_cvae_forward_and_grad():
    cfg = ConvCVAEConfig(seq_len=50, dim=2)
    params = init_conv_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(6, 50, 2)), jnp.float32)
    cond = x[:, 0, :]
    recon, mu, logvar, _ = conv_forward(params, jax.random.PRNGKey(1), x, cond, cfg)
    assert recon.shape == (6, 50, 2)

    def loss(p):
        r, m, lv, _ = conv_forward(p, jax.random.PRNGKey(1), x, cond, cfg)
        return jnp.mean((r - x) ** 2) - 0.5 * jnp.mean(1 + lv - m**2 - jnp.exp(lv))

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(leaf)) for leaf in flat)
    assert any(np.abs(leaf).max() > 0 for leaf in flat)


@pytest.mark.slow
def test_multi_scenario_training(all_windows):
    subset = {k: all_windows[k] for k in ("sce1", "sce2")}
    params_by, hist_by = train_multi_scenario(subset, TrainConfig(epochs=100))
    for k in subset:
        h = hist_by[k]["total"]
        assert h[0] / h[-1] > 3
    # the two models are genuinely different
    w1 = params_by["sce1"]["enc_0"]["w"]
    w2 = params_by["sce2"]["enc_0"]["w"]
    assert not np.allclose(w1, w2)


@requires_reference
def test_all_loadable_reference_checkpoints_import():
    """Every shipped .pth the reference's own code can load (25/29) imports
    and generates finite trajectories.  The four vae_random_*.pth are
    orphans from an older UNCONDITIONAL architecture (encoder input 100 =
    50x2 random-walk windows, no condition_encoder) that the in-tree
    ConditionalTrajectoryVAE cannot load either — documented, not
    importable by design."""
    import glob

    from defensive_model_vae_tpu.generate import generate_trajectories
    from defensive_model_vae_tpu.train.torch_import import load_torch_checkpoint

    orphans = []
    for p in sorted(glob.glob(str(REFERENCE_ROOT / "training/models/*.pth"))):
        try:
            params, cfg = load_torch_checkpoint(p)
        except KeyError:
            orphans.append(p.rsplit("/", 1)[-1])
            continue
        g = generate_trajectories(
            params, cfg, np.array([[-190.0, 40.0]], np.float32), seed=0
        )
        assert np.all(np.isfinite(np.asarray(g))), p
    assert orphans == [f"vae_random_{i}.pth" for i in (1, 2, 3, 4)]


@pytest.mark.slow
def test_mixed_precision_training(windows_sce1, trained_sce1):
    """``TrainConfig.compute_dtype="bfloat16"``: the forward/backward run
    in bf16 while master params and Adam stay float32.  Checks: (a) the
    bf16 path actually changes the computation (guards a silent no-op),
    (b) params remain float32, (c) convergence is on par with f32, (d)
    the default (None) path is byte-identical to a config that never
    mentions compute_dtype."""
    import jax

    params16, hist16 = train(
        windows_sce1,
        train_cfg=TrainConfig(epochs=300, compute_dtype="bfloat16"),
    )
    params32, hist32 = trained_sce1

    for layer in params16.values():
        assert layer["w"].dtype == jnp.float32
    # bf16 noise/rounding must actually flow through the update
    assert not np.allclose(
        np.asarray(params16["enc_0"]["w"]), np.asarray(params32["enc_0"]["w"])
    )
    # on-par convergence: same order of magnitude as f32 at equal epochs
    assert np.isfinite(hist16["total"]).all()
    assert hist16["total"][-1] < hist32["total"][-1] * 2.0

    # explicit None reproduces the default config's run bit-exactly
    params_none, _ = train(
        windows_sce1, train_cfg=TrainConfig(epochs=50, compute_dtype=None)
    )
    params_default, _ = train(windows_sce1, train_cfg=TrainConfig(epochs=50))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params_none, params_default,
    )


def test_import_parses_basename_not_directory(tmp_path):
    """offset_mode and the scenario id must come from the FILENAME: a
    directory named offset_experiments/ or sce2_backup/ leaking into the
    manifest would flip generation semantics (double-shifted starts) or
    mislabel the scenario."""
    import json

    import torch

    from defensive_model_vae_tpu.models import init_params
    from defensive_model_vae_tpu.train.torch_import import (
        _NAME_MAP, import_to_checkpoint, load_torch_checkpoint,
    )

    # synthesize a reference-layout state_dict from our own params
    params = init_params(jax.random.PRNGKey(0), CFG)
    state = {}
    for tname, ours in _NAME_MAP.items():
        state[f"{tname}.weight"] = torch.tensor(
            np.asarray(params[ours]["w"]).T.copy()
        )
        state[f"{tname}.bias"] = torch.tensor(np.asarray(params[ours]["b"]))
    d = tmp_path / "offset_experiments" / "sce2_backup"
    d.mkdir(parents=True)
    pth = d / "vae_sce1_ld8_epoch3000.pth"  # NON-offset sce1 model
    torch.save(state, pth)

    out = import_to_checkpoint(str(pth), str(tmp_path / "ck"))
    with open(tmp_path / "ck" / "manifest.json") as f:
        mf = json.load(f)
    assert mf["offset_mode"] is False  # 'offset' only in the DIRECTORY
    assert mf["scenario"] == "sce1"    # 'sce2' only in the DIRECTORY

    # an UNREGISTERED sce10 must record scenario None, not substring-match
    # the registered sce1
    pth10 = d / "vae_sce10_ld8.pth"
    torch.save(state, pth10)
    import_to_checkpoint(str(pth10), str(tmp_path / "ck10"))
    with open(tmp_path / "ck10" / "manifest.json") as f:
        assert json.load(f)["scenario"] is None

    # explicit dim override for ambiguous flat widths: synthesize an
    # 18-wide model (dim=2 seq=9 vs the heuristic's dim=3 seq=6)
    from defensive_model_vae_tpu.models import CVAEConfig

    cfg2 = CVAEConfig(seq_len=9, dim=2)
    p2 = init_params(jax.random.PRNGKey(1), cfg2)
    state2 = {}
    for tname, ours in _NAME_MAP.items():
        state2[f"{tname}.weight"] = torch.tensor(np.asarray(p2[ours]["w"]).T.copy())
        state2[f"{tname}.bias"] = torch.tensor(np.asarray(p2[ours]["b"]))
    pth2 = tmp_path / "vae_sce1_amb.pth"
    torch.save(state2, pth2)
    _, c_default = load_torch_checkpoint(str(pth2))
    assert (c_default.seq_len, c_default.dim) == (6, 3)  # documented default
    _, c_dim2 = load_torch_checkpoint(str(pth2), dim=2)
    assert (c_dim2.seq_len, c_dim2.dim) == (9, 2)


def test_export_to_pth_roundtrips(tmp_path):
    """export_to_pth is the exact inverse of the importer: a native
    checkpoint exports to a weights_only-loadable .pth that re-imports to
    bit-identical params and config; non-MLP checkpoints error clearly."""
    import torch

    from defensive_model_vae_tpu.train.torch_import import (
        export_to_pth, load_torch_checkpoint,
    )

    params = init_params(jax.random.PRNGKey(3), CFG)
    d = save_checkpoint(str(tmp_path / "ck"), params, CFG, "sce1")
    pth = str(tmp_path / "exported.pth")
    assert export_to_pth(d, pth) == pth

    # plain-tensor state_dict: loads under the safe weights_only path
    state = torch.load(pth, weights_only=True)
    assert state["condition_encoder.0.weight"].shape == (128, 2)

    p2, cfg2 = load_torch_checkpoint(pth)
    assert cfg2 == CFG
    for name, layer in params.items():
        np.testing.assert_array_equal(p2[name]["w"], np.asarray(layer["w"]))
        np.testing.assert_array_equal(p2[name]["b"], np.asarray(layer["b"]))

    # a Conv1D checkpoint has no reference-class equivalent — but it must
    # roundtrip through the native store (ConvCVAEConfig reconstruction,
    # channels list→tuple) and error CLEARLY on export
    ccfg = ConvCVAEConfig(seq_len=20, dim=2)
    cparams = init_conv_params(jax.random.PRNGKey(0), ccfg)
    dc = save_checkpoint(str(tmp_path / "conv"), cparams, ccfg, None)
    _, cfg3, _ = load_checkpoint(dc)
    assert cfg3 == ccfg
    with pytest.raises(ValueError, match="not a reference-family"):
        export_to_pth(dc, str(tmp_path / "conv.pth"))


@requires_reference
def test_export_loads_into_live_reference_class(tmp_path):
    """The exported state_dict must load STRICTLY into the reference's own
    ConditionalTrajectoryVAE (Training_VAE.py:118-167) and decode
    identically — the migration round-trip's behavioral contract."""
    import sys

    import torch

    from defensive_model_vae_tpu.models.cvae import decode, encode_condition
    from defensive_model_vae_tpu.train.torch_import import export_to_pth

    params = init_params(jax.random.PRNGKey(11), CFG)
    d = save_checkpoint(str(tmp_path / "ck"), params, CFG, "sce1")
    pth = str(tmp_path / "exported.pth")
    export_to_pth(d, pth)

    sys.path.insert(0, str(REFERENCE_ROOT))
    try:
        # Tools↔Training_VAE import circularly; only the Tools-first order
        # resolves (Training_VAE's `from Tools import *` tolerates the
        # partially-initialized module, Tools' named import does not)
        import Tools  # noqa: F401
        from Training_VAE import ConditionalTrajectoryVAE
    finally:
        sys.path.pop(0)

    model = ConditionalTrajectoryVAE(
        seq_len=CFG.seq_len, dim=CFG.dim,
        latent_dim=CFG.latent_dim, hidden_dim=CFG.hidden_dim,
    )
    model.load_state_dict(torch.load(pth, weights_only=True), strict=True)
    model.eval()

    z = np.random.default_rng(0).normal(size=(4, CFG.latent_dim))
    start = np.array([[-193.3, 50.0]] * 4)
    with torch.no_grad():
        h_ref = model.condition_encoder(torch.tensor(start, dtype=torch.float32))
        out_ref = model.decode(torch.tensor(z, dtype=torch.float32), h_ref)
    h_ours = encode_condition(params, jnp.asarray(start, jnp.float32))
    out_ours = decode(params, jnp.asarray(z, jnp.float32), h_ours, CFG)
    np.testing.assert_allclose(
        np.asarray(out_ours), out_ref.numpy(), rtol=0, atol=1e-5
    )


def test_conv_sample_pads_extra_condition_dims():
    """conv_sample must zero-pad the (B,2) start to cond_dim like
    train_conv does — a cond_dim>2 ConvCVAE was trainable but crashed at
    generation."""
    from defensive_model_vae_tpu.models import ConvCVAEConfig, init_conv_params
    from defensive_model_vae_tpu.models.conv_cvae import conv_sample

    cfg = ConvCVAEConfig(seq_len=20, dim=2, cond_dim=4)
    params = init_conv_params(jax.random.PRNGKey(0), cfg)
    out = conv_sample(params, jax.random.PRNGKey(1),
                      np.array([[1.0, 2.0]], np.float32), cfg)
    assert out.shape == (1, 20, 2)
    assert np.all(np.isfinite(np.asarray(out)))
