"""Mesh / pjit sharding tests (run on the virtual 8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from defensive_model_vae_tpu.models import CVAEConfig, init_params
from defensive_model_vae_tpu.parallel import (
    create_mesh,
    make_parallel_train_step,
    replicate,
    shard_batch,
    tensor_shard_params,
)
from defensive_model_vae_tpu.train import TrainConfig, make_train_step, train

CFG = CVAEConfig(seq_len=10, dim=3)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_mesh_shapes():
    mesh = create_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = create_mesh(shape=(4, 2))
    assert mesh2.shape == {"data": 4, "model": 2}
    # a smaller mesh takes a device prefix
    assert create_mesh(shape=(3, 2)).shape == {"data": 3, "model": 2}
    with pytest.raises(ValueError):
        create_mesh(shape=(3, 5))  # 15 > available devices
    with pytest.raises(ValueError):
        create_mesh(n_devices=8, shape=(3, 2))  # inconsistent


def test_shard_batch_pads_and_shards():
    mesh = create_mesh(shape=(8, 1))
    batch = jnp.ones((13, 10, 3))
    sharded = shard_batch(batch, mesh)
    assert sharded.shape[0] == 16  # padded to multiple of 8
    assert len(sharded.sharding.device_set) == 8


def test_data_parallel_step_matches_single_device(windows_sce1):
    """One DP step over the mesh must equal the single-device step."""
    tc = TrainConfig(epochs=1)
    optimizer = optax.adam(tc.lr)
    step = make_train_step(CFG, tc, optimizer)

    params = init_params(jax.random.PRNGKey(0), CFG)
    opt_state = optimizer.init(params)
    key = jax.random.PRNGKey(7)
    # use 32 samples → divides evenly over 8 devices (no padding, so the
    # masked/unmasked paths agree exactly)
    batch = jnp.asarray(windows_sce1[:32], jnp.float32)

    p_single, _, m_single = jax.jit(step)(params, opt_state, key, batch)

    mesh = create_mesh(shape=(8, 1))
    pstep = make_parallel_train_step(step, mesh)
    p_mesh, _, m_mesh = pstep(
        replicate(params, mesh),
        replicate(opt_state, mesh),
        key,
        shard_batch(batch, mesh),
    )
    # every metric component and EVERY param leaf (biases are the one
    # pytree shape class nothing else covers)
    for k in m_single:
        assert np.isclose(float(m_single[k]), float(m_mesh[k]), rtol=1e-5), k
    for name in params:
        for leaf in params[name]:
            assert np.allclose(
                p_single[name][leaf], p_mesh[name][leaf], atol=1e-5
            ), (name, leaf)


def test_tensor_parallel_forward_matches(windows_sce1):
    """Hidden-dim tensor sharding must not change the math."""
    from defensive_model_vae_tpu.models import forward, to_relative

    mesh = create_mesh(shape=(4, 2))
    params = init_params(jax.random.PRNGKey(0), CFG)
    batch = jnp.asarray(windows_sce1[:8], jnp.float32)
    rel, starts = to_relative(batch)
    key = jax.random.PRNGKey(3)

    recon_ref, *_ = forward(params, key, rel, starts, CFG)

    params_tp = tensor_shard_params(params, mesh, hidden_dim=128)
    with mesh:
        recon_tp, *_ = jax.jit(
            lambda p, k, x, c: forward(p, k, x, c, CFG)
        )(params_tp, key, rel, starts)
    assert np.allclose(recon_ref, recon_tp, atol=1e-5)


def test_train_with_mesh(windows_sce1):
    mesh = create_mesh(shape=(8, 1))
    params, hist = train(windows_sce1[:32], train_cfg=TrainConfig(epochs=50), mesh=mesh)
    assert hist["total"][0] / hist["total"][-1] > 2


def test_track_batch_over_mesh_matches(windows_sce1):
    """MPC batch sharded over the mesh data axis == unsharded result."""
    from defensive_model_vae_tpu.control import MPCConfig, track_batch

    cfg = MPCConfig(prediction_horizon=10, control_horizon=5, dt=0.05)
    idxs = [1, 3, 5, 6]
    wps, inits = [], []
    for i in idxs:
        wp = windows_sce1[i][:, [1, 2, 0]].astype(np.float64)
        wp[0, 2] = 0.0
        v0 = (wp[1, :2] - wp[0, :2]) / (wp[1, 2] - wp[0, 2])
        wps.append(wp)
        inits.append([wp[0, 0], wp[0, 1], np.arctan2(v0[1], v0[0]), v0[0], v0[1]])
    wps, inits = np.stack(wps), np.asarray(inits)

    _, states_ref, _, steps = track_batch(wps, inits, cfg)
    mesh = create_mesh(shape=(4, 1))
    _, states_mesh, _, _ = track_batch(wps, inits, cfg, mesh=mesh)
    assert states_mesh.shape == states_ref.shape
    assert np.allclose(states_ref, states_mesh, atol=1e-5)


def test_dnda_sweep_sharded_over_mesh():
    """The batched DNDA SAT sweep shards its frame axis over the mesh
    'data' axis (frames independent, no collectives) and returns indices
    identical to the single-device and host paths."""
    import numpy as np

    from defensive_model_vae_tpu.dnda.core import FramePrep, sweep_frames
    from defensive_model_vae_tpu.parallel import create_mesh

    from conftest import straight_rect_sweep as rect_sweep

    rng = np.random.default_rng(3)
    preps = [
        FramePrep(
            ego_rects=[rect_sweep(60, 0.0), rect_sweep(50, 0.0)],
            usable=[0, 1], unit_arc_paths=[1.0, 1.2], k_maxes=[0.01, 0.02],
            sur_array=np.array(
                [[float(rng.uniform(5, 40)), 0.0, 4.0, 2.0,
                  float(rng.uniform(-2, 2)), 0.0, 0.0, 0.0, 0.0]]
            ),
            ego_speed=float(rng.uniform(4, 12)),
            time_horizon=3.0, time_step=0.1,
        )
        for _ in range(17)
    ]
    host = sweep_frames(preps, device=False)
    mesh = create_mesh()
    sharded = sweep_frames(preps, device=True, mesh=mesh)
    single = sweep_frames(preps, device=True)
    for h, s, d in zip(host, sharded, single):
        assert np.array_equal(h, s) and np.array_equal(h, d)


def test_mesh_training_matches_unpadded_objective(windows_sce1):
    """Mesh padding rows (duplicates of row 0) must be masked out of the
    loss — a 6-row corpus on an 8-device mesh trains the SAME objective as
    the unmeshed full-batch run (review finding: the pad rows previously
    biased every loss mean toward sample 0)."""
    import numpy as np

    from defensive_model_vae_tpu.parallel import create_mesh
    from defensive_model_vae_tpu.train import TrainConfig, train

    w = np.asarray(windows_sce1[:6])  # 6 rows: pads by 2 on 8 devices
    tc = TrainConfig(epochs=20, seed=0)
    _, h_plain = train(w, train_cfg=tc)
    _, h_mesh = train(w, train_cfg=tc, mesh=create_mesh())
    np.testing.assert_allclose(
        h_plain["total"], h_mesh["total"], rtol=1e-5, atol=1e-6
    )


@pytest.mark.slow
def test_serve_fn_sharded_over_mesh_matches():
    """Serving sharded over the mesh 'data' axis (make_serve_fn(mesh=…))
    must reproduce the single-device program exactly — requests are
    independent, so the NamedSharding only changes placement, not math.
    Mirrors the serving section of __graft_entry__.dryrun_multichip."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from defensive_model_vae_tpu.control import MPCConfig, make_serve_fn
    from defensive_model_vae_tpu.models import CVAEConfig, init_params
    from defensive_model_vae_tpu.parallel import create_mesh

    cfg = CVAEConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)
    mcfg = MPCConfig(prediction_horizon=5, control_horizon=3, dt=0.1)
    mesh = create_mesh()
    B = 2 * mesh.devices.size
    rng = np.random.default_rng(3)
    starts = jnp.asarray(rng.normal(0, 1, (B, 2)), jnp.float32)
    inits = jnp.asarray(np.concatenate(
        [rng.normal(0, 1, (B, 3)), np.full((B, 1), 5.0), np.zeros((B, 1))],
        axis=1), jnp.float32)
    key = jax.random.PRNGKey(9)

    st_sh, ct_sh = make_serve_fn(params, cfg, mcfg, num_steps=6, mesh=mesh)(
        key, starts, inits)
    st_si, ct_si = make_serve_fn(params, cfg, mcfg, num_steps=6)(
        key, starts, inits)
    assert np.all(np.isfinite(np.asarray(st_sh)))
    np.testing.assert_allclose(np.asarray(st_sh), np.asarray(st_si), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ct_sh), np.asarray(ct_si), atol=1e-5)
