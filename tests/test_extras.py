"""Tests for resume, conditioned training, long-window Conv VAE training,
THW analysis, and observability utilities."""

import json

import jax
import numpy as np
import optax
import pytest

from defensive_model_vae_tpu.data.features import (
    build_conditioned_corpus,
    window_start_speed,
    window_thw,
)
from defensive_model_vae_tpu.data import generate_random_trajectories
from defensive_model_vae_tpu.models import CVAEConfig
from defensive_model_vae_tpu.train import (
    TrainConfig,
    load_opt_state,
    save_checkpoint,
    save_opt_state,
    train,
    train_conditioned,
)
from defensive_model_vae_tpu.utils import MetricWriter, StageTimer

from conftest import REFERENCE_ROOT, REPO_ROOT, requires_reference


@pytest.mark.slow
def test_resume_matches_continuous_run(all_windows):
    """Train 100 then resume 100 with ``start_epoch=100`` ≡ train 200
    straight, BIT-EXACTLY: the per-epoch noise folds the global epoch
    index, so the chunked run consumes the same stream as the continuous
    one (without the offset a resumed chunk would replay chunk 1's
    noise — also asserted)."""
    w = all_windows["sce2"]
    p_full, h_full = train(w, train_cfg=TrainConfig(epochs=200))
    p1, h1, s1 = train(w, train_cfg=TrainConfig(epochs=100), return_state=True)
    p2, h2 = train(
        w, train_cfg=TrainConfig(epochs=100), init_state=(p1, s1),
        start_epoch=100,
    )
    for name in p_full:
        for leaf in p_full[name]:
            assert np.array_equal(p_full[name][leaf], p2[name][leaf]), (name, leaf)
    assert np.array_equal(h_full["total"][100:], h2["total"])

    # the replay hazard the offset exists to avoid: resuming WITHOUT it
    # re-draws chunk 1's noise stream, so epoch 100's metrics differ
    _, h_replay = train(
        w, train_cfg=TrainConfig(epochs=100), init_state=(p1, s1)
    )
    assert not np.array_equal(h_replay["total"], h2["total"])
    assert h2["total"][0] < h1["total"][0] / 2  # resumes low, not from scratch


def test_opt_state_roundtrip(tmp_path, all_windows):
    w = all_windows["sce2"]
    params, hist, state = train(
        w, train_cfg=TrainConfig(epochs=20), return_state=True
    )
    d = save_checkpoint(str(tmp_path / "c"), params, CVAEConfig(), "sce2", hist)
    save_opt_state(d, state)
    optimizer = optax.adam(1e-3)
    state2 = load_opt_state(d, params, optimizer)
    assert int(state2[0].count) == int(state[0].count) == 20
    # EVERY Adam leaf: mu and nu, weights and biases (a dropped/zeroed nu
    # would corrupt the first resumed step while mu-only checks pass)
    for moment in ("mu", "nu"):
        a, b = getattr(state[0], moment), getattr(state2[0], moment)
        for name in params:
            for leaf in params[name]:
                assert np.allclose(a[name][leaf], b[name][leaf]), (moment, name, leaf)


def test_conditioned_corpus_and_training(all_windows):
    corpus, extra = build_conditioned_corpus(
        {k: all_windows[k][:10] for k in ("sce1", "sce2")}
    )
    assert corpus.shape[0] == 20 and extra.shape == (20, 5)
    # one-hots are exclusive AND scenario-correct: sce1 -> column 0,
    # sce2 -> column 1 (keys sorted; a same-column mapping bug would still
    # pass a sum==1 check)
    assert np.all(extra[:, :4].sum(axis=1) == 1.0)
    assert np.all(extra[:10, 0] == 1.0) and np.all(extra[10:, 1] == 1.0)
    assert np.all(extra[:, 4] > 0)
    params, hist, cfg = train_conditioned(corpus, extra, TrainConfig(epochs=150))
    assert cfg.cond_dim == 7
    assert hist["total"][-1] < hist["total"][0] / 3


@requires_reference
def test_conditioned_corpus_honors_sce4_trial_suffix(all_windows):
    """sce4's THW distance depends on the source trial suffix (40 m for
    '_3' trials, else 30 m — Get_THW.py:72-82); window_trial_suffixes
    aligns row-for-row with build_dataset's enumeration so the conditioned
    corpus honors it."""
    from defensive_model_vae_tpu.data import build_dataset
    from defensive_model_vae_tpu.data.features import (
        build_conditioned_corpus, window_thw, window_trial_suffixes,
    )

    root = str(REFERENCE_ROOT / "DefensiveData")
    w4 = build_dataset(root, "sce4")
    suf = window_trial_suffixes(root, "sce4")
    assert len(suf) == len(w4)
    assert {"1", "2", "3"} >= set(suf) and "3" in suf

    _, extra = build_conditioned_corpus(
        {"sce4": w4}, suffixes_by_scenario={"sce4": suf}
    )
    # spot-check: suffix-'3' rows used 40 m, others 30 m
    i3 = suf.index("3")
    i_other = next(i for i, s in enumerate(suf) if s != "3")
    assert np.isclose(extra[i3, -1], window_thw(w4[i3], "sce4", "3"))
    assert np.isclose(extra[i_other, -1], window_thw(w4[i_other], "sce4", suf[i_other]))
    v3 = np.hypot(*(w4[i3, 1, 1:3] - w4[i3, 0, 1:3])) / (w4[i3, 1, 0] - w4[i3, 0, 0])
    assert np.isclose(extra[i3, -1], 40.0 / v3, rtol=1e-5)


@pytest.mark.slow
def test_conv_vae_trains_on_long_windows():
    """BASELINE config 3: Conv1D VAE over 50-point random-walk windows."""
    import jax.numpy as jnp
    import optax as ox

    from defensive_model_vae_tpu.models import (
        ConvCVAEConfig,
        conv_forward,
        init_conv_params,
    )

    trajs = generate_random_trajectories(64, 50, 5.0, seed=0).astype(np.float32)
    cfg = ConvCVAEConfig(seq_len=50, dim=2)
    params = init_conv_params(jax.random.PRNGKey(0), cfg)
    opt = ox.adam(1e-3)
    state = opt.init(params)
    x = jnp.asarray(trajs)
    cond = x[:, 0, :]

    def loss_fn(p, key):
        recon, mu, lv, _ = conv_forward(p, key, x, cond, cfg)
        return jnp.mean((recon - x) ** 2) - 0.05 * jnp.mean(
            1 + lv - mu**2 - jnp.exp(lv)
        )

    @jax.jit
    def step(p, s, key):
        l, g = jax.value_and_grad(loss_fn)(p, key)
        u, s = opt.update(g, s)
        return ox.apply_updates(p, u), s, l

    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(120):
        params, state, l = step(params, state, jax.random.fold_in(key, i))
        losses.append(float(l))
    assert losses[-1] < losses[0] / 3


def test_window_thw():
    w = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 10.0]] + [[2.0 + i, 0, 10]
                 for i in range(8)])
    assert np.isclose(window_start_speed(w), 10.0)
    assert np.isclose(window_thw(w, "sce1"), 6.0)  # 60 m / 10 m/s
    assert np.isclose(window_thw(w, "sce4", trial_suffix="3"), 4.0)  # 40 m
    assert np.isclose(window_thw(w, "sce4", trial_suffix="1"), 3.0)  # 30 m


@requires_reference
def test_thw_metrics_on_real_corpus():
    from defensive_model_vae_tpu.data import collect_csv_files
    from defensive_model_vae_tpu.metrics import start_velocities, thw_values

    csvs = collect_csv_files(str(REFERENCE_ROOT / "DefensiveData/StaticBlindTown05"))[:5]
    sv = start_velocities(csvs, "sce1")
    assert len(sv) == 5 and all(v > 0 for _, v in sv)
    thw = thw_values(sv, "sce1")
    assert np.all(np.isfinite(thw)) and np.all(thw > 0)


def test_stage_timer_and_metric_writer(tmp_path):
    timer = StageTimer()
    with timer.stage("a"):
        pass
    with timer.stage("a"):
        pass
    with timer.stage("b"):
        pass
    rep = timer.report()
    assert rep["a"]["calls"] == 2 and rep["b"]["calls"] == 1
    timer.dump(str(tmp_path / "t.json"))
    assert json.load(open(tmp_path / "t.json"))["a"]["calls"] == 2

    mw = MetricWriter(str(tmp_path / "m.jsonl"))
    mw.write("js", 0.11, scenario="sce2")
    mw.write_dict({"a": 1, "b": 2}, run="x")
    recs = mw.read()
    assert len(recs) == 3 and recs[0]["scenario"] == "sce2"


def test_band_stats_golden_and_artifact_consistency(tmp_path):
    """band_stats is the statistic behind every scoreboard CI cell.

    Golden check: for [1,2,3,4,5], mean=3, std=sqrt(2.5), t_{.975,4}=2.776445,
    half-width = 2.776445*sqrt(2.5)/sqrt(5) = 1.963243.  Then verify the
    committed results/validation_multiseed.json cells reconstruct from
    their own stored values via the same formula.
    """
    from defensive_model_vae_tpu.utils import band_stats

    cell = band_stats([1.0, 2.0, 3.0, 4.0, 5.0])
    assert cell["mean"] == 3.0
    assert abs(cell["std"] - np.sqrt(2.5)) < 1e-12
    assert abs(cell["ci95_halfwidth"] - 1.9632432) < 1e-6
    assert cell["ci95"] == [cell["mean"] - cell["ci95_halfwidth"],
                            cell["mean"] + cell["ci95_halfwidth"]]
    # degenerate bands: n=1 has no CI, n=0 has nan mean
    assert "ci95" not in band_stats([7.0]) and band_stats([7.0])["std"] == 0.0
    assert np.isnan(band_stats([])["mean"])

    path = str(REPO_ROOT / "results" / "validation_multiseed.json")
    doc = json.load(open(path))
    checked = 0
    for sce, cells in doc.items():
        if not isinstance(cells, dict):
            continue
        for metric, cell in cells.items():
            if not (isinstance(cell, dict) and "values" in cell):
                continue
            rebuilt = band_stats(cell["values"])
            for k in ("mean", "std", "ci95_halfwidth"):
                assert abs(rebuilt[k] - cell[k]) < 1e-9, (sce, metric, k)
            checked += 1
    assert checked >= 16, f"only {checked} scoreboard cells checked"


@pytest.mark.slow
def test_train_conv_api():
    from defensive_model_vae_tpu.train import train_conv

    trajs = generate_random_trajectories(48, 50, 5.0, seed=2).astype(np.float32)
    params, hist, cfg = train_conv(trajs, train_cfg=TrainConfig(epochs=120))
    assert hist["total"][-1] < hist["total"][0] / 3
    assert cfg.seq_len == 50 and cfg.dim == 2


def test_orbax_checkpoint_backend(tmp_path):
    """Orbax backend roundtrips the same pytree behind the same manifest
    API; load_checkpoint auto-detects the backend (ROADMAP item 4)."""
    import jax

    from defensive_model_vae_tpu.models import CVAEConfig, init_params
    from defensive_model_vae_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    cfg = CVAEConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)
    d = str(tmp_path / "ckpt_orbax")
    save_checkpoint(d, params, cfg, "sce2", backend="orbax")
    restored, cfg2, manifest = load_checkpoint(d)
    assert manifest["backend"] == "orbax" and manifest["scenario"] == "sce2"
    assert cfg2 == cfg
    from defensive_model_vae_tpu.train.checkpoint import _flatten

    flat0, flat1 = _flatten(jax.device_get(params)), _flatten(restored)
    assert set(flat0) == set(flat1)
    for k in flat0:
        np.testing.assert_array_equal(flat0[k], np.asarray(flat1[k]))
    # overwrite in place works (orbax refuses by default; we clear first)
    save_checkpoint(d, params, cfg, "sce2", backend="orbax")


@pytest.mark.slow
def test_conv_train_sample_consistency_nonorigin():
    """conv_sample must return trajectories anchored at the conditioned
    start for corpora that do NOT start at the origin (review finding:
    training on absolute windows + sampling with a start shift
    double-shifted such corpora)."""
    import jax

    from defensive_model_vae_tpu.models import ConvCVAEConfig, conv_sample
    from defensive_model_vae_tpu.train import TrainConfig
    from defensive_model_vae_tpu.train.train import train_conv

    rng = np.random.default_rng(0)
    # random-walk windows translated far from the origin
    steps = rng.normal(0, 1, (40, 30, 2)).cumsum(axis=1)
    w = (steps - steps[:, :1] + np.array([500.0, -300.0])).astype(np.float32)
    params, hist, cfg = train_conv(w, train_cfg=TrainConfig(epochs=300, seed=0))
    assert hist["total"][-1] < hist["total"][0]
    start = np.array([[500.0, -300.0]], np.float32)
    out = np.asarray(conv_sample(params, jax.random.PRNGKey(1), start, cfg))
    # sampled trajectory must begin near the conditioned start point
    assert np.linalg.norm(out[0, 0] - start[0]) < 3.0, out[0, 0]


def test_jsonable_numpy_scalars():
    """np.float32 is NOT a Python float (unlike np.float64): a float-only
    check let it crash json.dumps; NaN float32 must become null and numpy
    ints must serialize."""
    import json

    from defensive_model_vae_tpu.utils.reporting import jsonable

    doc = jsonable({
        "a": np.float32("nan"), "b": np.float32(1.5), "c": np.int64(7),
        "d": float("inf"), "e": [np.float32("-inf"), 2.0],
    })
    assert doc == {"a": None, "b": 1.5, "c": 7, "d": None, "e": [None, 2.0]}
    json.dumps(doc)  # must not raise


def test_jsonable_numpy_bool_and_array():
    """np.bool_ and ndarrays crash json.dumps just like np.float32 did."""
    import json

    from defensive_model_vae_tpu.utils.reporting import jsonable

    doc = jsonable({
        "ok": np.bool_(True),
        "arr": np.array([1.5, np.nan], np.float32),
    })
    assert doc == {"ok": True, "arr": [1.5, None]}
    json.dumps(doc)
