"""Persistent HTTP serving tests (``serving.py``).

The serve PROGRAM's math is covered by ``test_cli_serve`` and the
multichip dryrun; these tests pin the endpoint semantics around it:
static-batch padding, seed handling, request validation, and that the
HTTP path returns exactly what a direct ``serve_fn`` call returns.
"""

import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from conftest import REPO_ROOT

from defensive_model_vae_tpu.control import MPCConfig
from defensive_model_vae_tpu.control.device_reference import make_serve_fn
from defensive_model_vae_tpu.models import CVAEConfig, init_params
from defensive_model_vae_tpu.serving import _parse_requests, make_http_server

BATCH, STEPS = 4, 6


@pytest.fixture(scope="module")
def served():
    cfg = CVAEConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)
    mpc = MPCConfig(prediction_horizon=5, control_horizon=3, dt=0.1)
    serve_fn = make_serve_fn(params, cfg, mpc, num_steps=STEPS)
    server = make_http_server(serve_fn, BATCH, STEPS)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield server, serve_fn
    server.shutdown()
    server.server_close()
    t.join(timeout=10)


def _call(server, payload=None, path="/serve", method="POST"):
    host, port = server.server_address[:2]
    data = None if payload is None else json.dumps(payload).encode()
    req = urllib.request.Request(
        f"http://{host}:{port}{path}", data=data, method=method,
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.mark.slow
def test_healthz(served):
    server, _ = served
    code, body = _call(server, path="/healthz", method="GET")
    assert code == 200
    assert {k: body[k] for k in ("ok", "batch", "steps", "models")} == {
        "ok": True, "batch": BATCH, "steps": STEPS, "models": ["default"],
    }
    # request counters: a served request bumps 'served' and stamps last_ms
    before = body["served"]
    code, _ = _call(
        server, {"requests": [{"start_x": 0.0, "start_y": 0.0}], "seed": 1}
    )
    assert code == 200
    _, body2 = _call(server, path="/healthz", method="GET")
    assert body2["served"] == before + 1
    assert body2["last_ms"] is not None and body2["last_ms"] >= 0
    # 4xx refusals must be visible to monitoring, not an idle-looking
    # server
    rej = body2["rejected"]
    code, _ = _call(server, {"requests": []})
    assert code == 400
    _, body3 = _call(server, path="/healthz", method="GET")
    assert body3["rejected"] == rej + 1 and body3["served"] == before + 1


def test_serve_matches_direct_call_and_pads(served):
    server, serve_fn = served
    rows = [
        {"start_x": -193.3, "start_y": 50.0},
        {"start_x": -192.8, "start_y": 42.0, "heading": 1.5, "vy": 8.0},
    ]
    code, body = _call(server, {"requests": rows, "seed": 7})
    assert code == 200 and body["seed"] == 7 and body["n"] == 2
    states = np.asarray(body["states"], np.float32)
    controls = np.asarray(body["controls"], np.float32)
    assert states.shape == (2, STEPS + 1, 4)
    assert controls.shape == (2, STEPS, 2)
    assert np.all(np.isfinite(states)) and np.all(np.isfinite(controls))

    # the HTTP path is a pure transport: same arrays as calling the
    # compiled program directly on the padded batch
    starts, inits, k = _parse_requests(rows, BATCH)
    d_states, d_controls = serve_fn(jax.random.PRNGKey(7), starts, inits)
    np.testing.assert_allclose(states, np.asarray(d_states)[:k], atol=1e-6)
    np.testing.assert_allclose(controls, np.asarray(d_controls)[:k], atol=1e-6)

    # padding rows must not perturb real rows: the same first request
    # alone (3 pad rows) reproduces row 0 of the 2-request call exactly
    code1, body1 = _call(server, {"requests": rows[:1], "seed": 7})
    assert code1 == 200 and body1["n"] == 1
    np.testing.assert_array_equal(
        np.asarray(body1["states"][0]), np.asarray(body["states"][0])
    )


@pytest.mark.slow
def test_generate_route(tmp_path):
    """POST /generate returns raw sampled trajectories (no MPC) matching a
    direct call of the same jitted sampler; servers built without
    generate_fns answer 501."""
    from defensive_model_vae_tpu.serving import (
        build_generate_fn, serve_checkpoint,
    )
    from defensive_model_vae_tpu.train.checkpoint import save_checkpoint

    cfg = CVAEConfig()
    d = save_checkpoint(
        str(tmp_path / "ck"), init_params(jax.random.PRNGKey(5), cfg),
        cfg, "sce1",
    )
    server = serve_checkpoint(d, batch=4, num_steps=4, dt=0.1, warm_seed=1)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        rows = [{"start_x": -193.3, "start_y": 50.0},
                {"start_x": -192.8, "start_y": 42.0}]
        code, body = _call(server, {"requests": rows, "seed": 9},
                           path="/generate")
        assert code == 200 and body["n"] == 2
        trajs = np.asarray(body["trajectories"], np.float32)
        assert trajs.shape == (2, cfg.seq_len, cfg.dim)
        assert np.all(np.isfinite(trajs))

        starts, _, k = _parse_requests(rows, 4)
        direct = build_generate_fn(d)(jax.random.PRNGKey(9), starts)
        np.testing.assert_allclose(trajs, np.asarray(direct)[:k], atol=1e-6)

        # /generate speaks the binary npz format too
        import io
        import urllib.request as _ur

        host, port = server.server_address[:2]
        req = _ur.Request(
            f"http://{host}:{port}/generate",
            data=json.dumps(
                {"requests": rows, "seed": 9, "format": "npz"}
            ).encode(),
        )
        with _ur.urlopen(req, timeout=300) as r:
            z = np.load(io.BytesIO(r.read()))
        np.testing.assert_array_equal(z["trajectories"], trajs)
    finally:
        server.shutdown()
        server.server_close()
        t.join(timeout=10)


def test_npz_response_format(served):
    """'format': 'npz' returns a binary np.savez payload carrying the same
    arrays as the JSON path — the bulk-consumer route (a batch-512 JSON
    response is ~20 MB of number formatting)."""
    import io

    server, _ = served
    rows = [{"start_x": -193.3, "start_y": 50.0},
            {"start_x": -192.8, "start_y": 42.0}]
    _, jbody = _call(server, {"requests": rows, "seed": 11})

    host, port = server.server_address[:2]
    req = urllib.request.Request(
        f"http://{host}:{port}/serve",
        data=json.dumps(
            {"requests": rows, "seed": 11, "format": "npz"}
        ).encode(),
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        assert r.headers["Content-Type"] == "application/octet-stream"
        z = np.load(io.BytesIO(r.read()))
    assert str(z["model"]) == "default" and int(z["seed"]) == 11
    assert int(z["n"]) == 2 and z["invalid"].size == 0
    np.testing.assert_array_equal(
        z["states"], np.asarray(jbody["states"], np.float32)
    )
    np.testing.assert_array_equal(
        z["controls"], np.asarray(jbody["controls"], np.float32)
    )

    code, body = _call(server, {"requests": rows, "format": "csv"})
    assert code == 400 and "unknown format" in body["error"]


def test_generate_sharded_matches_single(tmp_path):
    """--data-parallel must shard /generate like /serve: the mesh-built
    sampler returns exactly the single-device results (requests are
    independent — sharding cannot change the math)."""
    from defensive_model_vae_tpu.parallel import create_mesh
    from defensive_model_vae_tpu.serving import build_generate_fn
    from defensive_model_vae_tpu.train.checkpoint import save_checkpoint

    cfg = CVAEConfig()
    d = save_checkpoint(
        str(tmp_path / "ck"), init_params(jax.random.PRNGKey(6), cfg),
        cfg, "sce1",
    )
    mesh = create_mesh()  # all 8 virtual devices on the data axis
    gen_sh = build_generate_fn(d, mesh=mesh)
    gen_si = build_generate_fn(d)
    starts = np.random.default_rng(0).normal(
        [-193.0, 45.0], 2.0, (8, 2)
    ).astype(np.float32)
    key = jax.random.PRNGKey(3)
    # same band as the dryrun's sharded-vs-single serve assertion: the
    # partitioned matmuls reduce in a different order (~1 ulp drift)
    np.testing.assert_allclose(
        np.asarray(gen_sh(key, starts)), np.asarray(gen_si(key, starts)),
        atol=1e-5,
    )


def test_generate_route_absent_is_501(served):
    server, _ = served  # built via make_http_server without generate_fns
    code, body = _call(
        server, {"requests": [{"start_x": 0.0, "start_y": 0.0}]},
        path="/generate",
    )
    assert code == 501 and "not configured" in body["error"]


def test_serve_entropy_seed_and_pinned_seed(served):
    server, _ = served
    rows = [{"start_x": -193.3, "start_y": 50.0}]
    _, a = _call(server, {"requests": rows, "seed": 3})
    _, b = _call(server, {"requests": rows, "seed": 3})
    assert a["states"] == b["states"]  # pinned seed → reproducible
    _, c = _call(server, {"requests": rows})
    _, d = _call(server, {"requests": rows})
    assert c["seed"] != d["seed"]  # entropy default → fresh draws


@pytest.mark.slow
def test_multi_model_routing(tmp_path):
    """One warm endpoint hosts several models: requests route by 'model',
    each model returns its own weights' trajectories, and the field is
    required (no silent default) when several are served."""
    from defensive_model_vae_tpu.serving import serve_checkpoint
    from defensive_model_vae_tpu.train.checkpoint import save_checkpoint

    cfg = CVAEConfig()
    dirs = {}
    for i, name in enumerate(["sce1", "sce2"]):
        dirs[name] = save_checkpoint(
            str(tmp_path / name), init_params(jax.random.PRNGKey(i), cfg),
            cfg, name,
        )
    server = serve_checkpoint(dirs, batch=2, num_steps=4, dt=0.1, warm_seed=1)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        code, body = _call(server, path="/healthz", method="GET")
        assert code == 200 and body["models"] == ["sce1", "sce2"]

        rows = [{"start_x": -193.3, "start_y": 50.0}]
        _, a = _call(server, {"requests": rows, "seed": 3, "model": "sce1"})
        _, b = _call(server, {"requests": rows, "seed": 3, "model": "sce2"})
        assert a["model"] == "sce1" and b["model"] == "sce2"
        # different weights, same seed → different trajectories
        assert a["states"] != b["states"]

        code, body = _call(server, {"requests": rows, "seed": 3})
        assert code == 400 and "'model' is required" in body["error"]
        code, body = _call(
            server, {"requests": rows, "seed": 3, "model": "sce9"}
        )
        assert code == 400 and "unknown model" in body["error"]
    finally:
        server.shutdown()
        server.server_close()
        t.join(timeout=10)


def test_diverged_rows_are_nulled_per_row():
    """A diverged solve must surface as a null row + its index in
    'invalid' — never bare NaN/Infinity tokens (strict JSON), and never
    poisoning independent batchmates."""

    def half_bad_serve(key, starts, inits):
        states = np.ones((BATCH, STEPS + 1, 4), np.float32)
        states[1] = np.nan  # only padded-batch row 1 diverges
        return states, np.zeros((BATCH, STEPS, 2), np.float32)

    server = make_http_server(half_bad_serve, BATCH, STEPS)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        rows = [{"start_x": 0.0, "start_y": 0.0}] * 3
        code, body = _call(server, {"requests": rows, "seed": 1})
        assert code == 200
        assert body["invalid"] == [1]
        assert body["states"][1] is None and body["controls"][1] is None
        for i in (0, 2):  # batchmates unaffected
            assert np.asarray(body["states"][i]).shape == (STEPS + 1, 4)
        # strict JSON: the raw response text carries no NaN/Infinity
        # tokens (json.dumps(allow_nan=False) would have raised a 500)
    finally:
        server.shutdown()
        server.server_close()
        t.join(timeout=10)


def test_conv_checkpoint_rejected_at_the_boundary(tmp_path):
    """MLP-only consumers must reject a Conv1D checkpoint with the reason,
    not crash mid-jit-trace with KeyError 'cond_0'."""
    import jax

    from defensive_model_vae_tpu.generate import load_and_generate
    from defensive_model_vae_tpu.models import ConvCVAEConfig, init_conv_params
    from defensive_model_vae_tpu.serving import build_serve_fn
    from defensive_model_vae_tpu.train.checkpoint import save_checkpoint

    ccfg = ConvCVAEConfig(seq_len=20, dim=2)
    d = save_checkpoint(
        str(tmp_path / "conv"), init_conv_params(jax.random.PRNGKey(0), ccfg),
        ccfg, None,
    )
    with pytest.raises(TypeError, match="MLP CVAE family only"):
        build_serve_fn(d, num_steps=4, dt=0.1)
    with pytest.raises(TypeError, match="MLP CVAE family only"):
        load_and_generate(d, 0.0, 0.0)


@pytest.mark.slow
def test_serve_client_example(tmp_path):
    """examples/serve_client.py works against a live endpoint exactly as
    its docstring promises (stdlib-only client, healthz + /serve)."""
    import subprocess
    import sys

    from defensive_model_vae_tpu.serving import serve_checkpoint
    from defensive_model_vae_tpu.train.checkpoint import save_checkpoint

    cfg = CVAEConfig()
    d = save_checkpoint(
        str(tmp_path / "ck"), init_params(jax.random.PRNGKey(2), cfg),
        cfg, "sce1",
    )
    server = serve_checkpoint(d, batch=2, num_steps=4, dt=0.1, warm_seed=1)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        _, port = server.server_address[:2]
        out = subprocess.run(
            [sys.executable,
             str(REPO_ROOT / "examples" / "serve_client.py"),
             "--port", str(port), "--start", "-193.3", "50.0",
             "--seed", "7"],
            capture_output=True, text=True, timeout=120,
        )
        assert out.returncode == 0, out.stderr
        assert "batch 2, 4 MPC steps" in out.stdout
        assert "seed 7: 1 trajectories" in out.stdout
        assert "final speed" in out.stdout

        gen = subprocess.run(
            [sys.executable,
             str(REPO_ROOT / "examples" / "serve_client.py"),
             "--port", str(port), "--start", "-193.3", "50.0",
             "--seed", "7", "--generate"],
            capture_output=True, text=True, timeout=120,
        )
        assert gen.returncode == 0, gen.stderr
        assert "via /generate" in gen.stdout and "waypoints" in gen.stdout
    finally:
        server.shutdown()
        server.server_close()
        t.join(timeout=10)


@pytest.mark.slow
def test_serve_checkpoint_end_to_end(tmp_path):
    """The --listen CLI path: checkpoint → warmed program → live endpoint
    (manifest offset_mode honored via make_serve_fn, same as one-shot)."""
    from defensive_model_vae_tpu.serving import serve_checkpoint
    from defensive_model_vae_tpu.train.checkpoint import save_checkpoint

    cfg = CVAEConfig()
    d = save_checkpoint(
        str(tmp_path / "ck"), init_params(jax.random.PRNGKey(1), cfg),
        cfg, "sce1",
    )
    server = serve_checkpoint(d, batch=2, num_steps=4, dt=0.1, warm_seed=1)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        code, body = _call(server, path="/healthz", method="GET")
        assert code == 200 and body["batch"] == 2 and body["steps"] == 4
        code, body = _call(
            server,
            {"requests": [{"start_x": -193.3, "start_y": 50.0}], "seed": 2},
        )
        assert code == 200
        assert np.asarray(body["states"]).shape == (1, 5, 4)
    finally:
        server.shutdown()
        server.server_close()
        t.join(timeout=10)


def test_serve_request_validation(served):
    server, _ = served
    over = [{"start_x": 0.0, "start_y": 0.0}] * (BATCH + 1)
    code, body = _call(server, {"requests": over})
    assert code == 400 and "exceed the compiled batch" in body["error"]

    code, body = _call(server, {"requests": [{"start_y": 1.0}]})
    assert code == 400 and "start_x" in body["error"]

    # non-finite inputs would poison the padded batch and emit non-strict
    # JSON (Infinity tokens) — rejected up front
    code, body = _call(
        server, {"requests": [{"start_x": float("nan"), "start_y": 0.0}]}
    )
    assert code == 400 and "finite" in body["error"]
    code, body = _call(
        server, {"requests": [{"start_x": 0.0, "start_y": 0.0, "vy": 1e999}]}
    )
    assert code == 400 and "finite" in body["error"]

    # float64-finite but float32-infinite must also be rejected (the
    # program computes in f32; 1e200 would overflow to inf after the cast)
    code, body = _call(
        server, {"requests": [{"start_x": 1e200, "start_y": 0.0}]}
    )
    assert code == 400 and "finite" in body["error"]

    # out-of-range seed → 400, not a dropped connection; the bound is the
    # x32 PRNGKey's 32 bits (wider seeds would silently alias mod 2**32)
    ok = [{"start_x": 0.0, "start_y": 0.0}]
    for bad_seed in (1 << 64, 1 << 32, -1):
        code, body = _call(server, {"requests": ok, "seed": bad_seed})
        assert code == 400 and "seed" in body["error"]

    # non-dict JSON body → 400, not a dropped connection
    code, body = _call(server, [1, 2, 3])
    assert code == 400 and "JSON object" in body["error"]
    code, body = _call(server, "just a string")
    assert code == 400 and "JSON object" in body["error"]

    code, body = _call(server, {"requests": []})
    assert code == 400

    code, body = _call(server, {})
    assert code == 400

    code, body = _call(server, {"requests": over[:1]}, path="/nope")
    assert code == 404
    code, body = _call(server, path="/nope", method="GET")
    assert code == 404
