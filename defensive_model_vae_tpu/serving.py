"""Persistent local serving for the deployment path.

The reference has no serving story (every use is a hand-run script); the
framework's one-shot program (``control.device_reference.make_serve_fn``:
condition → sample → reference → MPC, all on device) is here wrapped in a
long-lived local HTTP endpoint so the compiled executable is paid for ONCE
and every request hits a warm program — the deployment shape the one-shot
``defvae serve`` CLI can't provide (a fresh process pays compile + tunnel
warm-up per invocation; see CLAUDE.md).

TPU-idiomatic request handling: the program is compiled at ONE static
batch size and incoming requests are padded up to it (padding rows repeat
the first request; per-request PRNG keys are derived positionally inside
the program, so padding never changes a real row's result).  A request
larger than the compiled batch is rejected with 400 rather than silently
re-compiling — shape churn through the remote-compile tunnel costs minutes
(CLAUDE.md), so the batch is an explicit deployment choice.

One warm process can host SEVERAL models (e.g. all four scenario
checkpoints — ``serve_checkpoint`` accepts a ``{name: ckpt_dir}`` dict,
``defvae serve --listen`` a repeated ``--ckpt NAME=DIR``); each model is
its own compiled executable (params are jit constants at this size) and
requests route by the ``"model"`` field.

Endpoints:

- ``GET /healthz`` → ``{"ok": true, "batch": B, "steps": N,
  "models": [...], "served": n, "rejected": n, "errors": n,
  "last_ms": x}`` (request counters — 2xx / 4xx / 5xx — and the last
  successful request's wall time)
- ``POST /serve`` with ``{"requests": [{"start_x", "start_y",
  "heading"?, "vx"?, "vy"?}, ...], "seed"?: int, "model"?: str}`` →
  ``{"model": str, "seed": int, "n": k, "states": (k, steps+1, 4),
  "controls": (k, steps, 2)}`` — states are ``[x, y, theta, v]`` rows,
  controls ``[accel, steer]``, exactly the arrays the one-shot CLI saves.
  ``"model"`` is optional while serving a single model, required with
  several.
- ``POST /generate`` — same request shape, but returns raw sampled
  ``{"trajectories": (k, T, 3)}`` global [t, x, y] (no MPC chain): the
  high-throughput route for consumers that do their own tracking.

Rows whose solve diverges (a rare entropy draw decoding a degenerate
trajectory — observed once in ~6,000 entropy draws on the sce1
checkpoint) come back as ``null`` with their indices listed in the
response's ``"invalid"`` field; batchmates are unaffected (requests are
independent) and responses stay strict JSON.  Clients retry invalid
rows with a fresh seed.

``"format": "npz"`` in either POST body switches the response to a
binary ``np.savez`` payload (``application/octet-stream``; arrays:
``model``/``seed``/``n``/``invalid`` + the route's output arrays,
loadable with ``np.load(BytesIO(body))``).  A full-batch-512 JSON
response is ~20 MB of number formatting; the binary path is the
high-throughput choice for bulk consumers.  Binary rows are raw f32 —
diverged rows keep their non-finite values (no null masking; that is
what ``invalid`` is for).

The server is single-threaded by design: requests serialize through the
one device anyway, and a single dispatch queue keeps latency honest.
"""

from __future__ import annotations

import json
import secrets
import time
from http.server import BaseHTTPRequestHandler, HTTPServer
from typing import Optional

import numpy as np

# serve request defaults — the CLI's one-shot argparse defaults source
# from here too, so the two paths cannot drift
_DEFAULTS = {"heading": 1.57, "vx": 0.0, "vy": 10.0}
# MPC horizons for the serve program (prediction, control) — shared by the
# one-shot CLI path and serve_checkpoint below
SERVE_HORIZONS = (30, 20)
# request bodies are a few KB of floats; anything near this is abuse
_MAX_BODY_BYTES = 1 << 24


def _parse_requests(rows, batch: int):
    """Validate + pad a request list to the compiled batch size.

    Returns (starts (B, 2) f32, inits (B, 5) f32, k) — rows beyond k are
    copies of row 0 (discarded from the response)."""
    if not isinstance(rows, list) or not rows:
        raise ValueError("'requests' must be a non-empty list")
    if len(rows) > batch:
        raise ValueError(
            f"{len(rows)} requests exceed the compiled batch {batch}; "
            "split the call or restart the server with a larger --batch"
        )
    starts = np.zeros((batch, 2), np.float32)
    inits = np.zeros((batch, 5), np.float32)
    for i, r in enumerate(rows):
        try:
            x, y = float(r["start_x"]), float(r["start_y"])
            extras = [float(r.get(k, v)) for k, v in _DEFAULTS.items()]
        except (KeyError, TypeError, ValueError):
            raise ValueError(
                f"request {i}: 'start_x'/'start_y' (and optional "
                f"{sorted(_DEFAULTS)}) must be numbers"
            ) from None
        # finiteness is checked on the f32 values the program actually
        # sees: a float64-finite 1e200 overflows the cast to inf and would
        # poison the padded batch / emit non-strict JSON all the same
        # (the overflow IS the detection — silence its RuntimeWarning)
        with np.errstate(over="ignore"):
            vals = np.array((x, y, *extras), np.float32)
        if not np.isfinite(vals).all():
            raise ValueError(
                f"request {i}: values must be finite in float32, got "
                f"{[x, y, *extras]}"
            )
        starts[i] = vals[:2]
        inits[i] = vals
    k = len(rows)
    starts[k:] = starts[0]
    inits[k:] = inits[0]
    return starts, inits, k


def make_http_server(
    serve_fns,
    batch: int,
    num_steps: int,
    host: str = "127.0.0.1",
    port: int = 0,
    generate_fns=None,
) -> HTTPServer:
    """Wrap compiled ``serve_fn(key, starts, inits)`` program(s) in an
    HTTPServer.

    ``serve_fns`` is a single callable or a ``{name: callable}`` dict —
    one warm process can host several models (e.g. all four scenario
    checkpoints), routed by the request's ``"model"`` field.  With exactly
    one model the field is optional; with several it is required (no
    silent default between models).

    ``port=0`` binds an ephemeral port (read it back from
    ``server.server_address``).  The caller owns the lifecycle:
    ``serve_forever()`` to run, ``shutdown()`` + ``server_close()`` to stop
    (tests run it on a thread)."""
    import jax

    if callable(serve_fns):
        serve_fns = {"default": serve_fns}
    if not serve_fns:
        raise ValueError("need at least one serve_fn")
    if callable(generate_fns):
        generate_fns = {"default": generate_fns}
    generate_fns = generate_fns or {}
    model_names = sorted(serve_fns)
    # request counters surfaced on /healthz — the server is single-
    # threaded (one handler at a time), so plain dict updates are safe.
    # 'rejected' counts 4xx validation refusals, 'errors' 5xx compute
    # failures: monitoring must see a flood of bad requests, not an
    # idle-looking server
    stats = {"served": 0, "rejected": 0, "errors": 0, "last_ms": None}

    class Handler(BaseHTTPRequestHandler):
        # per-connection socket timeout: a client that stalls mid-body
        # must not wedge the (deliberately single-threaded) server — the
        # read raises, the connection drops, the next request proceeds
        timeout = 30

        # stderr request logging off: the server's stdout/stderr contract
        # is one line per lifecycle event, not per request
        def log_message(self, fmt, *args):  # noqa: D102
            pass

        def _bytes(self, body: bytes) -> None:
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, payload) -> None:
            # every ERROR response passes through here, so the 4xx/5xx
            # counters can't miss a path (the healthz GET itself is not
            # counted; 200s increment 'served' at their call sites —
            # _bytes below is a 200-only success path by construction)
            if code >= 500:
                stats["errors"] += 1
            elif code >= 400:
                stats["rejected"] += 1
            # strict JSON always — non-finite output rows are pre-masked
            # to null below, so allow_nan=False is an invariant check
            body = json.dumps(payload, allow_nan=False).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (http.server API)
            if self.path == "/healthz":
                self._json(
                    200,
                    {"ok": True, "batch": batch, "steps": num_steps,
                     "models": model_names, **stats},
                )
            else:
                self._json(404, {"error": f"unknown path {self.path!r}"})

        def do_POST(self):  # noqa: N802
            if self.path not in ("/serve", "/generate"):
                return self._json(404, {"error": f"unknown path {self.path!r}"})
            try:
                n = int(self.headers.get("Content-Length") or 0)
                if n > _MAX_BODY_BYTES:
                    return self._json(
                        413, {"error": f"body exceeds {_MAX_BODY_BYTES} bytes"}
                    )
                try:
                    raw = self.rfile.read(n)
                except OSError:  # client stalled past the socket timeout
                    self.close_connection = True
                    return
                req = json.loads(raw or b"{}")
                if not isinstance(req, dict):
                    raise ValueError("body must be a JSON object")
                name = req.get("model")
                if name is None:
                    if len(serve_fns) > 1:
                        raise ValueError(
                            f"'model' is required when serving several "
                            f"models: {model_names}"
                        )
                    name = model_names[0]
                if name not in serve_fns:
                    raise ValueError(
                        f"unknown model {name!r}; serving {model_names}"
                    )
                if self.path == "/generate" and name not in generate_fns:
                    return self._json(
                        501,
                        {"error": "generation route not configured for "
                                  f"{name!r} (build the server with "
                                  "generate_fns, e.g. via serve_checkpoint)"},
                    )
                starts, inits, k = _parse_requests(req.get("requests"), batch)
                seed = req.get("seed")
                if seed is None:
                    # entropy default: two identical anonymous requests
                    # should draw fresh trajectories (pass "seed" to pin)
                    seed = secrets.randbelow(1 << 31)
                seed = int(seed)
                # x32 PRNGKey folds the seed to 32 bits — accepting wider
                # values would silently alias pinned seeds mod 2**32
                if not 0 <= seed < 1 << 32:
                    raise ValueError(f"seed {seed} outside [0, 2**32)")
                fmt = req.get("format", "json")
                if fmt not in ("json", "npz"):
                    raise ValueError(f"unknown format {fmt!r} "
                                     "(expected 'json' or 'npz')")
            except (ValueError, TypeError, json.JSONDecodeError) as e:
                return self._json(400, {"error": str(e)})
            t0 = time.perf_counter()
            try:
                key = jax.random.PRNGKey(seed)
                payload = {"model": name, "seed": seed, "n": k}
                if self.path == "/generate":
                    trajs = np.asarray(generate_fns[name](key, starts))[:k]
                    outputs = {"trajectories": trajs}
                else:
                    states, controls = serve_fns[name](key, starts, inits)
                    outputs = {
                        "states": np.asarray(states)[:k],
                        "controls": np.asarray(controls)[:k],
                    }
                # per-ROW divergence masking: requests in a batch are
                # independent, so one degenerate draw (a rare entropy
                # sample whose MPC solve goes non-finite — observed once
                # in ~6,000 draws) must not poison its batchmates.
                # Diverged rows come back as null with their indices in
                # "invalid" (strict JSON — never bare NaN/Infinity
                # tokens); clients retry those rows with a fresh seed.
                bad = np.zeros(k, bool)
                for arr in outputs.values():
                    bad |= ~np.isfinite(arr.reshape(k, -1)).all(axis=1)
                invalid = np.nonzero(bad)[0]
                if fmt == "npz":
                    # binary bulk path: a batch-512 JSON response is
                    # ~20 MB of number formatting; np.savez ships the raw
                    # f32 arrays (diverged rows keep their non-finite
                    # values — 'invalid' marks them)
                    import io

                    bio = io.BytesIO()
                    np.savez(
                        bio, model=name, seed=seed, n=k, invalid=invalid,
                        **outputs,
                    )
                    body = bio.getvalue()
                else:
                    if bad.any():
                        payload["invalid"] = invalid.tolist()
                    for field, arr in outputs.items():
                        payload[field] = [
                            None if b else row.tolist()
                            for row, b in zip(arr, bad)
                        ]
            except Exception as e:  # an unhandled error must come back as
                # a JSON 500, not a dropped connection + stderr traceback
                return self._json(
                    500, {"error": f"{type(e).__name__}: {e}"}
                )
            stats["served"] += 1
            stats["last_ms"] = round(1e3 * (time.perf_counter() - t0), 2)
            if fmt == "npz":
                self._bytes(body)
            else:
                self._json(200, payload)

    return HTTPServer((host, port), Handler)


def _load_for_serving(ckpt_dir: str):
    from .train.checkpoint import load_checkpoint, require_cvae_config

    params, cfg, manifest = load_checkpoint(ckpt_dir)
    require_cvae_config(cfg, "serving")
    return params, cfg, manifest


def _serve_fn_from(params, cfg, manifest, num_steps: int, dt: float,
                   mesh=None):
    from .control import MPCConfig
    from .control.device_reference import make_serve_fn

    P, M = SERVE_HORIZONS
    mpc = MPCConfig(prediction_horizon=P, control_horizon=M, dt=dt)
    return make_serve_fn(
        params, cfg, mpc, num_steps=num_steps,
        offset_mode=manifest.get("offset_mode", True), mesh=mesh,
    )


def _generate_fn_from(params, cfg, manifest, mesh=None):
    import jax

    from .generate import _sample_jit

    shift = manifest.get("offset_mode", True)
    if mesh is None:
        # params threaded as an argument → all models share one compiled
        # sampler executable per (cfg, shift)
        return lambda key, starts: _sample_jit(params, key, starts, cfg,
                                               shift)

    # shard the request batch over the mesh 'data' axis like the serve
    # program does — requests are independent, so sharding cannot change
    # the math (asserted in tests); params and the key are replicated
    from jax.sharding import NamedSharding, PartitionSpec

    data = NamedSharding(mesh, PartitionSpec("data"))
    repl = NamedSharding(mesh, PartitionSpec())
    return jax.jit(
        lambda key, starts: _sample_jit(params, key, starts, cfg, shift),
        in_shardings=(repl, data),
        out_shardings=data,
    )


def build_serve_fn(ckpt_dir: str, num_steps: int, dt: float, mesh=None):
    """Checkpoint → compiled serve program (the ONE construction shared by
    the one-shot CLI and the HTTP server, so horizons / offset-mode
    handling cannot drift between the two paths)."""
    return _serve_fn_from(*_load_for_serving(ckpt_dir), num_steps, dt,
                          mesh=mesh)


def build_generate_fn(ckpt_dir: str, mesh=None):
    """Checkpoint → jitted batched sampler ``gen(key, starts) → (B, T, D)``
    global [t, x, y] trajectories (no MPC chain).  Honors the manifest's
    ``offset_mode`` exactly like ``generate.load_and_generate``; ``mesh``
    shards the request batch over the ``data`` axis like the serve
    program."""
    return _generate_fn_from(*_load_for_serving(ckpt_dir), mesh=mesh)


def serve_checkpoint(
    ckpt,
    batch: int,
    num_steps: int,
    dt: float = 0.02,
    host: str = "127.0.0.1",
    port: int = 0,
    mesh=None,
    warm_seed: Optional[int] = None,
) -> HTTPServer:
    """Build + WARM serve program(s) for checkpoint(s), return the server.

    ``ckpt`` is a checkpoint directory, or a ``{name: directory}`` dict to
    host several models (each its own compiled executable) behind one
    endpoint.  Every model gets a warm-up call (entropy-seeded unless
    ``warm_seed`` pins it) that absorbs compile + executable load before
    the first request arrives, so request latency is steady-state from
    request one."""
    import jax

    if not isinstance(ckpt, dict):
        ckpt = {"default": str(ckpt)}
    starts = np.zeros((batch, 2), np.float32)
    inits = np.tile(
        np.array([[0.0, 0.0, _DEFAULTS["heading"], 0.0, _DEFAULTS["vy"]]],
                 np.float32),
        (batch, 1),
    )
    if warm_seed is None:
        warm_seed = secrets.randbelow(1 << 31)
    serve_fns = {}
    generate_fns = {}
    for name, d in ckpt.items():
        loaded = _load_for_serving(str(d))  # ONE disk load per model
        fn = _serve_fn_from(*loaded, num_steps, dt, mesh=mesh)
        # warm-up must FETCH, not block_until_ready: block is not a
        # reliable completion barrier on the tunnel (CLAUDE.md hazard
        # (3)), and a warm-up that returns before the executable load
        # finishes would charge the load to the first real request.  A
        # tiny last-row slice keeps the fetch to one small RPC.
        out = fn(jax.random.PRNGKey(warm_seed), starts, inits)
        np.asarray(jax.tree_util.tree_leaves(out)[-1][-1])
        serve_fns[name] = fn
        gen = _generate_fn_from(*loaded, mesh=mesh)
        np.asarray(gen(jax.random.PRNGKey(warm_seed), starts)[-1])
        generate_fns[name] = gen
    return make_http_server(
        serve_fns, batch, num_steps, host=host, port=port,
        generate_fns=generate_fns,
    )
