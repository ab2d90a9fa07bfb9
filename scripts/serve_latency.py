"""Measure warm HTTP serving latency (``results/serve_latency.json``).

Stands up the persistent endpoint (``serving.serve_checkpoint`` — the
``defvae serve --listen`` path) on a committed checkpoint at the
production config (512-step MPC horizon, batch 1) and times real POST
requests against it, so the PARITY serving row's "steady-state request
latency is the device latency" claim is measured, not inferred.

Methodology (CLAUDE.md measurement hazards): ONE process (the per-process
tunnel warm-up lands on serve_checkpoint's warm-up call, not on timed
requests); every request omits ``seed`` so the server draws OS-entropy
seeds — the PRNG key is a program input, so no timed call repeats an
(inputs, executable) pair the tunnel could elide.  The server-side
handler time (``/healthz``'s ``last_ms``) is recorded beside the client
wall time, so the HTTP+JSON overhead is auditable as their difference.

Usage:
    python scripts/serve_latency.py [--out results/serve_latency.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _post(base: str, path: str, payload: dict, timeout: float = 600.0):
    """POST and PARSE the response (json.loads or np.load by the payload's
    'format') — parsing stays inside every timed window so the JSON and
    npz measurements are like-for-like end-to-end costs."""
    req = urllib.request.Request(
        f"{base}{path}", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        body = r.read()
    if payload.get("format") == "npz":
        import io

        import numpy as np

        z = np.load(io.BytesIO(body))
        return {"invalid": z["invalid"].tolist(), "n": int(z["n"])}
    return json.loads(body)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/serve_latency.json")
    ap.add_argument("--ckpt", default="results/checkpoints/sce1")
    ap.add_argument("--steps", type=int, default=512)
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--throughput-batch", type=int, default=0,
                    help="also measure full-batch /serve throughput at "
                         "this compiled batch (0 = skip; compiles a "
                         "second program)")
    ap.add_argument("--concurrency", type=int, default=8,
                    help="client threads for the tail-latency phase "
                         "(0 = skip)")
    ap.add_argument("--load-requests", type=int, default=25,
                    help="requests per client thread in the tail phase")
    args = ap.parse_args()

    from defensive_model_vae_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax

    from defensive_model_vae_tpu.pipeline import _git_sha
    from defensive_model_vae_tpu.serving import serve_checkpoint

    t0 = time.perf_counter()
    server = serve_checkpoint(args.ckpt, batch=1, num_steps=args.steps,
                              dt=0.02)
    startup_s = time.perf_counter() - t0
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address[:2]
    base = f"http://{host}:{port}"

    # a plausible sce1 start (southbound corridor, ~8 m/s) — the timing is
    # shape-bound, not value-bound, but keep the request realistic
    rows = [{"start_x": -194.2, "start_y": 41.0, "heading": 1.57,
             "vx": 0.0, "vy": 8.0}]

    diverged = {"rows": 0, "requests": 0}

    def _counting_post(b, path, payload):
        # a rare entropy draw decodes a degenerate trajectory whose MPC
        # solve goes non-finite; the endpoint nulls those ROWS (listing
        # them in 'invalid') so batchmates survive — count them here so
        # the evidence discloses the observed divergence rate
        t = time.perf_counter()
        body = _post(b, path, payload)
        diverged["rows"] += len(body.get("invalid", []))
        diverged["requests"] += body["n"]
        return 1e3 * (time.perf_counter() - t)

    def _timed(path):
        client_ms, server_ms = [], []
        for _ in range(args.reps):
            # no seed → entropy draw server-side
            client_ms.append(_counting_post(base, path, {"requests": rows}))
            with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
                server_ms.append(json.loads(r.read())["last_ms"])
        return client_ms, server_ms

    serve_client, serve_server = _timed("/serve")
    gen_client, gen_server = _timed("/generate")

    # tail latency under concurrent load (VERDICT r04 item 8): the endpoint
    # is a single-threaded HTTPServer over one device, so N concurrent
    # clients serialize through the accept queue — p95/p99 here measure the
    # honest queueing tail a multi-client deployment would see, not device
    # jitter.  Entropy seeds server-side as above (no identical repeats).
    tail = None
    if args.concurrency > 0:
        lat_ms: list = []
        errors = {"n": 0}
        lock = threading.Lock()

        def _client():
            for _ in range(args.load_requests):
                t = time.perf_counter()
                try:
                    body = _post(base, "/serve", {"requests": rows})
                except Exception:
                    with lock:
                        errors["n"] += 1
                    continue
                dt = 1e3 * (time.perf_counter() - t)
                with lock:
                    lat_ms.append(dt)
                    diverged["rows"] += len(body.get("invalid", []))
                    diverged["requests"] += body["n"]

        threads = [threading.Thread(target=_client)
                   for _ in range(args.concurrency)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        qs = statistics.quantiles(lat_ms, n=100, method="inclusive")
        tail = {
            "concurrency": args.concurrency,
            "requests": len(lat_ms),
            "errors": errors["n"],
            "p50_ms": round(statistics.median(lat_ms), 1),
            "p95_ms": round(qs[94], 1),
            "p99_ms": round(qs[98], 1),
            "max_ms": round(max(lat_ms), 1),
            "req_per_s": round(len(lat_ms) / wall, 1),
        }

    server.shutdown()
    server.server_close()
    thread.join(timeout=10)

    throughput = None
    if args.throughput_batch:
        B = args.throughput_batch
        srv2 = serve_checkpoint(args.ckpt, batch=B, num_steps=args.steps,
                                dt=0.02)
        th2 = threading.Thread(target=srv2.serve_forever, daemon=True)
        th2.start()
        h2, p2 = srv2.server_address[:2]
        base2 = f"http://{h2}:{p2}"
        batch_rows = rows * B
        reqs_s = []
        for _ in range(3):
            ms = _counting_post(base2, "/serve", {"requests": batch_rows})
            reqs_s.append(B / (ms / 1e3))
        # the binary response path (format=npz) skips the ~40 KB/request
        # JSON formatting/parsing — the bulk-consumer throughput number.
        # Same counted path as the JSON loop: divergence disclosure and
        # client-side parse are included either way (like-for-like)
        npz_reqs_s = []
        for _ in range(3):
            ms = _counting_post(
                base2, "/serve", {"requests": batch_rows, "format": "npz"}
            )
            npz_reqs_s.append(B / (ms / 1e3))
        throughput = {
            "batch": B,
            "req_per_s_best": round(max(reqs_s), 1),
            "req_per_s_median": round(statistics.median(reqs_s), 1),
            "npz_req_per_s_best": round(max(npz_reqs_s), 1),
            "npz_req_per_s_median": round(statistics.median(npz_reqs_s), 1),
        }
        srv2.shutdown()
        srv2.server_close()
        th2.join(timeout=10)

    def _stats(client, srv):
        # overhead is the median of PER-REQUEST (client − server) pairs,
        # not a difference of medians (which a single skewed rep on one
        # side would misstate)
        overhead = [c - s for c, s in zip(client, srv)]
        return {
            "client_ms_median": round(statistics.median(client), 1),
            "client_ms_min": round(min(client), 1),
            "server_ms_median": round(statistics.median(srv), 1),
            "http_overhead_ms_median": round(statistics.median(overhead), 1),
        }

    out = {
        "config": {"ckpt": args.ckpt, "batch": 1, "steps": args.steps,
                   "reps": args.reps, "dt": 0.02},
        "backend": jax.default_backend(),
        "startup_s": round(startup_s, 1),
        "serve": _stats(serve_client, serve_server),
        "generate": _stats(gen_client, gen_server),
        **({"serve_tail_under_load": tail} if tail else {}),
        **({"serve_throughput": throughput} if throughput else {}),
        "diverged_rows": diverged["rows"],
        "total_request_rows": diverged["requests"],
        "git_sha": _git_sha(),
        "notes": [
            "one warm process; requests draw entropy seeds server-side "
            "(no identical-repeat elision, CLAUDE.md)",
            "startup_s includes compile/cache-load + the warm-up call "
            "(paid once per server lifetime)",
        ],
    }
    if throughput:
        out["notes"].append(
            "serve_throughput is END-TO-END through HTTP incl. client-side "
            "response parsing (json.loads / np.load inside the timed "
            "window, like-for-like): the JSON path pays ~40 KB/request of "
            "number formatting+parsing; the npz path ships raw f32 arrays "
            "and recovers the device-level batch rate (PARITY serving row)"
        )
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    if tail:
        out["notes"].append(
            "serve_tail_under_load: N client threads against the "
            "single-threaded endpoint — p95/p99 are the queueing tail of "
            "a serialized single-device deployment, measured end-to-end "
            "through HTTP"
        )
    print(json.dumps({k: out[k] for k in ("serve", "generate",
                                          "startup_s", "backend")
                      if k in out}
                     | ({"serve_tail_under_load": tail} if tail else {})))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
