"""Minimal client for the persistent serving endpoint.

Start the server (keeps the compiled sample→reference→MPC program warm;
requests are padded to the compiled batch — see ``serving.py``):

    defvae serve --ckpt <checkpoint-dir> --listen 8080 --batch 16

then query it:

    python examples/serve_client.py --port 8080 \
        --start -193.3 50.0 --start -192.8 42.0 --seed 7

stdlib-only on purpose: the endpoint is plain JSON over HTTP, so any
client stack works the same way.
"""

import argparse
import json
import urllib.request


def query(base_url, requests, seed=None, model=None, route="serve",
          timeout=300):
    """POST trajectory requests; returns the decoded response dict.

    ``requests`` is a list of dicts with ``start_x``/``start_y`` (and
    optional ``heading``/``vx``/``vy``); ``seed=None`` lets the server
    draw fresh trajectories (pass an int to pin the draw).  ``model``
    selects the checkpoint when the server hosts several (see
    ``/healthz``'s ``models`` list).  ``route="generate"`` returns raw
    sampled trajectories instead of MPC-tracked states.

    Rows listed in the response's ``"invalid"`` field diverged (rare
    degenerate draw) and came back null — retry those with a fresh seed.
    """
    payload = {"requests": requests}
    if seed is not None:
        payload["seed"] = int(seed)
    if model is not None:
        payload["model"] = model
    req = urllib.request.Request(
        f"{base_url}/{route}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument(
        "--start", nargs=2, type=float, action="append", required=True,
        metavar=("X", "Y"), help="request start point (repeatable)",
    )
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--model", default=None,
                    help="model name when the server hosts several")
    ap.add_argument("--generate", action="store_true",
                    help="raw sampled trajectories (no MPC tracking)")
    args = ap.parse_args()

    base = f"http://{args.host}:{args.port}"
    with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
        health = json.loads(r.read())
    print(f"server: batch {health['batch']}, {health['steps']} MPC steps, "
          f"models {health['models']}")

    route = "generate" if args.generate else "serve"
    body = query(
        base, [{"start_x": x, "start_y": y} for x, y in args.start],
        seed=args.seed, model=args.model, route=route,
    )
    print(f"model {body['model']}, seed {body['seed']}: "
          f"{body['n']} trajectories via /{route}")
    rows = body["trajectories"] if args.generate else body["states"]
    for i, states in enumerate(rows):
        if states is None:  # diverged draw — retry this row, fresh seed
            print(f"  [{i}] invalid (degenerate draw) — retry")
            continue
        if args.generate:
            t0, x0, y0 = states[0]
            t1, x1, y1 = states[-1]
            print(f"  [{i}] ({x0:.1f}, {y0:.1f}) → ({x1:.1f}, {y1:.1f}) "
                  f"over {t1 - t0:.1f} s ({len(states)} waypoints)")
            continue
        x0, y0 = states[0][0], states[0][1]
        x1, y1, _, v1 = states[-1]
        print(
            f"  [{i}] ({x0:.1f}, {y0:.1f}) → ({x1:.1f}, {y1:.1f}), "
            f"final speed {v1:.2f} m/s over {len(states) - 1} steps"
        )


if __name__ == "__main__":
    main()
