"""Follow-up probes on the round-4 ablation's two open costs
(``results/scale_ablation.json``):

1. **The hbm eps buffer costs 82 ms over packed eps** (hbm 0.400 s vs
   manual_eps 0.3175 s) — is that the threefry GENERATION (26.2M × 8
   normals in XLA) or the extra stream?  Probes: time the generation
   program alone under threefry / rbg / unsafe_rbg (rbg lowers to the
   hardware RngBitGenerator), then the full hbm kernel under each impl.
   OUTCOME (results/hot_probe.json): rbg wins end-to-end (hbm_rbg
   0.308 s vs hbm 0.395 s) but NOT via generation cost — standalone,
   threefry generation (33–47 ms across regenerations, incl. one with
   a fetch barrier after block_until_ready was found unreliable) is small
   and FASTER than rbg's (54 ms), so the threefry penalty lives in how
   the generated buffer composes with the streaming custom call inside
   one program — PINNED by scripts/noise_consumer_probe.py: the
   threefry output's layout feeding the blocked Pallas custom-call
   operand (+0.087 s with a stream-only Pallas consumer vs within 7 ms
   of rbg under a plain-XLA consumer); the default is chosen on the
   end-to-end number.

2. **The 12 transposed dW matmuls are ~0.18 s = 56% of the manual
   kernel's wall** (adam 1.7 ms and the cross-tile accumulate ~0 are
   ruled out by the ablation) — does Mosaic lower the explicit
   transpose-then-matmul formulation faster than the batch-dim-contracting
   dot_general?  Probe: the real kernel with ``_ablate=("dwT",)``.

Writes results/hot_probe.json.  Run ALONE on the real chip (same rules
as bench.py).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from defensive_model_vae_tpu.utils.cache import (
    enable_persistent_cache,
    ensure_deterministic_hash_seed,
)

ensure_deterministic_hash_seed()
enable_persistent_cache()

import functools  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench import _fresh_seed as _fresh  # noqa: E402
from bench import _scale_corpus  # noqa: E402
from defensive_model_vae_tpu.models import (  # noqa: E402
    CVAEConfig, LossWeights, init_params,
)
from defensive_model_vae_tpu.ops.fused_scale import (  # noqa: E402
    _fused_scale_call, _pack_corpus,
)
from defensive_model_vae_tpu.ops.fused_trainer import (  # noqa: E402
    _flatten_params, fused_inputs,
)

N, EPOCHS, TILE, REPS = 131072, 200, 2048, 4


@functools.partial(jax.jit, static_argnames=("impl", "rows", "z"))
def _gen_eps(seed, impl, rows, z):
    # flat generation, like the production kernel: a (rows, 8) request
    # pads its u32 bits temp to 128 lanes (12.5 GiB at this shape -> OOM)
    key = jax.random.fold_in(jax.random.key(seed[0, 0], impl=impl), 1)
    flat = jax.random.normal(key, (rows * z,), jnp.float32)
    return flat.astype(jnp.bfloat16).reshape(rows, z)


def main():
    windows = _scale_corpus(N)
    cfg = CVAEConfig(seq_len=windows.shape[1], dim=windows.shape[2])
    weights = LossWeights()
    cdt = jnp.bfloat16
    x_flat, start = fused_inputs(windows)
    rows = EPOCHS * N

    # staging is forced with tiny real FETCHES, not block_until_ready —
    # block does not force lazy device_put/compute completion on the
    # tunnel (CLAUDE.md hazard (3)), and packed_eps[1..] / the per-call
    # seeds are first consumed INSIDE timed windows
    plist = tuple(_flatten_params(init_params(jax.random.PRNGKey(0), cfg)))
    np.asarray(jnp.stack([p.ravel()[-1] for p in plist]))
    mask1 = jnp.ones((N,), jnp.float32)
    packed_zero = _pack_corpus(x_flat, start, mask1, None,
                               cfg.latent_dim).astype(cdt)
    np.asarray(packed_zero[-1, -1])
    erng = np.random.default_rng()
    packed_eps = []
    for _ in range(REPS):
        pe = _pack_corpus(
            x_flat, start, mask1,
            jnp.asarray(erng.normal(size=(N, cfg.latent_dim)), jnp.float32),
            cfg.latent_dim,
        ).astype(cdt)
        np.asarray(pe[-1, -1])
        packed_eps.append(pe)
    def _fresh_seed_arr():
        # pre-transferred AND fetched before the caller's timed window
        # opens (entropy-fresh per call — identical-repeat hazard)
        sa = jnp.array([[_fresh()]], jnp.int32)
        np.asarray(sa)
        return sa

    def run(mode, rep, seed_arr):
        if mode.startswith("gen_"):
            out = _gen_eps(seed_arr, mode[4:], rows, cfg.latent_dim)
            # completion barrier = a tiny fetch of the last row; block_
            # until_ready is not a reliable barrier on the tunnel
            # (CLAUDE.md hazards — measured a no-op for Pallas outputs;
            # fetch is honest by construction for the XLA ones too)
            np.asarray(out[-1, -1])
            return None
        if mode.startswith("hbm"):
            impl = {"hbm_rbg": "rbg", "hbm_urbg": "unsafe_rbg"}.get(
                mode.split("+")[0], "threefry2x32"
            )
            ablate = ("dwT",) if mode.endswith("+dwT") else ()
            _, m = _fused_scale_call(
                plist, packed_zero, seed_arr, cfg, weights, EPOCHS, 1e-3,
                TILE, float(N), cdt, "f32_acts", "hbm", backward="manual",
                noise_impl=impl, _ablate=ablate,
            )
            return np.asarray(m)
        if mode.startswith("packed"):
            ablate = ("dwT",) if mode.endswith("+dwT") else ()
            _, m = _fused_scale_call(
                plist, packed_eps[rep], seed_arr, cfg, weights, EPOCHS, 1e-3,
                TILE, float(N), cdt, "f32_acts", "packed", backward="manual",
                _ablate=ablate,
            )
            return np.asarray(m)
        raise ValueError(mode)

    variants = [
        "gen_threefry2x32", "gen_rbg", "gen_unsafe_rbg",
        "packed", "packed+dwT",
        "hbm", "hbm_rbg", "hbm_urbg", "hbm_rbg+dwT",
    ]
    times = {v: [] for v in variants}
    last = {}
    for rep in range(REPS + 1):  # rep 0 untimed (compile/load)
        for v in variants:
            sa = _fresh_seed_arr()  # staged + fetched before the window
            t0 = time.time()
            m = run(v, min(rep, REPS - 1), sa)
            dt = time.time() - t0
            if m is not None:
                last[v] = m
            if rep == 0:
                print(f"cold {v}: {dt:.1f}s", file=sys.stderr)
            else:
                times[v].append(dt)
                print(f"rep{rep} {v}: {dt:.3f}s", file=sys.stderr)

    # sanity: every kernel variant trains (loss at last epoch < epoch 0)
    for v, m in last.items():
        first, fin = float(m[0, 0]), float(m[EPOCHS - 1, 0])
        assert np.isfinite(fin) and fin < first, (v, first, fin)

    out = {"n": N, "epochs": EPOCHS, "tile": TILE, "reps": REPS,
           "variants": {}}
    for v in variants:
        best = min(times[v])
        out["variants"][v] = {
            "best_s": round(best, 4),
            "all_s": [round(t, 4) for t in times[v]],
            "mwindows_per_s": (
                round(EPOCHS * N / best / 1e6, 2)
                if not v.startswith("gen_") else None
            ),
        }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "results", "hot_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps({v: out["variants"][v]["best_s"] for v in variants}))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
