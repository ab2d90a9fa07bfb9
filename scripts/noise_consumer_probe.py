"""Pin WHERE the threefry hbm-noise penalty lives (round 4).

Evidence so far (results/hot_probe.json): rbg program time is exactly
additive (gen 0.054 + kernel ~0.255 = hbm_rbg 0.309 measured) while the
threefry program costs ~0.1 s MORE than its parts (gen 0.033-0.047 +
kernel ~0.255 vs hbm 0.392-0.397 measured).  Hypothesis: the penalty
appears when the threefry-generated buffer is consumed by a Pallas
custom call (layout/fusion of the generation feeding the custom-call
operand), not in generation or the kernel themselves.

Discriminator, all in ONE jitted program each, fresh entropy seeds:
  gen_<impl>_sum      generate eps -> jnp.sum (plain-XLA consumer)
  gen_<impl>_stream   generate eps -> probe-local Pallas kernel that
                      streams it in (tile, Z) blocks and reduces each
                      block (same consumption pattern as the hbm
                      trainer, none of its compute)

OUTCOME (results/noise_consumer_probe.json): mechanism PINNED.  With a
plain-XLA consumer the impls are within 7 ms (threefry 0.036 s vs rbg
0.029 s) — but the SAME generated buffer feeding the stream-only Pallas
consumer costs threefry 0.141 s vs rbg 0.054 s: +0.087 s, matching the
full trainer's hbm-vs-hbm_rbg gap (0.395 - 0.309 = 0.086 s) exactly.
The penalty is the threefry output's layout feeding a blocked Pallas
custom-call operand (a relayout/copy rbg's output does not need), not
generation cost and not the kernel.

Writes results/noise_consumer_probe.json.  Run ALONE on the real chip.
"""
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from defensive_model_vae_tpu.utils.cache import (
    enable_persistent_cache,
    ensure_deterministic_hash_seed,
)

ensure_deterministic_hash_seed()
enable_persistent_cache()

import functools

import jax
import jax.numpy as jnp
import numpy as np

from bench import _fresh_seed

EPOCHS, N_PAD, Z, TILE = 200, 131072, 8, 2048
ROWS = EPOCHS * N_PAD


def _gen(seed_arr, impl):
    key = jax.random.fold_in(jax.random.key(seed_arr[0, 0], impl=impl), 1)
    flat = jax.random.normal(key, (ROWS * Z,), jnp.float32)
    return flat.astype(jnp.bfloat16).reshape(ROWS, Z)


@functools.partial(jax.jit, static_argnames=("impl",))
def gen_sum(seed_arr, impl):
    # NOTE: XLA fuses RNG+convert+sum here, so the eps buffer is never
    # materialized to HBM — this is the fused-consumer control
    return jnp.sum(_gen(seed_arr, impl).astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("impl",))
def gen_summat(seed_arr, impl):
    # optimization_barrier forces the eps buffer to MATERIALIZE before
    # the plain-XLA sum — isolates layout-of-the-materialized-buffer
    # from the fusion elision above
    eps = jax.lax.optimization_barrier(_gen(seed_arr, impl))
    return jnp.sum(eps.astype(jnp.float32))


def _stream_kernel(eps_ref, o_ref):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    row = jnp.full((8,), jnp.sum(eps_ref[:].astype(jnp.float32)))

    @pl.when(i == 0)
    def _init():
        o_ref[0, :] = row

    @pl.when(i != 0)
    def _acc():
        o_ref[0, :] = o_ref[0, :] + row


@functools.partial(jax.jit, static_argnames=("impl",))
def gen_stream(seed_arr, impl):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    eps = _gen(seed_arr, impl)
    n_tiles = ROWS // TILE
    out = pl.pallas_call(
        _stream_kernel,
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
        in_specs=[pl.BlockSpec((TILE, Z), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
    )(eps)
    return out


def main():
    variants = [
        ("threefry2x32", "sum"), ("rbg", "sum"),
        ("threefry2x32", "summat"), ("rbg", "summat"),
        ("threefry2x32", "stream"), ("rbg", "stream"),
    ]
    times = {v: [] for v in variants}
    for rep in range(4):  # rep 0 untimed
        for impl, consumer in variants:
            sa = jnp.array([[_fresh_seed()]], jnp.int32)
            np.asarray(sa)  # staged + fetched before the window
            fn = {"sum": gen_sum, "summat": gen_summat,
                  "stream": gen_stream}[consumer]
            t0 = time.time()
            out = fn(sa, impl)
            np.asarray(out)  # tiny scalar fetch = completion barrier
            dt = time.time() - t0
            if rep == 0:
                print(f"cold {impl}/{consumer}: {dt:.1f}s", file=sys.stderr)
            else:
                times[(impl, consumer)].append(dt)
                print(f"rep{rep} {impl}/{consumer}: {dt:.3f}s",
                      file=sys.stderr)
    print()
    out = {"epochs": EPOCHS, "n_pad": N_PAD, "z": Z, "tile": TILE,
           "variants": {}}
    for v, ts in times.items():
        name = f"{v[0]}_{v[1]}"
        out["variants"][name] = {
            "best_s": round(min(ts), 4),
            "all_s": [round(t, 4) for t in ts],
        }
        print(f"{v[0]:14s} -> {v[1]:6s}: best {min(ts):.3f}s  all "
              + " ".join(f"{t:.3f}" for t in ts))
    import json

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "results", "noise_consumer_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
