"""Root-cause probe for the residual Pallas cache churn (round-3 verdict #4).

Even with ``PYTHONHASHSEED=0`` a full bench run can mint 1-3 fresh ~200 KB
``.jax_cache`` entries: the Mosaic LOWERING of a Pallas kernel is not a
pure function of the kernel — it varies with the process's prior trace
history (CLAUDE.md).  This probe pins the mechanism WITHOUT paying any
tunnel compiles: it only LOWERS (never executes) the production fused
kernels in one process, twice each —

  A  canonical order (the entry points' order: whole-run kernel, scale
     kernel hbm, scale kernel prng, grid kernel)
  A2 same order again, fresh jit wrappers  -> in-context determinism
  B  after tracing a decoy Pallas kernel, in REVERSED order
     -> trace-context dependence

— hashes each serialized lowering (``lowered.as_text()`` includes the
Mosaic custom-call payload), and on mismatch prints where the two texts
first diverge.  If A == A2 but A != B, the churn is trace-context
dependence and a canonical warm-trace order in the entry points would
converge it; if A != A2 the lowering is nondeterministic even at fixed
context and the churn is unfixable from user code (document it).

Run on the TPU machine (lowering targets the accelerator backend); takes
seconds — no kernel is compiled or executed.
"""

import difflib
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from defensive_model_vae_tpu.utils.cache import ensure_deterministic_hash_seed

ensure_deterministic_hash_seed()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from defensive_model_vae_tpu.models import (  # noqa: E402
    CVAEConfig, LossWeights,
)
from defensive_model_vae_tpu.ops import fused_scale, fused_trainer  # noqa: E402

CFG = CVAEConfig()
W = LossWeights()


def _sds(shape, dtype=jnp.float32):
    return jax.ShapeDtypeStruct(shape, dtype)


def _lower_specs():
    """(name, wrapped_fn, static_argnames, args) for each production
    kernel, with bench-shaped ShapeDtypeStruct inputs — lowering only:
    nothing touches the device, no values exist."""
    n, tile, epochs = 131072, 2048, 200
    F = CFG.seq_len * CFG.dim
    plist = tuple(
        s for fi, fo in CFG.layer_spec().values()
        for s in (_sds((fi, fo)), _sds((1, fo)))
    )
    seed = _sds((1, 1), jnp.int32)
    # the LIVE corpus width: hbm/prng corpora are packed WITHOUT eps
    # columns (fused_scale._pack_corpus appends them only for explicit
    # eps) — probing the old +latent_dim width would verify programs
    # bench.py no longer compiles
    width = F + CFG.cond_dim + 1

    packed = _sds((n, width), jnp.bfloat16)
    scale_statics = (
        "cfg", "weights", "epochs", "lr", "tile", "n_valid", "compute_dtype",
        "mixed_style", "noise", "interpret", "backward", "_ablate",
    )
    # the THREE scale programs bench_scale_fused actually compiles:
    # hbm+manual (production default), prng+manual (r03 headline series),
    # prng+auto (autodiff series) — statics must match _fused_scale_call's
    # signature, incl. backward (probing hbm+autodiff would verify a
    # program bench never runs)
    scale_args = lambda noise, backward: (
        plist, packed, seed, CFG, W, epochs, 1e-3, tile, float(n),
        jnp.bfloat16, "f32_acts", noise, False, backward,
    )

    whole_statics = ("cfg", "weights", "epochs", "lr", "interpret", "backward")
    whole_args = (plist, _sds((38, F)), _sds((38, 2)), seed, CFG, W,
                  3000, 1e-3)

    return [
        ("fused_whole", fused_trainer._fused_call.__wrapped__,
         whole_statics, whole_args),
        ("scale_hbm_manual", fused_scale._fused_scale_call.__wrapped__,
         scale_statics, scale_args("hbm", "manual")),
        ("scale_prng_manual", fused_scale._fused_scale_call.__wrapped__,
         scale_statics, scale_args("prng", "manual")),
        ("scale_prng_auto", fused_scale._fused_scale_call.__wrapped__,
         scale_statics, scale_args("prng", "auto")),
    ]


def _decoy():
    """An unrelated Pallas kernel traced to perturb the process's trace
    context (names/counters) before context B's lowerings."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0 + 1.0

    jax.jit(
        lambda v: pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(v)
    ).lower(_sds((128, 128)))


def _lower_text(fn, statics, args):
    return jax.jit(fn, static_argnames=statics).lower(*args).as_text()


def main():
    specs = _lower_specs()
    texts = {}
    for ctx in ("A", "A2", "B"):
        if ctx == "B":
            _decoy()
        order = specs if ctx != "B" else list(reversed(specs))
        for name, fn, statics, args in order:
            texts[(ctx, name)] = _lower_text(fn, statics, args)
    ok = True
    for name, _, _, _ in specs:
        a, a2, b = (texts[(c, name)] for c in ("A", "A2", "B"))
        ha, ha2, hb = (
            hashlib.sha256(t.encode()).hexdigest()[:12] for t in (a, a2, b)
        )
        det = "deterministic" if ha == ha2 else "NONDETERMINISTIC-IN-CONTEXT"
        ctx = "context-stable" if ha == hb else "CONTEXT-DEPENDENT"
        print(f"{name}: bytes={len(a)}  A={ha} A2={ha2} B={hb}  [{det}, {ctx}]")
        if ha != hb or ha != ha2:
            ok = False
            other = a2 if ha != ha2 else b
            for i, line in enumerate(difflib.unified_diff(
                a.splitlines(), other.splitlines(), lineterm="", n=1
            )):
                if i > 30:
                    print("  ... (diff truncated)")
                    break
                print(f"  {line[:200]}")
    print("PROBE:", "all lowerings stable" if ok else "divergence found above")


if __name__ == "__main__":
    main()
