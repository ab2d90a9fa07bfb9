"""Attribute the r03→r04 drift of ``dnda_sweep_21ep_s`` (7.5 → 9.6/10.7 s).

``bench_dnda_sweep`` times ONE call: ``score_directory(jittered_corpus)``
(``bench.py``).  That call has three stages (``dnda/calculator.py:210-220``):

  prep     per-episode HOST work — pandas CSV read, frame rotation, Frenet
           resampling, path-cluster generation (pure numpy/pandas; on a
           1-CPU host it runs inline, no pool)
  sweep    the batched device SAT program (``sweep_frames(device=True)``)
           including the host-side padding/packing of the frame batch
  finalize per-frame DA/RL from the fetched collision indices (host numpy)

This probe times the three stages separately across entropy-jittered
corpus copies (same protocol as the bench: warm on one copy, time others
— the tunnel's identical-repeat result cache is cross-process), plus one
uninstrumented ``score_directory`` call per rep to tie the decomposition
to the bench series, and records the host context (cpu count, loadavg)
that the host-dominated stages scale with.

Writes results/dnda_drift_probe.json.  Run ALONE on the real chip (same
rules as bench.py).
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from bench import _fresh_seed, _jittered_sut_copy, _median  # noqa: E402
from defensive_model_vae_tpu import scenarios  # noqa: E402
from defensive_model_vae_tpu.dnda.calculator import (  # noqa: E402
    _EPISODE_RE,
    _finalize_episode,
    prepare_episode,
    score_directory,
)
from defensive_model_vae_tpu.dnda.core import sweep_frames  # noqa: E402

CORPUS = "/root/reference/SUT_Testing/collected_data"
REPS = 4


def staged_sweep(directory, **episode_kwargs):
    """score_directory's device path with per-stage timers (mirrors
    dnda/calculator.py:184-220 stage for stage, inline mapper)."""
    from pathlib import Path

    t0 = time.time()
    jobs = []
    for p in sorted(Path(directory).rglob("*.csv")):
        m = _EPISODE_RE.match(p.name)
        if not m:
            continue
        try:
            sce = scenarios.get(m.group("scenario"))
        except KeyError:
            continue
        jobs.append((str(p), sce.key))
    prepped = [
        (path, *prepare_episode(path, key, **episode_kwargs))
        for path, key in jobs
    ]
    t_prep = time.time() - t0

    t0 = time.time()
    all_preps = [p for _, _, preps in prepped for p in preps]
    all_cis = sweep_frames(all_preps, device=True)
    # sweep_frames returns fetched numpy per frame — the fetch is the
    # completion barrier, so t_sweep is honest device + packing time
    t_sweep = time.time() - t0

    t0 = time.time()
    maxes, k = [], 0
    for _, frames, preps in prepped:
        res = _finalize_episode(frames, preps, all_cis[k : k + len(preps)])
        maxes.append(res.max_dnda)
        k += len(preps)
    t_final = time.time() - t0
    return t_prep, t_sweep, t_final, len(all_preps), maxes


def main():
    # cache discipline inside main() only: tests import this module on the
    # CPU backend, where enabling the shared persistent cache would mint
    # host-specific XLA:CPU entries (CLAUDE.md)
    from defensive_model_vae_tpu.utils.cache import (
        enable_persistent_cache,
        ensure_deterministic_hash_seed,
    )

    ensure_deterministic_hash_seed()
    enable_persistent_cache()
    if not os.path.isdir(CORPUS):
        print("SUT corpus absent; nothing to probe", file=sys.stderr)
        return
    out = {
        "cpu_count": os.cpu_count(),
        "loadavg_start": list(os.getloadavg()),
        "reps": [],
        "score_directory_s": [],
    }
    with tempfile.TemporaryDirectory() as tmp:
        # warm copy absorbs compiles + the per-process executable-load
        # warm-up (CLAUDE.md); its timings are recorded but not aggregated
        warm_dir = os.path.join(tmp, "warm")
        _jittered_sut_copy(CORPUS, warm_dir)
        warm = staged_sweep(warm_dir)
        out["warm_stages_s"] = [round(v, 3) for v in warm[:3]]
        print(f"warm: prep {warm[0]:.2f}s sweep {warm[1]:.2f}s "
              f"final {warm[2]:.2f}s ({warm[3]} frames)", file=sys.stderr)
        ref_maxes = warm[4]

        for rep in range(REPS):
            d = os.path.join(tmp, f"rep{rep}")
            _jittered_sut_copy(CORPUS, d, eps=2e-3 + 1e-12 * _fresh_seed())
            t_prep, t_sweep, t_final, n_frames, maxes = staged_sweep(d)
            # jitter is +eps on SV velocities: frame counts must match and
            # scores stay near the warm copy's (sanity, not an oracle)
            assert len(maxes) == len(ref_maxes)
            total = t_prep + t_sweep + t_final
            out["reps"].append({
                "prep_s": round(t_prep, 3),
                "sweep_s": round(t_sweep, 3),
                "finalize_s": round(t_final, 3),
                "total_s": round(total, 3),
                "n_frames": n_frames,
            })
            print(f"rep{rep}: prep {t_prep:.2f}s sweep {t_sweep:.2f}s "
                  f"final {t_final:.2f}s total {total:.2f}s", file=sys.stderr)
            # the bench-series number for the same copy (uninstrumented)
            t0 = time.time()
            score_directory(d)
            dt = time.time() - t0
            out["score_directory_s"].append(round(dt, 3))
            print(f"rep{rep}: score_directory {dt:.2f}s", file=sys.stderr)

    out["loadavg_end"] = list(os.getloadavg())
    preps = [r["prep_s"] for r in out["reps"]]
    sweeps = [r["sweep_s"] for r in out["reps"]]
    finals = [r["finalize_s"] for r in out["reps"]]
    out["summary"] = {
        "prep_median_s": round(_median(preps), 3),
        "sweep_median_s": round(_median(sweeps), 3),
        "finalize_median_s": round(_median(finals), 3),
        "score_directory_median_s": round(_median(out["score_directory_s"]), 3),
        "host_share_pct": round(
            100 * (_median(preps) + _median(finals))
            / (_median(preps) + _median(sweeps) + _median(finals)), 1,
        ),
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "results", "dnda_drift_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out["summary"]))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()


def _smoke(tmp_dir, **episode_kwargs):
    """Imported by tests: staged_sweep must agree episode-for-episode with
    score_directory on the same corpus (it re-implements the stages only
    to time them — any result divergence voids the decomposition)."""
    rows = score_directory(tmp_dir, **episode_kwargs)
    t_prep, t_sweep, t_final, n, maxes = staged_sweep(tmp_dir, **episode_kwargs)
    assert len(maxes) == len(rows)
    for r, m in zip(rows, maxes):
        assert np.isclose(r["max_dnda"], m, rtol=1e-9), (r, m)
    return n
