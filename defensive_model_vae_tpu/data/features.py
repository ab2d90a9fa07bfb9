"""Condition-feature builders for the conditioned CVAE variants.

BASELINE config 4 ("Conditional VAE conditioned on scenario class +
THW/spatial-distribution features"): extends the reference's start-point
condition with a scenario one-hot and the window's trigger time-headway,
enabling ONE model over the combined four-scenario corpus.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from .. import scenarios


def window_start_speed(window: np.ndarray) -> float:
    """Start speed of one [t, x, y] window from its first segment."""
    dt = window[1, 0] - window[0, 0]
    d = np.hypot(window[1, 1] - window[0, 1], window[1, 2] - window[0, 2])
    return float(d / dt) if dt > 0 else 0.0


def window_thw(window: np.ndarray, scenario, trial_suffix: str = "") -> float:
    """Trigger THW = scenario distance / start speed (``Get_THW.py:66-104``);
    scenarios without a registered distance fall back to 60 m."""
    sce = scenarios.get(scenario) if isinstance(scenario, str) else scenario
    v = window_start_speed(window)
    if sce.thw_distance is not None:
        d = sce.thw_distance
    elif sce.thw_distance_by_suffix is not None:
        d = sce.thw_distance_by_suffix.get(
            trial_suffix, sce.thw_distance_by_suffix["default"]
        )
    else:
        d = 60.0
    return d / v if v > 0 else 0.0


def build_conditioned_corpus(
    windows_by_scenario: Dict[str, np.ndarray],
) -> Tuple[np.ndarray, np.ndarray]:
    """Stack all scenario corpora with [one-hot(4), THW] extra conditions.

    Returns (windows (N, T, D), extra_cond (N, 5)) ready for
    ``train.train_conditioned``.
    """
    keys = sorted(windows_by_scenario.keys())
    all_w, all_c = [], []
    for key in keys:
        sce = scenarios.get(key)
        w = np.asarray(windows_by_scenario[key], np.float32)
        onehot = np.zeros(4, np.float32)
        onehot[sce.index - 1] = 1.0
        for win in w:
            thw = window_thw(win, sce)
            all_w.append(win)
            all_c.append(np.concatenate([onehot, [thw]]))
    return np.stack(all_w), np.stack(all_c).astype(np.float32)
