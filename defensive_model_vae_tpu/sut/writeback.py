"""SUT write-back: inject tracked trajectories into their source CSVs.

Re-implements ``SUT_Testing/Defensive_Testing.py``: parse the tracked-npy
name back to its source CSV, find the CSV row nearest the trajectory start,
derive ego kinematics (vx, vy, ax, ay, yaw°) from [x, y, theta, v] via
``np.gradient`` over the row clock, overwrite the ego columns from that row
on, and truncate the CSV tail if the trajectory is shorter.
"""

from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Tuple, Union

import numpy as np
import pandas as pd

from .. import scenarios

_EGO_COLS = ("ego_x", "ego_y", "ego_vx", "ego_vy", "ego_ax", "ego_ay", "ego_yaw")

# match any sce\d+ (registry-agnostic per CLAUDE.md), but VALIDATE the
# parsed key against the registry strictly: scenarios.get's fuzzy
# substring fallback would silently resolve an unknown 'sce10' to sce1
# and write back into the wrong town's CSV (the reference raises on
# unknown keys — Defensive_Testing.py:40-52)
_NPY_RE = re.compile(
    r"tracked_trajectory_(sce\d+)_exp(\d+)_(\d+)\.npy$", re.IGNORECASE
)


def parse_tracked_npy_name(filename: Union[str, Path]) -> Tuple[str, str, str]:
    """``tracked_trajectory_sce1_exp1_3.npy → ('sce1', '1', '3')``
    (reference ``:34-52``)."""
    name = os.path.basename(str(filename))
    m = _NPY_RE.match(name)
    if not m:
        raise ValueError(f"cannot parse tracked npy name: {name}")
    key = m.group(1).lower()
    if key not in scenarios.REGISTRY:
        raise ValueError(
            f"unknown scenario key {key!r} in tracked npy name {name!r}"
        )
    return key, m.group(2), m.group(3)


def expected_csv_name(sce_key: str, exp_num: str, suffix_num: str) -> str:
    town = scenarios.get(sce_key).town
    return f"exp_{exp_num}_control_{town}_{suffix_num}.csv"


def compute_ego_kinematics(theta: np.ndarray, v: np.ndarray, t: np.ndarray):
    """vx = v cosθ, vy = v sinθ; ax/ay = gradient over t; yaw in degrees
    (reference ``compute_ego_kinematics``, ``:130-153``)."""
    theta = np.asarray(theta, float)
    v = np.asarray(v, float)
    t = np.asarray(t, float)
    vx, vy = v * np.cos(theta), v * np.sin(theta)
    yaw_deg = np.rad2deg(theta)
    if len(theta) == 1:
        z = np.zeros(1)
        return vx, vy, z, z, yaw_deg
    return vx, vy, np.gradient(vx, t), np.gradient(vy, t), yaw_deg


def _row_times(df: pd.DataFrame, start_row: int, L: int) -> np.ndarray:
    """Clock for the replaced rows: 'frame' column, else 'time', else index
    (reference ``row_times_seconds``, ``:107-127``)."""
    if L <= 0:
        return np.array([])
    sub = df.iloc[start_row : start_row + L]
    if "frame" in df.columns:
        t = pd.to_numeric(sub["frame"], errors="coerce").to_numpy()
    elif "time" in df.columns:
        t = pd.to_numeric(sub["time"], errors="coerce").to_numpy()
    else:
        t = np.arange(L, dtype=float)
    if np.any(np.isnan(t)):
        t = (
            pd.Series(t).interpolate(limit_direction="both").bfill().ffill().to_numpy()
        )
    return np.asarray(t, float)


def find_best_start_row(df: pd.DataFrame, x0: float, y0: float) -> int:
    """CSV row whose ego position is nearest the trajectory start
    (reference ``:156-163``)."""
    ex = pd.to_numeric(df["ego_x"], errors="coerce").to_numpy()
    ey = pd.to_numeric(df["ego_y"], errors="coerce").to_numpy()
    return int(np.nanargmin((ex - x0) ** 2 + (ey - y0) ** 2))


def merge_trajectory_into_csv(
    df: pd.DataFrame, traj_xytv: np.ndarray, start_row: int
) -> pd.DataFrame:
    """Overwrite ego columns from ``start_row`` with the trajectory-derived
    kinematics; truncate the tail if the trajectory is shorter
    (reference ``merge_trajectory_into_csv``, ``:166-205``)."""
    for col in _EGO_COLS:
        if col not in df.columns:
            raise KeyError(f'CSV missing column "{col}"')
    traj = np.asarray(traj_xytv, float)
    if traj.ndim != 2 or traj.shape[1] < 4:
        raise ValueError("trajectory must be (N, ≥4) [x, y, theta, v]")

    remain = len(df) - start_row
    if remain <= 0:
        raise ValueError("start row beyond CSV length")
    L = min(len(traj), remain)
    seg = traj[:L]
    t = _row_times(df, start_row, L)
    vx, vy, ax, ay, yaw_deg = compute_ego_kinematics(seg[:, 2], seg[:, 3], t)

    out = df.copy()
    sl = slice(start_row, start_row + L)
    loc = out.columns.get_loc
    out.iloc[sl, loc("ego_x")] = seg[:, 0]
    out.iloc[sl, loc("ego_y")] = seg[:, 1]
    out.iloc[sl, loc("ego_vx")] = vx
    out.iloc[sl, loc("ego_vy")] = vy
    out.iloc[sl, loc("ego_ax")] = ax
    out.iloc[sl, loc("ego_ay")] = ay
    out.iloc[sl, loc("ego_yaw")] = yaw_deg
    if L < remain:
        out = out.iloc[: start_row + L].reset_index(drop=True)
    return out


def writeback_npy_to_csv(
    npy_path: Union[str, Path],
    defensive_data_root: Union[str, Path],
    out_dir: Union[str, Path],
) -> Path:
    """Full write-back for one tracked npy (reference ``main``, ``:208-240``)."""
    npy_path = Path(npy_path)
    traj = np.asarray(np.load(npy_path))[:, :4].astype(float)
    sce_key, exp_num, suffix = parse_tracked_npy_name(npy_path.name)
    csv_name = expected_csv_name(sce_key, exp_num, suffix)

    matches = [
        p for p in Path(defensive_data_root).rglob(csv_name) if p.is_file()
    ]
    if not matches:
        raise FileNotFoundError(f"{csv_name} not found under {defensive_data_root}")
    if len(matches) > 1:
        raise RuntimeError(f"multiple CSVs named {csv_name}")
    df = pd.read_csv(matches[0])
    start_row = find_best_start_row(df, traj[0, 0], traj[0, 1])
    merged = merge_trajectory_into_csv(df, traj, start_row)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    out_path = out_dir / f"{matches[0].stem}_def.csv"
    merged.to_csv(out_path, index=False)
    return out_path
