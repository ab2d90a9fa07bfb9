"""GIF / animation toolkit.

Re-implements the reference animation stack (``Plot_Gif.py``,
``Tools.py:260-637``, ``MPC/Drawing_Tools.py``): rotated-rectangle vehicle
rendering, human-vs-model comparison animations with background vehicles
and scenario lane geometry, MPC tracking animations, and cubic-spline
trajectory smoothing with a start-heading boundary condition.  One set of
functions driven by the scenario registry replaces the diverged
Tools/Plot_Gif copies (SURVEY §5 defect 5).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .. import scenarios
from .plots import BV_COLOR, HUMAN_COLOR, MODEL_COLOR, draw_lane_lines


def vehicle_rectangle(center_x, center_y, yaw, length=4.0, width=2.0):
    """(4, 2) rotated rectangle corners (reference
    ``create_vehicle_rectangle``, ``Tools.py:260-300``)."""
    half_l, half_w = length / 2, width / 2
    corners = np.array(
        [[-half_l, -half_w], [half_l, -half_w], [half_l, half_w], [-half_l, half_w]]
    )
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, -s], [s, c]])
    return corners @ R.T + np.array([center_x, center_y])


def smooth_curve(points: np.ndarray, start_heading: Optional[float] = None, n: int = 200):
    """Cubic-spline smoothing of [t, x, y] (or [x, y, t]-style 2-col)
    trajectories with an optional clamped start-heading boundary condition
    (reference ``create_smooth_curve``, ``Tools.py:775-830``).

    Returns an (n, points.shape[1]) array sampled at uniform parameter.
    """
    from scipy.interpolate import CubicSpline

    pts = np.asarray(points, float)
    t = pts[:, 0]
    u = np.linspace(t[0], t[-1], n)
    cols = [u]
    for ci in range(1, pts.shape[1]):
        if start_heading is not None and ci <= 2:
            dt0 = t[1] - t[0]
            dist = np.hypot(pts[1, 1] - pts[0, 1], pts[1, 2] - pts[0, 2]) if pts.shape[1] >= 3 else 1.0
            slope = (dist / dt0) * (np.cos(start_heading) if ci == 1 else np.sin(start_heading))
            cs = CubicSpline(t, pts[:, ci], bc_type=((1, slope), "not-a-knot"))
        else:
            cs = CubicSpline(t, pts[:, ci])
        cols.append(cs(u))
    return np.column_stack(cols)


def _heading_series(xy: np.ndarray) -> np.ndarray:
    """Per-point headings from finite differences (held at the end)."""
    d = np.diff(xy, axis=0)
    th = np.arctan2(d[:, 1], d[:, 0])
    return np.append(th, th[-1] if len(th) else 0.0)


def animate_human_vs_model(
    human_traj: Optional[np.ndarray],
    bv1_traj: Optional[np.ndarray],
    bv2_traj: Optional[np.ndarray],
    model_traj: np.ndarray,
    scenario,
    save_path: str,
    fps: int = 25,
    frame_stride: int = 4,
):
    """Human-vs-model GIF with background vehicles and lane geometry
    (reference ``plot_gif_human_vs_model``, ``Tools.py:304-637``).

    All trajectories are [x, y, t] rows; frames advance on the shared
    clock.  sce3's first background vehicle renders at bicycle size, as in
    the reference (``Tools.py:397-400``).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import patches
    from matplotlib.animation import FuncAnimation, PillowWriter

    sce = scenarios.get(scenario) if isinstance(scenario, str) else scenario

    fig, ax = plt.subplots(figsize=(8, 8))
    ax.set_xlim(sce.plot_xlim)
    ax.set_ylim(sce.plot_ylim)
    ax.grid(True, alpha=0.2)
    ax.set_aspect("equal")
    draw_lane_lines(ax, sce)

    tracks = []

    def add_track(traj, color, label, size=(4.0, 2.0)):
        if traj is None:
            return
        line, = ax.plot([], [], color=color, linewidth=2, label=label)
        rect = patches.Polygon(
            vehicle_rectangle(1e3, 1e3, 0, *size).tolist(),
            facecolor=color, edgecolor="none",
        )
        ax.add_patch(rect)
        tracks.append((np.asarray(traj), _heading_series(np.asarray(traj)[:, :2]), line, rect, size))

    bv_size = sce.bv1_plot_size
    add_track(model_traj, MODEL_COLOR, "Model")
    add_track(human_traj, HUMAN_COLOR, "Human")
    add_track(bv1_traj, BV_COLOR, "BV", bv_size)
    add_track(bv2_traj, BV_COLOR, None)
    ax.legend(loc="upper right")

    # advance every track on the shared CLOCK, not by frame index: tracks
    # differ in length, start time, and sampling rate, and the reference
    # synchronizes them by nearest time (``Tools.py:443-485``)
    t_max = max(float(t[0][-1, 2]) for t in tracks)
    frame_dt = sce.dt * frame_stride
    frames = np.arange(0.0, t_max + frame_dt, frame_dt)

    def update(now):
        artists = []
        for traj, headings, line, rect, size in tracks:
            j = int(np.argmin(np.abs(traj[:, 2] - now)))
            past = traj[:, 2] <= now
            line.set_data(traj[past, 0], traj[past, 1])
            rect.set_xy(
                vehicle_rectangle(traj[j, 0], traj[j, 1], headings[j], *size)
            )
            artists += [line, rect]
        return artists

    anim = FuncAnimation(fig, update, frames=frames, blit=True)
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    anim.save(save_path, writer=PillowWriter(fps=fps))
    plt.close(fig)
    return save_path


def animate_tracking(
    waypoints: np.ndarray,
    states: np.ndarray,
    scenario,
    save_path: str,
    fps: int = 25,
    frame_stride: int = 8,
):
    """MPC tracking GIF: reference path + moving tracked vehicle
    (reference ``Drawing_Tools.create_path_tracking_gif``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import patches
    from matplotlib.animation import FuncAnimation, PillowWriter

    sce = scenarios.get(scenario) if isinstance(scenario, str) else scenario
    fig, ax = plt.subplots(figsize=(8, 8))
    pad = 10
    ax.set_xlim(states[:, 0].min() - pad, states[:, 0].max() + pad)
    ax.set_ylim(states[:, 1].min() - pad, states[:, 1].max() + pad)
    ax.set_aspect("equal")
    ax.grid(alpha=0.2)
    ax.plot(waypoints[:, 0], waypoints[:, 1], "ro--", markersize=4, label="Waypoints")
    trail, = ax.plot([], [], color=MODEL_COLOR, linewidth=2, label="Tracked")
    rect = patches.Polygon(
        vehicle_rectangle(1e3, 1e3, 0).tolist(), facecolor=MODEL_COLOR, edgecolor="none"
    )
    ax.add_patch(rect)
    ax.legend()

    frames = range(0, len(states), frame_stride)

    def update(i):
        trail.set_data(states[: i + 1, 0], states[: i + 1, 1])
        rect.set_xy(vehicle_rectangle(states[i, 0], states[i, 1], states[i, 2]))
        return trail, rect

    anim = FuncAnimation(fig, update, frames=frames, blit=True)
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    anim.save(save_path, writer=PillowWriter(fps=fps))
    plt.close(fig)
    return save_path
