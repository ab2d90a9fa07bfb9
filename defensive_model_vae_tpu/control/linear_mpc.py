"""Linear time-varying MPC (capability counterpart of the reference's
``MPC/mpc_reference.py`` demo).

The reference ships a standalone educational linear MPC: a 3-state
kinematic bicycle [x, y, yaw] with inputs [v, δ], linearized about a
reference trajectory and solved as a QP with cvxpy/ECOS over a T=8
horizon on a synthetic sine road (``:1-231``).

This is a RE-DESIGN, not a mirror (the demo is standalone and unused by
the pipeline — SURVEY §2 C10): a richer 4-state model [x, y, v, yaw]
with inputs [a, δ] (acceleration-level control like the main tracker),
the same LTV structure
    x_{k+1} = A_k x_k + B_k u_k + c_k
with quadratic tracking cost and box-constrained inputs, solved by
projected gradient on the condensed problem — box-QP needs no interior
point method, and the whole receding-horizon simulation is one
``lax.scan``.  The shared pieces with the reference demo are the T=8
horizon, dt=0.1, the 45° steer bound, and the sine-road receding-horizon
scenario shape; model states/weights/road constants differ by design.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LinearMPCConfig:
    # horizon 8 / dt 0.1 / 45° steer bound match the reference demo
    # (``mpc_reference.py``); the 4-state model, wheelbase, accel bound,
    # and weights are this redesign's own (see module docstring)
    horizon: int = 8
    wheelbase: float = 2.9
    dt: float = 0.1
    max_accel: float = 1.0
    max_steer: float = float(np.deg2rad(45.0))
    q: Tuple[float, float, float, float] = (1.0, 1.0, 0.5, 0.5)  # x, y, v, yaw
    r: Tuple[float, float] = (0.01, 0.01)
    pg_iters: int = 60
    pg_lr: float = 0.5


def _linearize(cfg: LinearMPCConfig, v, phi, delta):
    """(A, B, C) of the bicycle linearized about (v, phi, delta)
    (state [x, y, v, yaw], controls [a, delta])."""
    dt, L = cfg.dt, cfg.wheelbase
    A = jnp.array(
        [
            [1.0, 0.0, dt * jnp.cos(phi), -dt * v * jnp.sin(phi)],
            [0.0, 1.0, dt * jnp.sin(phi), dt * v * jnp.cos(phi)],
            [0.0, 0.0, 1.0, 0.0],
            [0.0, 0.0, dt * jnp.tan(delta) / L, 1.0],
        ]
    )
    B = jnp.array(
        [
            [0.0, 0.0],
            [0.0, 0.0],
            [dt, 0.0],
            [0.0, dt * v / (L * jnp.cos(delta) ** 2)],
        ]
    )
    C = jnp.array(
        [
            dt * v * jnp.sin(phi) * phi,
            -dt * v * jnp.cos(phi) * phi,
            0.0,
            -dt * v * delta / (L * jnp.cos(delta) ** 2),
        ]
    )
    return A, B, C


def _clip(cfg: LinearMPCConfig, u):
    lo = jnp.array([-cfg.max_accel, -cfg.max_steer])
    hi = jnp.array([cfg.max_accel, cfg.max_steer])
    return jnp.clip(u, lo, hi)


def solve_ltv_qp(cfg: LinearMPCConfig, x0, x_ref, v_bar, phi_bar, delta_bar):
    """Box-constrained LTV tracking QP by projected gradient.

    Args:
        x0: (4,) current state [x, y, v, yaw].
        x_ref: (T+1, 4) reference states.
        v_bar, phi_bar, delta_bar: linearization points (scalars).

    Returns:
        u: (T, 2) optimal inputs.
    """
    T = cfg.horizon
    A, B, C = _linearize(cfg, v_bar, phi_bar, delta_bar)
    Q = jnp.diag(jnp.array(cfg.q))
    R = jnp.diag(jnp.array(cfg.r))

    def rollout(u):
        def step(x, uk):
            nxt = A @ x + B @ uk + C
            return nxt, nxt

        _, xs = jax.lax.scan(step, x0, u)
        return jnp.concatenate([x0[None], xs], axis=0)

    def cost(u):
        xs = rollout(u)
        e = xs - x_ref
        # wrap the yaw error to [-π, π]: a reference yaw column built with
        # arctan2 crosses the ±π seam on westbound/looping paths, and an
        # unwrapped difference would read as a ~2π phantom error that
        # drives the controller off the road
        e = e.at[:, 3].set(jnp.arctan2(jnp.sin(e[:, 3]), jnp.cos(e[:, 3])))
        track = jnp.einsum("ti,ij,tj->", e, Q, e)
        effort = jnp.einsum("ti,ij,tj->", u, R, u)
        return track + effort

    grad = jax.grad(cost)

    def body(u, _):
        u = _clip(cfg, u - cfg.pg_lr * grad(u))
        return u, None

    u0 = jnp.zeros((T, 2))
    u, _ = jax.lax.scan(body, u0, None, length=cfg.pg_iters)
    return u


def simulate_tracking(
    cfg: LinearMPCConfig,
    reference: np.ndarray,
    x0: np.ndarray,
    n_steps: int,
):
    """Receding-horizon simulation along a reference path.

    Args:
        reference: (N, 4) reference states [x, y, v, yaw] (padded/extended
            beyond the horizon by the caller or repeated at the end).
        x0: (4,) initial state.

    Returns:
        states (n_steps+1, 4), controls (n_steps, 2)
    """
    ref = jnp.asarray(reference, jnp.float32)
    T = cfg.horizon
    dt, L = cfg.dt, cfg.wheelbase

    def nonlinear_step(x, u):
        xx, yy, v, yaw = x
        a, d = _clip(cfg, u)
        return jnp.array(
            [
                xx + v * jnp.cos(yaw) * dt,
                yy + v * jnp.sin(yaw) * dt,
                v + a * dt,
                yaw + v / L * jnp.tan(d) * dt,
            ]
        )

    def step(carry, k):
        x = carry
        # nearest reference index ahead of the vehicle
        d2 = jnp.sum((ref[:, :2] - x[:2]) ** 2, axis=1)
        i0 = jnp.argmin(d2)
        idx = jnp.clip(i0 + jnp.arange(T + 1), 0, ref.shape[0] - 1)
        x_ref = ref[idx]
        u = solve_ltv_qp(cfg, x, x_ref, x[2], x_ref[0, 3], 0.0)
        x_next = nonlinear_step(x, u[0])
        return x_next, (x_next, u[0])

    x0 = jnp.asarray(x0, jnp.float32)
    _, (states, controls) = jax.lax.scan(step, x0, jnp.arange(n_steps))
    states = jnp.concatenate([x0[None], states], axis=0)
    return np.asarray(states), np.asarray(controls)


def sine_road_demo(n_steps: int = 120):
    """The reference demo scenario: track a sine-shaped road from rest
    (``mpc_reference.py`` main)."""
    cfg = LinearMPCConfig()
    s = np.linspace(0, 60, 600)
    xr = s
    yr = 2.0 * np.sin(s / 6.0)
    yaw = np.arctan2(np.gradient(yr), np.gradient(xr))
    vr = np.full_like(s, 3.0)
    reference = np.column_stack([xr, yr, vr, yaw])
    x0 = np.array([0.0, -1.0, 0.0, 0.0])
    states, controls = simulate_tracking(cfg, reference, x0, n_steps)
    return reference, states, controls
