"""XLA-native batched MPC path tracker.

The reference tracker (``MPC/MPC_Tracking.py:280-523``) calls scipy SLSQP
once per timestep, each iteration re-rolling a 30-step Euler bicycle
trajectory in Python — its dominant wall-clock cost, run serially per CSV
(``Distribution.py:143-166``).

TPU-first redesign:

- the same cost — track [theta, v] with Q=diag(20,5), Qf=Q, control-increment
  penalty R=diag(1,50), control-hold beyond the control horizon, box bounds
  |a| ≤ 7, |δ| ≤ 0.5 (``MPC_Tracking.py:304-305,390-394``) — written as a
  residual vector so the solve is projected Levenberg–Marquardt with a FIXED
  iteration count: every step is the same static-shape program,
- bicycle rollout as ``lax.scan`` (no Python in the loop),
- the outer simulation as another ``lax.scan`` over timesteps,
- ``vmap`` over a batch of trajectories: the whole per-scenario validation
  sweep (dozens of CSVs × hundreds of steps × solver iterations) is ONE
  device program.

The SLSQP solver itself is not ported (Python-hostile to XLA and not part
of the behavioral contract); parity is asserted on tracking error bands,
not control sequences (see SURVEY §7.3).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .reference import PathReference


@dataclasses.dataclass(frozen=True)
class MPCConfig:
    # defaults = reference tracking runs (``Distribution.py:94-101``)
    prediction_horizon: int = 30
    control_horizon: int = 20
    dt: float = 0.02
    wheelbase: float = 2.8
    max_steer: float = 0.5
    max_accel: float = 7.0
    # state weights [theta, v]; control-increment weights [Δa, Δδ]
    q: Tuple[float, float] = (20.0, 5.0)
    qf: Tuple[float, float] = (20.0, 5.0)
    r: Tuple[float, float] = (1.0, 50.0)
    # solver: with the warm start, projected LM is fully converged in 2
    # iterations on every scenario corpus (states differ from a 6-iteration
    # run by <1 mm; SLSQP-oracle difference identical at 2/3/6/12 iters) —
    # default 3 keeps one margin iteration; raise for harder cost surfaces
    lm_iters: int = 3
    lm_lambda: float = 1e-3
    # Gauss-Newton with a per-step frozen Jacobian (J evaluated once at the
    # warm start).  Tracking parity vs re-linearizing is ≤1 cm, but on TPU
    # it is NOT faster — the per-step critical path is scan latency, not
    # Jacobian FLOPs (measured: 1.88 s either way for the sce1 corpus) —
    # so the tighter re-linearized solver stays the default.
    freeze_jacobian: bool = False
    # 90° jump-guard semantics (see PathReference.raw_jump_guard): False =
    # published-artifact behavior, True = the in-tree MPC_Tracking.py code
    raw_jump_guard: bool = False

    def __post_init__(self):
        # reference MPCController raises at construction (:300-301); without
        # this, _full_controls would hit an obscure negative-tile trace error
        if self.control_horizon > self.prediction_horizon:
            raise ValueError(
                "control_horizon must be <= prediction_horizon "
                f"({self.control_horizon} > {self.prediction_horizon})"
            )


def _dynamics(cfg: MPCConfig, state, control):
    """Kinematic bicycle [x, y, theta, v]; controls [a, delta] clipped
    (reference ``VehicleModel.dynamics``, ``MPC_Tracking.py:39-64``)."""
    x, y, theta, v = state
    a = jnp.clip(control[0], -cfg.max_accel, cfg.max_accel)
    delta = jnp.clip(control[1], -cfg.max_steer, cfg.max_steer)
    return jnp.array(
        [
            v * jnp.cos(theta),
            v * jnp.sin(theta),
            v * jnp.tan(delta) / cfg.wheelbase,
            a,
        ]
    )


def rollout(cfg: MPCConfig, state0, controls):
    """Explicit-Euler rollout: (4,), (N, 2) → (N+1, 4)."""

    def step(state, u):
        nxt = state + _dynamics(cfg, state, u) * cfg.dt
        return nxt, nxt

    _, states = jax.lax.scan(step, state0, controls)
    return jnp.concatenate([state0[None], states], axis=0)


def _full_controls(cfg: MPCConfig, u):
    """Extend (M, 2) controls to the prediction horizon by holding the last
    input (reference ``solve_mpc`` objective, ``:332-339``)."""
    P, M = cfg.prediction_horizon, cfg.control_horizon
    if P == M:
        return u
    return jnp.concatenate([u, jnp.tile(u[-1:], (P - M, 1))], axis=0)


def _residuals(cfg: MPCConfig, u, state, ref, last_control, du0_w):
    """Weighted residual vector whose sum of squares is the reference cost.

    ``du0_w`` gates the FIRST control-increment row: the reference objective
    sets Δu₀ = 0 when ``last_control is None`` — i.e. the very first solve
    of a simulation pays no Δu penalty on u[0] (``MPC_Tracking.py:356-364``)
    — so the outer loop passes 0.0 there and 1.0 on every later step."""
    states = rollout(cfg, state, _full_controls(cfg, u))
    sq = jnp.sqrt(jnp.array(cfg.q))
    sqf = jnp.sqrt(jnp.array(cfg.qf))
    w = jnp.concatenate(
        [jnp.tile(sq[None], (cfg.prediction_horizon, 1)), sqf[None]], axis=0
    )
    track_res = (states[:, 2:4] - ref) * w  # (P+1, 2)

    prev = jnp.concatenate([last_control[None], u[:-1]], axis=0)
    du_w = jnp.ones(cfg.control_horizon).at[0].set(du0_w)
    du_res = (u - prev) * jnp.sqrt(jnp.array(cfg.r)) * du_w[:, None]  # (M, 2)
    return jnp.concatenate([track_res.ravel(), du_res.ravel()])


def _clip_u(cfg: MPCConfig, u):
    lo = jnp.array([-cfg.max_accel, -cfg.max_steer])
    hi = jnp.array([cfg.max_accel, cfg.max_steer])
    return jnp.clip(u, lo, hi)


def _solve(cfg: MPCConfig, state, ref, last_control, u_init, du0_w):
    """Projected Levenberg–Marquardt with a fixed iteration count.

    The problem is 2M-dimensional (≤ 40), smooth inside the box, so a
    dense-normal-equation LM step is tiny; projection enforces the bounds
    the reference gives SLSQP.  Fixed iterations keep the program static.
    """
    M2 = cfg.control_horizon * 2

    def res_flat(u_flat):
        return _residuals(
            cfg, u_flat.reshape(cfg.control_horizon, 2), state, ref,
            last_control, du0_w,
        )

    jac = jax.jacfwd(res_flat)

    # one LM body; only the Jacobian provider differs between the
    # re-linearized default and the frozen-J Gauss-Newton variant
    if cfg.freeze_jacobian:
        J0 = jac(u_init.ravel())
        get_J = lambda _: J0  # noqa: E731
    else:
        get_J = jac

    def body(carry, _):
        u_flat, lam = carry
        r = res_flat(u_flat)
        J = get_J(u_flat)
        H = J.T @ J + lam * jnp.eye(M2)
        g = J.T @ r
        step = -jnp.linalg.solve(H, g)
        u_trial = _clip_u(cfg, (u_flat + step).reshape(-1, 2)).ravel()
        cost0 = jnp.sum(r**2)
        cost1 = jnp.sum(res_flat(u_trial) ** 2)
        accept = cost1 < cost0
        u_next = jnp.where(accept, u_trial, u_flat)
        lam_next = jnp.clip(
            jnp.where(accept, lam * 0.5, lam * 4.0), 1e-8, 1e4
        )
        return (u_next, lam_next), None

    (u_flat, _), _ = jax.lax.scan(
        body, (u_init.ravel(), jnp.asarray(cfg.lm_lambda)), None, length=cfg.lm_iters
    )
    return u_flat.reshape(cfg.control_horizon, 2)


def _simulate(cfg: MPCConfig, state0, refs, last_control0):
    """Track one trajectory: refs (num_steps, P+1, 2) → states, controls.

    Mirrors the reference loop (``PathTracker.step``/``run_simulation``,
    ``:454-523``): solve, apply the first control, Euler-integrate; warm
    start row 0 of the next solve with the last applied control."""

    def step(carry, ref):
        state, last_control, du0_w = carry
        u0 = jnp.zeros((cfg.control_horizon, 2)).at[0].set(last_control)
        u = _solve(cfg, state, ref, last_control, u0, du0_w)
        control = u[0]
        nxt = state + _dynamics(cfg, state, control) * cfg.dt
        return (nxt, control, jnp.asarray(1.0)), (nxt, control)

    # du0_w = 0 on the first step: the reference's objective skips the Δu
    # penalty while last_control is None (first solve of a simulation)
    (_, _, _), (states, controls) = jax.lax.scan(
        step, (state0, last_control0, jnp.asarray(0.0)), refs
    )
    states = jnp.concatenate([state0[None], states], axis=0)
    return states, controls


@functools.partial(jax.jit, static_argnames=("cfg",))
def _simulate_jit(cfg: MPCConfig, state0, refs, last_control0):
    return _simulate(cfg, state0, refs, last_control0)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _simulate_batch_jit(cfg: MPCConfig, states0, refs, last_controls0):
    return jax.vmap(lambda s, r, lc: _simulate(cfg, s, r, lc))(
        states0, refs, last_controls0
    )


def _initial_tracker_state(initial_state: np.ndarray) -> np.ndarray:
    """[x, y, theta, vx, vy] → [x, y, theta, |v|] with the −2.8 rad wrap
    (reference ``PathTracker.__init__``, ``:435-439``)."""
    s = np.asarray(initial_state, float).copy()
    if s[2] < -2.8:
        s[2] += 2 * np.pi
    speed = float(np.hypot(s[3], s[4]))
    return np.array([s[0], s[1], s[2], speed])


def track(
    waypoints: np.ndarray,
    initial_state: np.ndarray,
    cfg: MPCConfig = MPCConfig(),
    total_time: float | None = None,
):
    """Track one waypoint path.  Returns (times, states (N+1,4), controls (N,2)).

    ``total_time`` defaults to the last waypoint time (the reference's batch
    driver, ``Distribution.py:104``)."""
    ref = PathReference(
        np.asarray(waypoints, float), np.asarray(initial_state, float),
        raw_jump_guard=cfg.raw_jump_guard,
    )
    if total_time is None:
        total_time = float(waypoints[-1, 2])
    num_steps = int(total_time / cfg.dt)
    refs = ref.build(num_steps, cfg.prediction_horizon, cfg.dt)
    state0 = _initial_tracker_state(initial_state)
    states, controls = _simulate_jit(
        cfg, jnp.asarray(state0), jnp.asarray(refs), jnp.zeros(2)
    )
    times = np.arange(num_steps + 1) * cfg.dt
    return times, np.asarray(states), np.asarray(controls)


def track_batch(
    waypoints_batch: np.ndarray,
    initial_states: np.ndarray,
    cfg: MPCConfig = MPCConfig(),
    mesh=None,
):
    """Track B waypoint paths in one device program.

    Args:
        waypoints_batch: (B, N, 3) [x, y, t] paths.
        initial_states: (B, 5) [x, y, theta, vx, vy].
        mesh: optional ``jax.sharding.Mesh`` — the trajectory batch is
            sharded over the mesh 'data' axis, so a whole scenario's
            validation sweep runs data-parallel across chips.

    Returns:
        (times (S+1,), states (B, S+1, 4), controls (B, S, 2), valid (B,))
        where S = max per-path step count and valid[b] is path b's own step
        count (+1 states) — rows beyond it extrapolate past the path end,
        matching the reference which simply stops there.
    """
    B = waypoints_batch.shape[0]
    path_refs = [
        PathReference(
            np.asarray(waypoints_batch[b], float),
            np.asarray(initial_states[b], float),
            raw_jump_guard=cfg.raw_jump_guard,
        )
        for b in range(B)
    ]
    steps = np.array(
        [int(float(w[-1, 2]) / cfg.dt) for w in waypoints_batch], dtype=np.int64
    )
    # bucket the scan length to a multiple of 64: S depends on the sampled
    # trajectories' time spans, so an exact S would recompile (and re-miss
    # the persistent cache) on almost every z-draw; the extra steps run
    # past each path's end and are sliced off by callers via `steps`
    S = -(-int(steps.max()) // 64) * 64
    refs = np.stack([r.build(S, cfg.prediction_horizon, cfg.dt) for r in path_refs])
    states0 = np.stack([_initial_tracker_state(s) for s in initial_states])
    states0_j = jnp.asarray(states0)
    refs_j = jnp.asarray(refs)
    last0 = jnp.zeros((B, 2))
    if mesh is not None:
        from ..parallel import shard_batch

        states0_j = shard_batch(states0_j, mesh)
        refs_j = shard_batch(refs_j, mesh)
        last0 = shard_batch(last0, mesh)
    states, controls = _simulate_batch_jit(cfg, states0_j, refs_j, last0)
    states, controls = np.asarray(states)[:B], np.asarray(controls)[:B]
    times = np.arange(S + 1) * cfg.dt
    return times, states, controls, steps
