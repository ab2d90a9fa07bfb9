"""Device-side reference construction — the fully-jitted serving path.

``control.reference.PathReference`` builds the MPC reference tensor on the
host with scipy (exact reference parity; ~3 ms per path).  For *serving* —
one request in, one tracked trajectory out, no host orchestration — this
module re-implements the same construction in pure JAX so that

    decode(z, c) → waypoints → reference tensor → MPC scan

compiles into ONE device program (see :func:`make_serve_fn`).

The cubic interpolant is scipy ``interp1d(kind='cubic')``'s not-a-knot
C² cubic, obtained by solving the (small, dense) second-derivative system
with not-a-knot end conditions — at seq_len=10 knots a 10×10
``jnp.linalg.solve`` per path.  All the reference heuristics are
replicated: knot-diff velocity spline seeded with the initial velocity,
the −2.8 rad wrap, the 45° end-velocity scan (fixed 1 ms grid, masked
past the path end), the 90° jump guard, constant-velocity extrapolation,
and the per-window low-speed heading hold.  Parity with the host
implementation is asserted in tests to ~1e-6 (the scan-grid boundary can
differ by one 1 ms sample).

Requires ≥ 4 waypoints (cubic regime — always true for the generated
seq_len=10 paths); shorter paths use the host implementation.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

_WRAP_LIMIT = -2.8
_SCAN_DT = 1e-3
# The 45° end-velocity heading scan needs a STATIC grid on device (the
# host twin scans arange(0, t_end+1e-3), data-dependent); the window is
# `scan_seconds` (default 20 s; decoded trajectories run ~11 s), masked to
# t_end.  For t_end beyond the window, jumps past it are invisible and the
# end velocity silently falls back to the plain end value — raise
# `scan_seconds` in build_reference_device if paths can be longer.


def _wrap(theta):
    return jnp.where(theta >= _WRAP_LIMIT, theta, theta + 2 * jnp.pi)


def notaknot_coeffs(t: jax.Array, y: jax.Array):
    """Second derivatives M of the not-a-knot C² cubic through (t, y).

    Interior rows: h_{i-1}/6 M_{i-1} + (h_{i-1}+h_i)/3 M_i + h_i/6 M_{i+1}
                   = Δslope_i
    End rows: third-derivative continuity at the first/last interior knot.
    Dense solve — n is tiny (the waypoint count).
    """
    n = t.shape[0]
    h = jnp.diff(t)
    slope = jnp.diff(y) / h

    A = jnp.zeros((n, n))
    b = jnp.zeros(n)
    i = jnp.arange(1, n - 1)
    A = A.at[i, i - 1].set(h[:-1] / 6.0)
    A = A.at[i, i].set((h[:-1] + h[1:]) / 3.0)
    A = A.at[i, i + 1].set(h[1:] / 6.0)
    b = b.at[i].set(slope[1:] - slope[:-1])
    # not-a-knot: (M1 − M0)/h0 = (M2 − M1)/h1 and mirrored at the end
    A = A.at[0, 0].set(1.0 / h[0])
    A = A.at[0, 1].set(-(1.0 / h[0] + 1.0 / h[1]))
    A = A.at[0, 2].set(1.0 / h[1])
    A = A.at[n - 1, n - 3].set(1.0 / h[n - 3])
    A = A.at[n - 1, n - 2].set(-(1.0 / h[n - 3] + 1.0 / h[n - 2]))
    A = A.at[n - 1, n - 1].set(1.0 / h[n - 2])
    M = jnp.linalg.solve(A, b)
    return M


def cubic_eval(t: jax.Array, y: jax.Array, M: jax.Array, q: jax.Array):
    """Evaluate the C² cubic (and extrapolate with the end cubics)."""
    n = t.shape[0]
    idx = jnp.clip(jnp.searchsorted(t, q, side="right") - 1, 0, n - 2)
    h = t[idx + 1] - t[idx]
    a = (t[idx + 1] - q) / h
    bfrac = (q - t[idx]) / h
    return (
        a * y[idx]
        + bfrac * y[idx + 1]
        + ((a**3 - a) * M[idx] + (bfrac**3 - bfrac) * M[idx + 1]) * h**2 / 6.0
    )


def build_reference_device(
    waypoints: jax.Array,
    initial_state: jax.Array,
    num_steps: int,
    horizon: int,
    dt: float,
    scan_seconds: float = 20.0,
) -> jax.Array:
    """JAX twin of ``PathReference.build``: (num_steps, horizon+1, 2)
    [theta_ref, v_ref].

    Args:
        waypoints: (N, 3) [x, y, t] with t strictly increasing, N ≥ 4.
        initial_state: (5,) [x, y, theta, vx, vy].
        scan_seconds: static length of the 45° heading scan window — must
            cover the longest possible path duration (see ``_MAX_SCAN``).
    """
    t = waypoints[:, 2]
    x = waypoints[:, 0]
    y = waypoints[:, 1]
    t_end = t[-1]

    # the [theta, v] reference tensor needs only the VELOCITY splines —
    # positions never enter it (PathReference.build reads none either)

    # velocity knots: diffs of the interpolant at the knots (= data diffs)
    h = jnp.diff(t)
    h = jnp.where(h == 0, 1e-6, h)
    vx_k = jnp.concatenate([initial_state[3:4], jnp.diff(x) / h])
    vy_k = jnp.concatenate([initial_state[4:5], jnp.diff(y) / h])
    t_vel = jnp.concatenate([jnp.zeros(1), t[:-1] + jnp.diff(t) / 2])
    Mvx = notaknot_coeffs(t_vel, vx_k)
    Mvy = notaknot_coeffs(t_vel, vy_k)

    def v_at(q):
        return cubic_eval(t_vel, vx_k, Mvx, q), cubic_eval(t_vel, vy_k, Mvy, q)

    start_vx, start_vy = v_at(t[0])
    start_theta = _wrap(jnp.arctan2(start_vy, start_vx))

    # end-velocity heuristic: first heading jump > 45° on the 1 ms grid
    n_scan = int(round(scan_seconds / _SCAN_DT)) + 1
    scan_t = jnp.arange(n_scan) * _SCAN_DT
    in_range = scan_t <= t_end + _SCAN_DT  # reference grid includes t_end
    svx, svy = v_at(scan_t)
    th_scan = _wrap(jnp.arctan2(svy, svx))
    jumped = (jnp.abs(th_scan - start_theta) > jnp.deg2rad(45.0)) & in_range
    any_jump = jumped.any()
    t_mid = (t[-1] + t[-2]) / 2
    mid_vx, mid_vy = v_at(t_mid)
    end_vx_plain, end_vy_plain = v_at(t_end)
    end_vx = jnp.where(any_jump, mid_vx, end_vx_plain)
    end_vy = jnp.where(any_jump, mid_vy, end_vy_plain)
    end_theta = _wrap(jnp.arctan2(end_vy, end_vx))

    # reference values over the full clock grid
    grid_t = jnp.arange(num_steps + horizon + 1) * dt
    inside = grid_t <= t_end
    ti = jnp.where(inside, grid_t, t_end)
    vx_g, vy_g = v_at(ti)
    vx_g = jnp.where(inside, vx_g, end_vx)
    vy_g = jnp.where(inside, vy_g, end_vy)
    # 90° jump guard with the published-artifact (wrapped) semantics — the
    # host twin's PathReference.raw_jump_guard docstring documents the
    # in-tree-vs-artifact inconsistency this mirrors
    theta_g = _wrap(jnp.arctan2(vy_g, vx_g))
    jump = inside & (jnp.abs(theta_g - start_theta) > jnp.pi / 2)
    vx_g = jnp.where(jump, end_vx, vx_g)
    vy_g = jnp.where(jump, end_vy, vy_g)
    v_g = jnp.hypot(vx_g, vy_g)
    theta_g = _wrap(jnp.arctan2(vy_g, vx_g))
    theta_g = jnp.where(grid_t > t_end, end_theta, theta_g)

    # windows + low-speed heading hold (forward fill within each row)
    idx = jnp.arange(num_steps)[:, None] + jnp.arange(horizon + 1)[None, :]
    v_win = v_g[idx]
    th_win = theta_g[idx]
    valid = v_win >= 0.1

    def ffill(carry, col):
        th_col, ok = col
        held = jnp.where(ok, th_col, carry)
        return held, held

    init = jnp.zeros(num_steps)
    _, th_held = jax.lax.scan(ffill, init, (th_win.T, valid.T))
    return jnp.stack([th_held.T, v_win], axis=-1)


_N_DRAWS = 8  # z candidates per serve request (degenerate-sample redraw)


def select_valid_trajectory(trajs: jax.Array) -> jax.Array:
    """Pick the first of K candidate decodes whose time column is strictly
    increasing after the t₀ := 0 zeroing; monotone-repair the first
    candidate when none is.

    Device twin of ``pipeline.generate_and_track``'s host redraw loop (the
    reference skips failed CSVs, ``Distribution.py:109-111``): serving
    cannot drop a request, and a non-monotone time column would make the
    not-a-knot system singular and return NaN states with no error (the
    host ``PathReference`` raises for the same input).  The repair path is
    the identity for any valid draw, so parity is untouched.

    Args:
        trajs: (K, T, 3) candidate [t, x, y] decodes.

    Returns:
        (T, 3) selected trajectory with a strictly increasing, zero-based
        time column.
    """
    trajs = jnp.asarray(trajs)
    t0z = trajs[:, :, 0].at[:, 0].set(0.0)
    ok = jnp.all(jnp.diff(t0z, axis=1) > 0, axis=1)
    pick = jnp.argmax(ok)  # first True; 0 when none
    traj = trajs[pick]
    t = t0z[pick]
    # last-resort repair: running max + 1 ms ramp (identity when `ok` hit)
    repaired = jax.lax.cummax(t) + jnp.arange(t.shape[0]) * 1e-3
    t = jnp.where(ok.any(), t, repaired)
    return jnp.stack([t, traj[:, 1], traj[:, 2]], axis=1)


def make_serve_fn(params, model_cfg, mpc_cfg, num_steps: int,
                  offset_mode: bool = True, mesh=None):
    """One jitted program: condition → sample → reference → MPC track.

    Returns ``serve(key, start_xy, initial_state) → (states, controls)``
    where ``start_xy`` is (B, 2) and ``initial_state`` (B, 5); the whole
    request executes on-device with no host round-trips.

    ``offset_mode=False`` serves legacy non-offset checkpoints, whose
    decoder emits absolute [t, x, y] that must NOT be shifted by the start
    point (mirrors ``generate.load_and_generate``'s manifest handling).

    ``mesh`` shards the request batch over the mesh ``data`` axis (params
    and the request key replicated, per-request keys derived inside the
    program) — the batch-512 throughput path IS the data-parallel width
    argument, so the serving program must scale across chips exactly like
    training/MPC/DNDA do.  Requests are independent; sharding cannot change
    the math (asserted in ``__graft_entry__.dryrun_multichip``).  B must be
    a multiple of the data-axis size.
    """
    if getattr(mpc_cfg, "raw_jump_guard", False):
        # the device reference implements only the wrapped (published-
        # artifact) jump-guard semantics; silently serving a raw-guard
        # config would return different trajectories than track() for the
        # identical config on westbound paths
        raise ValueError(
            "make_serve_fn implements the wrapped jump-guard only; "
            "raw_jump_guard=True (the in-tree differential-test variant) "
            "is host-path-only — use control.track/track_batch"
        )
    from ..models import sample
    from ..models.cvae import decode, encode_condition
    from .mpc import _simulate

    P = mpc_cfg.prediction_horizon

    def _decode_one(key, start_xy):
        if offset_mode:
            return sample(params, key, start_xy[None], model_cfg)[0]  # (T, 3)
        z = jax.random.normal(
            key, (1, model_cfg.latent_dim), jnp.float32
        )
        return decode(params, z, encode_condition(params, start_xy[None]),
                      model_cfg)[0]

    def one(key, start_xy, init_state):
        keys = jax.random.split(key, _N_DRAWS)
        trajs = jax.vmap(_decode_one, in_axes=(0, None))(keys, start_xy)
        traj = select_valid_trajectory(trajs)
        wp = jnp.stack([traj[:, 1], traj[:, 2], traj[:, 0]], axis=1)
        refs = build_reference_device(wp, init_state, num_steps, P, mpc_cfg.dt)
        # [x, y, theta, |v|] with the −2.8 wrap (host helper's device twin)
        theta = init_state[2]
        theta = jnp.where(theta < -2.8, theta + 2 * jnp.pi, theta)
        state0 = jnp.array(
            [init_state[0], init_state[1], theta,
             jnp.hypot(init_state[3], init_state[4])]
        )
        return _simulate(mpc_cfg, state0, refs, jnp.zeros(2))

    def _serve(key, start_xy, initial_states):
        keys = jax.random.split(key, start_xy.shape[0])
        return jax.vmap(one)(keys, start_xy, initial_states)

    if mesh is None:
        return jax.jit(_serve)

    from jax.sharding import NamedSharding, PartitionSpec

    data = NamedSharding(mesh, PartitionSpec("data"))
    repl = NamedSharding(mesh, PartitionSpec())
    return jax.jit(
        _serve,
        in_shardings=(repl, data, data),
        out_shardings=(data, data),
    )
