from .reference import PathReference
from .mpc import MPCConfig, track, track_batch, rollout
from .linear_mpc import LinearMPCConfig, solve_ltv_qp, simulate_tracking, sine_road_demo
from .device_reference import build_reference_device, make_serve_fn, notaknot_coeffs, cubic_eval

__all__ = ["PathReference", "MPCConfig", "track", "track_batch", "rollout",
           "LinearMPCConfig", "solve_ltv_qp", "simulate_tracking", "sine_road_demo",
           "build_reference_device", "make_serve_fn"]
