from .reference import PathReference
from .mpc import MPCConfig, track, track_batch, rollout

__all__ = ["PathReference", "MPCConfig", "track", "track_batch", "rollout"]
