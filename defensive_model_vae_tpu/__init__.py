"""defensive-model-vae-tpu: TPU-native defensive-driving trajectory framework.

A from-scratch JAX/XLA/Pallas/pjit re-design with the capabilities of the
reference defensive-driver CVAE codebase: data pipeline over the four CARLA
scenarios, conditional trajectory VAE (train / generate), batched MPC path
tracking, distribution & spatial validation metrics, SUT testing with the
DNDA drivable-area/risk metric, and visualization.
"""

__version__ = "0.1.0"

# persistent XLA compilation cache for every entry point — cold compiles
# through the axon remote-compile tunnel cost minutes per program shape;
# the committed .jax_cache makes them one-time (DEFVAE_NO_JAX_CACHE=1 to
# opt out)
from .utils.cache import enable_persistent_cache as _enable_cache

_enable_cache()

from . import scenarios
from .models import CVAEConfig
from .generate import generate_trajectories, load_and_generate

__all__ = [
    "scenarios",
    "CVAEConfig",
    "generate_trajectories",
    "load_and_generate",
]
