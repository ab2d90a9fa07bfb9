"""defensive-model-vae-tpu: TPU-native defensive-driving trajectory framework.

A from-scratch JAX/XLA/Pallas/pjit re-design with the capabilities of the
reference defensive-driver CVAE codebase: data pipeline over the four CARLA
scenarios, conditional trajectory VAE (train / generate), batched MPC path
tracking, distribution & spatial validation metrics, SUT testing with the
DNDA drivable-area/risk metric, and visualization.
"""

__version__ = "0.1.0"

from . import scenarios
from .models import CVAEConfig
from .generate import generate_trajectories, load_and_generate

__all__ = [
    "scenarios",
    "CVAEConfig",
    "generate_trajectories",
    "load_and_generate",
]
