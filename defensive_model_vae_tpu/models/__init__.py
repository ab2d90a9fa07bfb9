from .cvae import (
    CVAEConfig,
    init_params,
    encode,
    decode,
    reparameterize,
    forward,
    sample,
    to_relative,
)
from .losses import cvae_loss, LossWeights
from .conv_cvae import ConvCVAEConfig, init_conv_params, conv_forward, conv_sample

__all__ = [
    "CVAEConfig",
    "init_params",
    "encode",
    "decode",
    "reparameterize",
    "forward",
    "sample",
    "to_relative",
    "cvae_loss",
    "LossWeights",
    "ConvCVAEConfig",
    "init_conv_params",
    "conv_forward",
    "conv_sample",
]
