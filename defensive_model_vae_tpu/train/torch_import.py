"""Import reference torch checkpoints (.pth state_dicts).

Migration path for users of the reference codebase: its shipped
``training/models/vae*.pth`` checkpoints (torch ``state_dict`` pickles,
naming convention ``vae[_offset]_<sce>[_cond]_ld<Z>_epoch<E>.pth``) load
directly into this framework's parameter pytree, so existing models keep
working through the new generation/tracking/validation stack.

Layer mapping (reference ``Training_VAE.ConditionalTrajectoryVAE``,
``:118-167`` — sequential indices of the Linear layers):

    condition_encoder.0/.2      → cond_0 / cond_1
    encoder.1/.3/.5/.7          → enc_0..enc_3
    fc_mu / fc_logvar           → fc_mu / fc_logvar
    decoder.0/.2/.4/.6          → dec_0..dec_3

torch Linear stores weight as (out, in); ours is (in, out) — transposed on
import.
"""

from __future__ import annotations

import re
from typing import Tuple

import numpy as np

from ..models import CVAEConfig
from ..models.cvae import Params

_NAME_MAP = {
    "condition_encoder.0": "cond_0",
    "condition_encoder.2": "cond_1",
    "encoder.1": "enc_0",
    "encoder.3": "enc_1",
    "encoder.5": "enc_2",
    "encoder.7": "enc_3",
    "fc_mu": "fc_mu",
    "fc_logvar": "fc_logvar",
    "decoder.0": "dec_0",
    "decoder.2": "dec_1",
    "decoder.4": "dec_2",
    "decoder.6": "dec_3",
}


def load_torch_checkpoint(path: str) -> Tuple[Params, CVAEConfig]:
    """Load a reference .pth state_dict → (params, model config)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    params: Params = {}
    for torch_name, ours in _NAME_MAP.items():
        w = state[f"{torch_name}.weight"].numpy()
        b = state[f"{torch_name}.bias"].numpy()
        params[ours] = {
            "w": np.ascontiguousarray(w.T, np.float32),
            "b": np.asarray(b, np.float32),
        }

    latent_dim = params["fc_mu"]["w"].shape[1]
    hidden_dim = params["cond_0"]["w"].shape[1]
    flat = params["enc_0"]["w"].shape[0]
    out_flat = params["dec_3"]["w"].shape[1]
    assert flat == out_flat, "encoder/decoder dims disagree"
    # infer (seq_len, dim): the reference always uses dim=3
    dim = 3 if flat % 3 == 0 else 2
    cfg = CVAEConfig(
        seq_len=flat // dim,
        dim=dim,
        latent_dim=latent_dim,
        hidden_dim=hidden_dim,
        cond_dim=params["cond_0"]["w"].shape[0],
    )
    return params, cfg


def import_to_checkpoint(pth_path: str, out_dir: str) -> str:
    """Convert a .pth into a native checkpoint directory.

    The reference encodes the coordinate mode in the filename:
    ``vae_offset_*`` models decode relative [t, dx, dy] (shifted by the
    start condition at generation time), plain ``vae_*`` legacy models
    decode absolute [t, x, y].  Recorded as ``offset_mode`` in the
    manifest; ``generate.load_and_generate`` honors it.
    """
    from .checkpoint import save_checkpoint

    params, cfg = load_torch_checkpoint(pth_path)
    m = re.search(r"sce[1-4]", str(pth_path))
    scenario = m.group(0) if m else None
    offset_mode = "offset" in str(pth_path)
    return save_checkpoint(
        out_dir, params, cfg, scenario,
        extra_manifest={
            "imported_from": str(pth_path),
            "offset_mode": offset_mode,
        },
    )
