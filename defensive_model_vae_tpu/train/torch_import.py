"""Import/export reference torch checkpoints (.pth state_dicts).

Migration path for users of the reference codebase, both directions: its
shipped ``training/models/vae*.pth`` checkpoints (torch ``state_dict``
pickles, naming convention ``vae[_offset]_<sce>[_cond]_ld<Z>_epoch<E>.pth``)
load directly into this framework's parameter pytree, so existing models
keep working through the new generation/tracking/validation stack — and
checkpoints trained here export back to the same format
(:func:`export_to_pth`), so models trained fast on TPU keep working
through existing torch tooling.

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

import os
import re
from typing import Optional, Tuple

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


def load_torch_checkpoint(
    path: str, dim: Optional[int] = None
) -> Tuple[Params, CVAEConfig]:
    """Load a reference .pth state_dict → (params, model config).

    ``dim`` disambiguates the flattened trajectory width when needed: the
    state_dict only exposes ``seq_len * dim``, and a dim=2 model whose
    ``2*seq_len`` happens to be divisible by 3 (e.g. the legacy (6, 2)
    window family, flat=12) is indistinguishable from a dim=3 one.  The
    default heuristic assumes dim=3 when divisible (every shipped
    ``vae*_<sce>`` checkpoint is [t, x, y]); pass ``dim=2`` explicitly
    for non-time windows."""
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
    if dim is None:
        dim = 3 if flat % 3 == 0 else 2
    elif flat % dim:
        raise ValueError(
            f"flat width {flat} is not divisible by requested dim={dim}"
        )
    cfg = CVAEConfig(
        seq_len=flat // dim,
        dim=dim,
        latent_dim=latent_dim,
        hidden_dim=hidden_dim,
        cond_dim=params["cond_0"]["w"].shape[0],
    )
    return params, cfg


def import_to_checkpoint(
    pth_path: str, out_dir: str, dim: Optional[int] = None
) -> str:
    """Convert a .pth into a native checkpoint directory.

    The reference encodes the coordinate mode in the FILENAME:
    ``vae_offset_*`` models decode relative [t, dx, dy] (shifted by the
    start condition at generation time), plain ``vae_*`` legacy models
    decode absolute [t, x, y].  Recorded as ``offset_mode`` in the
    manifest; ``generate.load_and_generate`` honors it.  Both the offset
    marker and the scenario id are parsed from the basename only — a
    directory named ``offset_experiments/`` or ``sce2_backup/`` must not
    leak into the manifest — and the scenario pattern comes from the
    registry, never a hardcoded id list.
    """
    from .checkpoint import save_checkpoint
    from .. import scenarios

    params, cfg = load_torch_checkpoint(pth_path, dim=dim)
    base = os.path.basename(str(pth_path))
    # digit-boundary anchors: an UNREGISTERED 'sce10' in the filename must
    # yield scenario=None, not substring-match the registered 'sce1'
    # (longest-first only helps when the longer key is itself registered)
    pat = (
        r"(?<!\d)(?:"
        + "|".join(
            re.escape(k)
            for k in sorted(scenarios.REGISTRY, key=len, reverse=True)
        )
        + r")(?!\d)"
    )
    m = re.search(pat, base)
    scenario = m.group(0) if m else None
    offset_mode = "offset" in base
    return save_checkpoint(
        out_dir, params, cfg, scenario,
        extra_manifest={
            "imported_from": str(pth_path),
            "offset_mode": offset_mode,
        },
    )


def export_to_pth(ckpt_dir: str, pth_path: str) -> str:
    """Convert a native checkpoint directory back into a reference-format
    torch ``.pth`` state_dict — the inverse of :func:`import_to_checkpoint`.

    Completes the migration round-trip: a model trained here (fast, on
    TPU) ``load_state_dict``s strictly into the reference's own
    ``ConditionalTrajectoryVAE`` (``Training_VAE.py:118-167``) constructed
    with this checkpoint's ``(seq_len, dim, latent_dim, hidden_dim)``, so
    existing torch tooling keeps working.  Weights are transposed back to
    torch's ``(out, in)`` layout; tensors are saved as plain f32 so the
    file loads under ``torch.load(weights_only=True)``.

    Only the reference MLP family exports — a Conv1D checkpoint has no
    reference-class equivalent (clear error).  Note the reference class
    hardcodes its condition width to 2 (``nn.Linear(2, hidden_dim)``,
    ``Training_VAE.py:133``): a conditioned variant (cond_dim > 2) exports
    a valid state_dict but needs a correspondingly widened torch class on
    the consuming side.
    """
    import torch

    from .checkpoint import load_checkpoint

    params, _, _ = load_checkpoint(ckpt_dir)
    missing = [ours for ours in _NAME_MAP.values() if ours not in params]
    if missing:
        raise ValueError(
            f"checkpoint {ckpt_dir!r} is not a reference-family MLP CVAE "
            f"(missing layers {missing}); only models/cvae.py checkpoints "
            "export to the reference .pth format"
        )
    state = {}
    for torch_name, ours in _NAME_MAP.items():
        layer = params[ours]
        state[f"{torch_name}.weight"] = torch.from_numpy(
            np.ascontiguousarray(np.asarray(layer["w"], np.float32).T)
        )
        state[f"{torch_name}.bias"] = torch.from_numpy(
            np.asarray(layer["b"], np.float32).copy()
        )
    torch.save(state, pth_path)
    return str(pth_path)
