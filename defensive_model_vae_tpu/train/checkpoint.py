"""Checkpointing with an explicit manifest.

The reference encodes checkpoint identity in the filename
(``vae[_offset]_<sce>[_cond]_ld8_epoch3000.pth``) and parses it back by
substring matching (SURVEY §5).  Here a checkpoint is a directory holding

- ``params.npz``     — flattened parameter pytree
- ``manifest.json``  — model config, scenario key, train config, metadata

so identity is data, not filename convention.  Optimizer state can be
included for resumable training (the reference saves weights only,
``Training_VAE.py:393``).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import CVAEConfig


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    tree: Dict[str, Any] = {}
    for path, arr in flat.items():
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return tree


def save_checkpoint(
    directory: str,
    params,
    model_cfg: CVAEConfig,
    scenario: Optional[str] = None,
    history: Optional[Dict[str, np.ndarray]] = None,
    extra_manifest: Optional[Dict[str, Any]] = None,
    backend: str = "npz",
) -> str:
    """Save a checkpoint under ``directory``.

    ``backend="npz"`` (default): single-file flattened pytree — complete
    for this model family's sizes.  ``backend="orbax"``: Orbax
    StandardCheckpointer under ``directory/orbax`` — sharded/async-capable
    saving for sharded ``jax.Array`` params if corpora ever grow; the
    manifest (identity as data, not filename convention) is the same for
    both backends and ``load_checkpoint`` auto-detects.
    """
    os.makedirs(directory, exist_ok=True)
    npz_path = os.path.join(directory, "params.npz")
    orbax_path = os.path.join(os.path.abspath(directory), "orbax")
    if backend == "orbax":
        import shutil

        import orbax.checkpoint as ocp

        if os.path.exists(orbax_path):
            shutil.rmtree(orbax_path)  # orbax refuses to overwrite in place
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(orbax_path, params)
        # a stale params.npz from an earlier npz save would shadow the new
        # weights on load — remove it so the directory has ONE params store
        if os.path.exists(npz_path):
            os.remove(npz_path)
    elif backend == "npz":
        params = jax.device_get(params)
        np.savez(npz_path, **_flatten(params))
        if os.path.isdir(orbax_path):
            import shutil

            shutil.rmtree(orbax_path)
    else:
        raise ValueError(f"unknown checkpoint backend {backend!r}")
    manifest = {
        "format_version": 1,
        "model_config": dataclasses.asdict(model_cfg),
        "scenario": scenario,
        "backend": backend,
    }
    if extra_manifest:
        manifest.update(extra_manifest)
    with open(os.path.join(directory, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    hist_path = os.path.join(directory, "history.npz")
    if history is not None:
        np.savez(hist_path, **{k: np.asarray(v) for k, v in history.items()})
    elif os.path.exists(hist_path):
        # same staleness rule as the params stores above: re-saving without
        # history (e.g. `defvae import` over a trained directory) must not
        # leave a previous run's loss curves attributed to the new weights
        os.remove(hist_path)
    return directory


def load_checkpoint(directory: str) -> Tuple[Dict, Any, Dict[str, Any]]:
    """→ (params, model config, manifest).  The config is a ``CVAEConfig``
    or — detected by the manifest's conv-only fields — a ``ConvCVAEConfig``."""
    with open(os.path.join(directory, "manifest.json")) as f:
        manifest = json.load(f)
    npz_path = os.path.join(directory, "params.npz")
    orbax_path = os.path.join(os.path.abspath(directory), "orbax")
    # the manifest's backend is authoritative (a stale params store from an
    # earlier save with the other backend must never shadow it); manifests
    # from before the orbax backend have no "backend" key → file detection
    backend = manifest.get("backend")
    use_npz = backend == "npz" or (backend is None and os.path.exists(npz_path))
    if use_npz:
        with np.load(npz_path) as z:
            params = _unflatten({k: z[k] for k in z.files})
    elif backend == "orbax" or os.path.isdir(orbax_path):
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            params = ckptr.restore(orbax_path)
    else:
        raise FileNotFoundError(f"no params.npz or orbax/ under {directory}")
    mc = dict(manifest["model_config"])
    if "channels" in mc:
        # a Conv1D checkpoint (models/conv_cvae.py): the manifest carries
        # its extra fields; JSON stores the channels tuple as a list
        from ..models import ConvCVAEConfig

        mc["channels"] = tuple(mc["channels"])
        model_cfg: Any = ConvCVAEConfig(**mc)
    else:
        model_cfg = CVAEConfig(**mc)
    return params, model_cfg, manifest


def require_cvae_config(model_cfg, purpose: str) -> CVAEConfig:
    """Guard for MLP-CVAE-only consumers of :func:`load_checkpoint`.

    ``load_checkpoint`` can return a ``ConvCVAEConfig``; feeding one into
    the MLP generation/serving stack would crash mid-jit-trace with a raw
    ``KeyError: 'cond_0'`` (conv params are conv_0/deconv_0 layers).  Fail
    at the boundary with the reason instead."""
    if not isinstance(model_cfg, CVAEConfig):
        raise TypeError(
            f"{purpose} supports the MLP CVAE family only; this checkpoint "
            f"is a {type(model_cfg).__name__} (use the models/conv_cvae.py "
            "APIs for Conv1D checkpoints)"
        )
    return model_cfg


def save_opt_state(directory: str, opt_state) -> str:
    """Persist Adam state (count, mu, nu) for resumable training."""
    adam = opt_state[0]  # optax.adam = chain(scale_by_adam, scale)
    flat = {"count": np.asarray(adam.count)}
    flat.update(_flatten(jax.device_get(adam.mu), "mu/"))
    flat.update(_flatten(jax.device_get(adam.nu), "nu/"))
    np.savez(os.path.join(directory, "opt_state.npz"), **flat)
    return directory


def load_opt_state(directory: str, params, optimizer):
    """Rebuild the optax state saved by :func:`save_opt_state`."""
    path = os.path.join(directory, "opt_state.npz")
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        count = z["count"]
        mu = _unflatten({k[3:]: z[k] for k in z.files if k.startswith("mu/")})
        nu = _unflatten({k[3:]: z[k] for k in z.files if k.startswith("nu/")})
    state = optimizer.init(params)
    adam = state[0]._replace(
        count=jnp.asarray(count),
        mu=jax.tree_util.tree_map(jnp.asarray, mu),
        nu=jax.tree_util.tree_map(jnp.asarray, nu),
    )
    return (adam,) + tuple(state[1:])


def load_history(directory: str) -> Optional[Dict[str, np.ndarray]]:
    path = os.path.join(directory, "history.npz")
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        return {k: z[k] for k in z.files}
