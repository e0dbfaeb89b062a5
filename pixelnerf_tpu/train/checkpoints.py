"""Model weight persistence (the ``pixel_nerf_latest`` scheme) + torch import.

Mirrors the upstream checkpoint layout (models.py.backup2:284-332):
``checkpoints/<exp>/pixel_nerf_latest`` (+ ``pixel_nerf_init`` warm start and a
``pixel_nerf_backup`` copy written before overwrite).  Files here are flax
msgpack; a torch file at the same path is detected and converted on the fly
(utils.torch_convert), so reference-trained checkpoints drop in.

Full trainer state (optimizer, schedules, epoch counters) uses the epoch-based
manager in :mod:`pixelnerf_tpu.train.trainer`.
"""

from __future__ import annotations

import os
import shutil
import warnings
from typing import Optional

import flax.serialization
import numpy as np


def _is_torch_file(path: str) -> bool:
    """torch>=1.6 checkpoints are zip archives; legacy ones are pickles."""
    try:
        with open(path, "rb") as f:
            magic = f.read(4)
        return magic[:2] == b"PK" or magic[:2] == b"\x80\x02" or magic[:1] == b"\x80"
    except OSError:
        return False


def save_model(path: str, variables: dict, backup: bool = True) -> None:
    """Serialize a model variables pytree to `path` (msgpack)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if backup and os.path.exists(path):
        shutil.copyfile(path, path + "_backup")  # backup2:324-331 defense
    data = flax.serialization.to_bytes(
        {"format": "pixelnerf_tpu.v1", "variables": variables}
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_model(path: str, target_variables: Optional[dict] = None) -> dict:
    """Load model variables from a native msgpack file or a torch checkpoint."""
    if _is_torch_file(path):
        from ..utils import torch_convert

        sd = torch_convert.load_torch_checkpoint(path)
        converted = torch_convert.convert_pixelnerf(sd)
        if target_variables is not None:
            problems = torch_convert.tree_shapes_match(
                _np_tree(converted["params"]),
                _np_tree(flax.serialization.to_state_dict(target_variables)["params"]),
            )
            real = [p for p in problems if p[1] != "extra-in-converted"]
            if real:
                warnings.warn(
                    f"Converted torch checkpoint differs from model: {real[:10]}"
                )
        return converted
    with open(path, "rb") as f:
        data = f.read()
    if target_variables is not None:
        restored = flax.serialization.from_bytes(
            {"format": "", "variables": target_variables}, data
        )
    else:
        restored = flax.serialization.msgpack_restore(data)
    return restored["variables"]


def _np_tree(tree):
    import jax

    return jax.tree.map(np.asarray, tree)


def checkpoint_path(args, ckpt_name: str = "pixel_nerf_latest") -> str:
    return os.path.join(args.checkpoints_path, args.name, ckpt_name)


def load_weights(
    args,
    variables: dict,
    opt_init: bool = False,
    device=None,
) -> dict:
    """args-driven load mirroring backup2.load_weights (:284-314): prefers
    ``pixel_nerf_init`` when not resuming; warns and keeps the fresh
    initialization when nothing exists."""
    if opt_init and not args.resume:
        return variables
    ckpt_name = (
        "pixel_nerf_init" if opt_init or not args.resume else "pixel_nerf_latest"
    )
    path = checkpoint_path(args, ckpt_name)
    if os.path.exists(path):
        print("Load", path)
        loaded = load_model(path, target_variables=variables)
        return _merge_variables(variables, loaded)
    if not opt_init:
        warnings.warn(
            f"WARNING: {path} does not exist, not loaded!! "
            "Model will be re-initialized.\n"
            "If you are trying to load a pretrained model, STOP since it's "
            "not in the right place. If training, unless you are starting a "
            "new experiment, please remember to pass --resume."
        )
    return variables


def save_weights(args, variables: dict, opt_init: bool = False) -> None:
    ckpt_name = "pixel_nerf_init" if opt_init else "pixel_nerf_latest"
    save_model(checkpoint_path(args, ckpt_name), variables)


def _merge_variables(base: dict, update: dict) -> dict:
    """Deep-merge loaded leaves over the initialized tree (partial checkpoints —
    e.g. torch imports without fusion params — keep fresh init elsewhere)."""
    import jax

    base_sd = flax.serialization.to_state_dict(base)

    def merge(b, u):
        out = dict(b)
        for k, v in u.items():
            if k in b and isinstance(b[k], dict) and isinstance(v, dict):
                out[k] = merge(b[k], v)
            elif k in b:
                bk = np.asarray(b[k])
                vv = np.asarray(v)
                out[k] = vv.astype(bk.dtype) if vv.shape == bk.shape else b[k]
            # unknown keys in the checkpoint are dropped
        return out

    merged = merge(base_sd, flax.serialization.to_state_dict(update))
    return flax.serialization.from_state_dict(base, merged)
