"""torch -> Flax parameter conversion.

Converts (a) torchvision ResNet backbone state dicts (for pretrained encoders,
reference encoder.py:61-67) and (b) full reference ``pixel_nerf_latest`` checkpoints
(models.py.backup2:284-314) into this framework's ``{"params": ..., "batch_stats":
...}`` variable trees, so trained torch checkpoints can be evaluated on TPU without
retraining.

Layout rules:
  * conv weight (O, I, kh, kw)  -> kernel (kh, kw, I, O)
  * linear weight (O, I)        -> kernel (I, O)
  * batchnorm weight/bias       -> params scale/bias
  * batchnorm running_mean/var  -> batch_stats mean/var
Module-name rules mirror the naming in :mod:`pixelnerf_tpu.models`:
``layer1.0.conv1`` -> ``layer1_0/conv1``, ``blocks.3.fc_0`` -> ``blocks_3/fc_0``,
``lin_z.2`` -> ``lin_z_2``, ``downsample.0/1`` -> ``downsample_conv``/``downsample_bn``.
"""

from __future__ import annotations

import re
from typing import Dict, Mapping, Optional, Tuple

import numpy as np

PathDict = Dict[Tuple[str, ...], np.ndarray]


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _insert(tree: dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convert_tensor(key_tail: str, value: np.ndarray):
    """Map a torch parameter leaf name to (flax collection, leaf name, converted
    array); returns None for buffers we don't carry (num_batches_tracked etc.)."""
    if key_tail == "weight":
        if value.ndim == 4:
            return "params", "kernel", np.transpose(value, (2, 3, 1, 0))
        if value.ndim == 2:
            return "params", "kernel", np.transpose(value, (1, 0))
        if value.ndim == 1:  # batchnorm gamma
            return "params", "scale", value
    if key_tail == "bias":
        return "params", "bias", value
    if key_tail == "running_mean":
        return "batch_stats", "mean", value
    if key_tail == "running_var":
        return "batch_stats", "var", value
    return None


_RESNET_RULES = [
    # (regex on torch module path, flax module path builder)
    (re.compile(r"^conv1$"), lambda m: ("conv1",)),
    (re.compile(r"^bn1$"), lambda m: ("bn1",)),
    (
        re.compile(r"^layer(\d+)\.(\d+)\.conv(\d+)$"),
        lambda m: (f"layer{m.group(1)}_{m.group(2)}", f"conv{m.group(3)}"),
    ),
    (
        re.compile(r"^layer(\d+)\.(\d+)\.bn(\d+)$"),
        lambda m: (f"layer{m.group(1)}_{m.group(2)}", f"bn{m.group(3)}"),
    ),
    (
        re.compile(r"^layer(\d+)\.(\d+)\.downsample\.0$"),
        lambda m: (f"layer{m.group(1)}_{m.group(2)}", "downsample_conv"),
    ),
    (
        re.compile(r"^layer(\d+)\.(\d+)\.downsample\.1$"),
        lambda m: (f"layer{m.group(1)}_{m.group(2)}", "downsample_bn"),
    ),
]

# Fork fusion stack (reference feature_fusion.py:9-147 + attention.py:107-183).
# Third element: "dense" marks torch 1x1 Conv2d weights that land on flax
# nn.Dense kernels (the fusion modules here are NHWC and use Dense for every
# pointwise conv), which need the (O, I, 1, 1) -> (I, O) squeeze.
_FUSION_RULES = [
    (
        re.compile(r"^projections\.(\d+)\.0$"),
        lambda m: (f"proj_{m.group(1)}",),
        "dense",
    ),
    (
        re.compile(r"^projections\.(\d+)\.1$"),
        lambda m: (f"proj_bn_{m.group(1)}",),
        "conv",
    ),
    (re.compile(r"^channel_attention\.1$"), lambda m: ("channel_attn",), "dense"),
    (re.compile(r"^spatial_attention\.0$"), lambda m: ("spatial_attn",), "conv"),
    (re.compile(r"^fusion\.0$"), lambda m: ("fusion_conv",), "conv"),
    (re.compile(r"^fusion\.1$"), lambda m: ("fusion_bn",), "conv"),
    (
        re.compile(r"^cbam\.channel_attn\.fc\.0$"),
        lambda m: ("cbam", "channel_attn", "fc1"),
        "dense",
    ),
    (
        re.compile(r"^cbam\.channel_attn\.fc\.2$"),
        lambda m: ("cbam", "channel_attn", "fc2"),
        "dense",
    ),
    (
        re.compile(r"^cbam\.spatial_attn\.conv$"),
        lambda m: ("cbam", "spatial_attn", "conv"),
        "conv",
    ),
    (re.compile(r"^enhancement\.0$"), lambda m: ("enhancement",), "dense"),
]


_MLP_RULES = [
    (re.compile(r"^lin_in$"), lambda m: ("lin_in",)),
    (re.compile(r"^lin_out$"), lambda m: ("lin_out",)),
    (re.compile(r"^lin(\d+)$"), lambda m: (f"lin{m.group(1)}",)),  # ImplicitNet
    (
        re.compile(r"^blocks\.(\d+)\.(fc_0|fc_1|shortcut)$"),
        lambda m: (f"blocks_{m.group(1)}", m.group(2)),
    ),
    (re.compile(r"^lin_z\.(\d+)$"), lambda m: (f"lin_z_{m.group(1)}",)),
    (re.compile(r"^scale_z\.(\d+)$"), lambda m: (f"scale_z_{m.group(1)}",)),
]


def _apply_rules(rules, module_path: str):
    for rx, builder in rules:
        m = rx.match(module_path)
        if m is not None:
            return builder(m)
    return None


def convert_resnet(state_dict: Mapping[str, "np.ndarray"]) -> dict:
    """torchvision ResNet state dict -> {"params": ..., "batch_stats": ...} matching
    :class:`pixelnerf_tpu.models.resnet.ResNetFeatures` (fc head skipped)."""
    out = {"params": {}, "batch_stats": {}}
    for key, value in state_dict.items():
        value = _to_numpy(value)
        module_path, _, leaf = key.rpartition(".")
        if module_path.startswith("fc") or key.startswith("fc."):
            continue
        if leaf == "num_batches_tracked":
            continue
        flax_mod = _apply_rules(_RESNET_RULES, module_path)
        if flax_mod is None:
            continue
        conv = _convert_tensor(leaf, value)
        if conv is None:
            continue
        coll, leaf_name, arr = conv
        if coll == "params" and flax_mod[-1].startswith(("bn", "downsample_bn")):
            pass  # scale/bias live under the bn module
        _insert(out[coll], flax_mod + (leaf_name,), arr)
    return out


def convert_pixelnerf(state_dict: Mapping[str, "np.ndarray"]) -> dict:
    """Full reference PixelNeRFNet state dict (backup2 layout) ->
    variables for :class:`pixelnerf_tpu.models.PixelNeRFNet`.

    Handles encoder.model.*, mlp_coarse.*, mlp_fine.*, global_encoder.*, and the
    fork's feature_fusion.* stack (feature_fusion.py:9-147); skips the
    non-persistent camera buffers (poses/image_shape/focal/c) and positional-encoding
    buffers, which are recomputed functionally here.
    """
    out = {"params": {}, "batch_stats": {}}
    skip_prefixes = ("poses", "image_shape", "focal", "c", "code.")
    for key, value in state_dict.items():
        if key.startswith(skip_prefixes):
            continue
        value = _to_numpy(value)
        module_path, _, leaf = key.rpartition(".")
        if leaf == "num_batches_tracked":
            continue

        flax_path = None
        if module_path.startswith("feature_fusion."):
            tail = module_path[len("feature_fusion.") :]
            for rx, builder, kind in _FUSION_RULES:
                m = rx.match(tail)
                if m is None:
                    continue
                flax_path = ("feature_fusion",) + builder(m)
                if kind == "dense" and leaf == "weight" and value.ndim == 4:
                    value = value[:, :, 0, 0]  # (O, I, 1, 1) -> (O, I)
                break
        elif module_path.startswith("encoder.model."):
            tail = module_path[len("encoder.model.") :]
            mod = _apply_rules(_RESNET_RULES, tail)
            if mod is not None:
                flax_path = ("encoder", "model") + mod
        elif module_path.startswith(("mlp_coarse.", "mlp_fine.")):
            head, tail = module_path.split(".", 1)
            mod = _apply_rules(_MLP_RULES, tail)
            if mod is not None:
                flax_path = (head,) + mod
        elif module_path.startswith("global_encoder.model."):
            tail = module_path[len("global_encoder.model.") :]
            mod = _apply_rules(_RESNET_RULES, tail)
            if mod is not None:
                flax_path = ("global_encoder", "model") + mod
        elif module_path == "global_encoder.fc":
            flax_path = ("global_encoder", "fc")

        if flax_path is None:
            continue
        conv = _convert_tensor(leaf, value)
        if conv is None:
            continue
        coll, leaf_name, arr = conv
        _insert(out[coll], flax_path + (leaf_name,), arr)
    return out


def load_torch_checkpoint(path: str) -> dict:
    """Load a torch checkpoint file to a flat numpy state dict (host-side)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "net" in obj and isinstance(obj["net"], dict):
        obj = obj["net"]  # fork-style composite checkpoint (trainer.py:581-618)
    return {k: _to_numpy(v) for k, v in obj.items()}


def tree_shapes_match(converted: dict, target: dict, path=()) -> list:
    """Diff helper: returns list of (path, converted_shape, target_shape) mismatches
    plus missing keys, for checkpoint-conversion validation."""
    problems = []
    keys = set(converted) | set(target)
    for k in sorted(keys):
        p = path + (k,)
        if k not in converted:
            problems.append((p, None, "missing-in-converted"))
        elif k not in target:
            problems.append((p, "extra-in-converted", None))
        else:
            cv, tv = converted[k], target[k]
            if isinstance(cv, dict) and isinstance(tv, dict):
                problems.extend(tree_shapes_match(cv, tv, p))
            else:
                cs = getattr(cv, "shape", None)
                ts = getattr(tv, "shape", None)
                if cs != ts:
                    problems.append((p, cs, ts))
    return problems


# ---------------------------------------------------------------------------
# Pretrained backbone initialization (reference encoder.py:61-67 relies on
# torchvision pretrained=True at construction time)
# ---------------------------------------------------------------------------


def _merge_overlap(dst: dict, src: dict) -> int:
    """Overwrite leaves of ``dst`` that exist in ``src`` with matching shapes;
    returns the number of leaves replaced.  Extra source leaves (fc head,
    truncated layers) are ignored."""
    n = 0
    for k, v in src.items():
        if k not in dst:
            continue
        if isinstance(v, dict) and isinstance(dst[k], dict):
            n += _merge_overlap(dst[k], v)
        elif not isinstance(v, dict) and not isinstance(dst[k], dict):
            if tuple(np.shape(dst[k])) == tuple(np.shape(v)):
                dst[k] = np.asarray(v, dtype=np.asarray(dst[k]).dtype)
                n += 1
    return n


def backbone_state_dict(backbone: str, weights_path: Optional[str] = None):
    """Fetch a torch state dict for ``backbone`` (resnet18/34/50):

    1. explicit ``weights_path`` (or $PIXELNERF_BACKBONE_WEIGHTS) — a torch
       file holding the torchvision-layout state dict;
    2. torchvision's IMAGENET1K_V1 weights (what the reference's
       ``pretrained=True`` loads) when torchvision + its cache are available;
    3. None with a warning (offline, no cache) — caller keeps random init.
    """
    import os
    import warnings

    path = weights_path or os.environ.get("PIXELNERF_BACKBONE_WEIGHTS")
    if path:
        try:
            return load_torch_checkpoint(path)
        except Exception as e:
            warnings.warn(
                f"backbone weights file {path!r} unreadable ({e}); "
                "falling back to torchvision"
            )
    try:
        import torchvision.models as tvm

        fn = getattr(tvm, backbone)
        try:
            model = fn(weights="IMAGENET1K_V1")
        except TypeError:  # torchvision < 0.13
            model = fn(pretrained=True)
        return {k: _to_numpy(v) for k, v in model.state_dict().items()}
    except Exception as e:
        warnings.warn(
            f"pretrained backbone {backbone!r} unavailable ({e}); encoder "
            "keeps its random initialization. Set encoder.pretrained_path or "
            "$PIXELNERF_BACKBONE_WEIGHTS to a torchvision-layout state dict "
            "to train from ImageNet features as the reference does."
        )
        return None


def load_pretrained_backbones(variables: dict, model_conf) -> dict:
    """Initialize spatial/global encoder ResNet backbones from pretrained
    torch weights per the conf (``encoder.pretrained``, default true — the
    reference constructs its encoders with torchvision pretrained=True,
    encoder.py:61-67).  Returns (possibly updated) variables; silently a
    no-op for conv encoders and ``pretrained = false``."""
    import flax.serialization

    targets = []
    if "encoder" in model_conf:
        enc = model_conf["encoder"]
        if (
            enc.get_string("type", "spatial") == "spatial"
            and enc.get_bool("pretrained", True)
        ):
            targets.append(
                (
                    "encoder",
                    enc.get_string("backbone", "resnet34"),
                    enc.get_string("pretrained_path", None),
                )
            )
    if model_conf.get_bool("use_global_encoder", False) and "global_encoder" in model_conf:
        ge = model_conf["global_encoder"]
        if ge.get_bool("pretrained", True):
            targets.append(
                (
                    "global_encoder",
                    ge.get_string("backbone", "resnet34"),
                    ge.get_string("pretrained_path", None),
                )
            )
    if not targets:
        return variables

    import os
    import warnings

    state = flax.serialization.to_state_dict(variables)
    changed = 0
    loaded_any = False
    for mod_name, backbone, wpath in targets:
        sd = backbone_state_dict(backbone, wpath)
        if sd is None:
            # the reference constructs its encoders with torchvision
            # pretrained=True (encoder.py:61-67); silently training from a
            # random trunk materially changes convergence, so this is a hard
            # failure with an explicit escape hatch
            if os.environ.get("PIXELNERF_ALLOW_RANDOM_BACKBONE") == "1":
                warnings.warn(
                    f"'{mod_name}' keeps RANDOM initialization "
                    "(PIXELNERF_ALLOW_RANDOM_BACKBONE=1)"
                )
                continue
            raise RuntimeError(
                f"encoder '{mod_name}' is configured pretrained=true but no "
                f"backbone weights for {backbone!r} could be obtained (no "
                "encoder.pretrained_path, no $PIXELNERF_BACKBONE_WEIGHTS, "
                "torchvision weights unavailable offline). Provide a "
                "torchvision-layout state dict via either mechanism, or set "
                "PIXELNERF_ALLOW_RANDOM_BACKBONE=1 to train from a random "
                "encoder anyway."
            )
        loaded_any = True
        conv = convert_resnet(sd)
        for coll in ("params", "batch_stats"):
            dst = state.get(coll, {}).get(mod_name, {}).get("model")
            if isinstance(dst, dict):
                changed += _merge_overlap(dst, conv[coll])
    if changed:
        print(
            f"Initialized {changed} backbone tensors from pretrained weights"
        )
        return flax.serialization.from_state_dict(variables, state)
    if loaded_any:
        import warnings

        warnings.warn(
            "pretrained backbone weights loaded but matched 0 model tensors — "
            "is the file a bare torchvision-layout state dict for the "
            "configured backbone? Keeping random initialization."
        )
    return variables
