"""LPIPS perceptual metric (VGG16 variant) in Flax.

The reference computes LPIPS through the external ``lpips`` torch package
(calc_metrics.py:17,186,243).  That package is unavailable here and its
pretrained weights cannot be downloaded (zero egress), so this module provides:

  * the full LPIPS(VGG) architecture: VGG16 trunk, features tapped at
    relu1_2/relu2_2/relu3_3/relu4_3/relu5_3, per-location unit normalization,
    learned 1x1 linear heads, spatial + layer averaging;
  * a converter from the torch ``lpips`` package state dict
    (``load_torch_lpips``), so officially released weights drop in when a user
    supplies the file (env ``LPIPS_WEIGHTS`` or explicit path);
  * without weights, :func:`lpips_fn` raises — callers (calc_metrics) degrade
    gracefully and report LPIPS as unavailable rather than silently wrong.

Inputs follow the lpips convention: NCHW-free — here (B, H, W, 3) in [-1, 1].
"""

from __future__ import annotations

import os
import re
from typing import List, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

# VGG16 conv plan: (filters, n_convs) per block; taps after the last relu of
# each block.
_VGG_BLOCKS = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

# lpips package input scaling (ImageNet-derived shift/scale on [-1,1] inputs)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        taps = []
        conv_idx = 0
        for block, (filters, n_convs) in enumerate(_VGG_BLOCKS):
            for _ in range(n_convs):
                x = nn.Conv(
                    filters,
                    (3, 3),
                    padding=((1, 1), (1, 1)),
                    name=f"conv{conv_idx}",
                )(x)
                x = nn.relu(x)
                conv_idx += 1
            taps.append(x)
            if block < len(_VGG_BLOCKS) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


class LPIPS(nn.Module):
    @nn.compact
    def __call__(self, pred: Array, target: Array) -> Array:
        """:param pred/target: (B, H, W, 3) in [-1, 1] -> (B,) distances"""
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        vgg = VGG16Features(name="net")
        f0 = vgg((pred - shift) / scale)
        f1 = vgg((target - shift) / scale)
        total = 0.0
        for i, (a, b) in enumerate(zip(f0, f1)):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
            diff = (a - b) ** 2
            w = nn.Conv(
                1, (1, 1), use_bias=False, name=f"lin{i}"
            )(diff)  # learned per-channel weights
            total = total + jnp.mean(w, axis=(1, 2, 3))
        return total


_N_CONVS = sum(n for _, n in _VGG_BLOCKS)


def load_torch_lpips(path: str) -> dict:
    """Convert the torch ``lpips`` package LPIPS(net='vgg') state dict (or a full
    pickled module's state dict) to this module's params tree."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    sd = {k: np.asarray(v.detach().cpu().numpy()) for k, v in obj.items()}

    params: dict = {"net": {}, }
    # vgg features: keys like net.slice{1-5}.{idx}.weight (lpips) or
    # features.{idx}.weight (torchvision).  Build an index->convN map.
    conv_positions = []  # torchvision features indices of convs
    idx = 0
    for filters, n_convs in _VGG_BLOCKS:
        for _ in range(n_convs):
            conv_positions.append(idx)
            idx += 2  # conv + relu
        idx += 1  # maxpool

    def put_conv(n, w, b):
        params["net"][f"conv{n}"] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)),
            "bias": b,
        }

    feat_keys = {}
    for k, v in sd.items():
        m = re.match(r"^(?:net\.)?features\.(\d+)\.(weight|bias)$", k)
        if m:
            feat_keys.setdefault(int(m.group(1)), {})[m.group(2)] = v
        m2 = re.match(r"^net\.slice(\d)\.(\d+)\.(weight|bias)$", k)
        if m2:
            # lpips slices reuse global torchvision indices
            feat_keys.setdefault(int(m2.group(2)), {})[m2.group(3)] = v
    for n, pos in enumerate(conv_positions):
        if pos in feat_keys and "weight" in feat_keys[pos]:
            put_conv(n, feat_keys[pos]["weight"], feat_keys[pos]["bias"])

    for k, v in sd.items():
        m = re.match(r"^lins?\.?(\d)\.model\.(\d+)\.weight$", k) or re.match(
            r"^lin(\d)\.model\.(\d+)\.weight$", k
        )
        if m:
            params[f"lin{m.group(1)}"] = {
                "kernel": np.transpose(v, (2, 3, 1, 0))
            }
    return {"params": params}


_cached = None


def lpips_fn(weights_path: Optional[str] = None):
    """Return a callable (pred, target) -> (B,) LPIPS distances, loading weights
    from ``weights_path`` or the LPIPS_WEIGHTS env var.  Raises FileNotFoundError
    when no weights are available."""
    global _cached
    if _cached is not None:
        return _cached
    import jax

    path = weights_path or os.environ.get("LPIPS_WEIGHTS", "")
    if not path or not os.path.exists(path):
        raise FileNotFoundError(
            "LPIPS weights not available; set LPIPS_WEIGHTS to a torch lpips "
            "VGG checkpoint to enable perceptual metrics"
        )
    variables = load_torch_lpips(path)
    model = LPIPS()

    @jax.jit
    def fn(pred, target):
        return model.apply(variables, pred, target)

    _cached = fn
    return fn
