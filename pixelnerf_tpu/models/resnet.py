"""Flax ResNet backbones (18/34/50) with torchvision-compatible structure.

torchvision is unavailable in this environment and the reference leans on it for the
pixel-aligned feature extractor (reference encoder.py:60-73).  This is a from-scratch
NHWC Flax implementation whose module tree maps 1:1 onto torchvision's parameter
names so pretrained torch checkpoints can be converted
(:mod:`pixelnerf_tpu.utils.torch_convert`).

Numerics notes for parity with the torch backbone:
  * convs use explicit symmetric padding (torch-style), not XLA 'SAME'
  * BatchNorm: eps 1e-5, running-stats momentum 0.1 (flax momentum = 0.9)
  * max-pool 3x3/2 with 1-pixel zero padding uses -inf padding then pools
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

Array = jnp.ndarray

# torch kaiming_normal_(mode="fan_out") is what torchvision uses at init; exact init
# only matters for from-scratch training, conversion overwrites it anyway.
conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch defaults (eps=1e-5, momentum=0.1)."""

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            name="bn",
        )(x)


def _conv(filters: int, kernel: int, stride: int, name: str):
    pad = kernel // 2
    return nn.Conv(
        filters,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        use_bias=False,
        kernel_init=conv_init,
        name=name,
    )


def _bn(name: str):
    return partial(
        nn.BatchNorm, momentum=0.9, epsilon=1e-5, name=name
    )


class BasicBlock(nn.Module):
    """Two 3x3 convs + identity/projection shortcut (resnet18/34)."""

    filters: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        needs_proj = self.stride != 1 or x.shape[-1] != self.filters
        y = _conv(self.filters, 3, self.stride, "conv1")(x)
        y = _bn("bn1")()(y, use_running_average=not train)
        y = nn.relu(y)
        y = _conv(self.filters, 3, 1, "conv2")(y)
        y = _bn("bn2")()(y, use_running_average=not train)
        if needs_proj:
            x = _conv(self.filters, 1, self.stride, "downsample_conv")(x)
            x = _bn("downsample_bn")()(x, use_running_average=not train)
        return nn.relu(y + x)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1(x4) bottleneck block (resnet50)."""

    filters: int  # bottleneck width; output channels = 4 * filters
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        out_ch = self.filters * self.expansion
        needs_proj = self.stride != 1 or x.shape[-1] != out_ch
        y = _conv(self.filters, 1, 1, "conv1")(x)
        y = _bn("bn1")()(y, use_running_average=not train)
        y = nn.relu(y)
        y = _conv(self.filters, 3, self.stride, "conv2")(y)
        y = _bn("bn2")()(y, use_running_average=not train)
        y = nn.relu(y)
        y = _conv(out_ch, 1, 1, "conv3")(y)
        y = _bn("bn3")()(y, use_running_average=not train)
        if needs_proj:
            x = _conv(out_ch, 1, self.stride, "downsample_conv")(x)
            x = _bn("downsample_bn")()(x, use_running_average=not train)
        return nn.relu(y + x)


_STAGE_SPECS = {
    # name -> (block, blocks-per-stage, per-stage latent channels incl. stem)
    "resnet18": (BasicBlock, (2, 2, 2, 2), (64, 64, 128, 256, 512)),
    "resnet34": (BasicBlock, (3, 4, 6, 3), (64, 64, 128, 256, 512)),
    "resnet50": (Bottleneck, (3, 4, 6, 3), (64, 256, 512, 1024, 2048)),
}


def stage_channels(backbone: str) -> Sequence[int]:
    """Per-stage output channels [stem, layer1..layer4] (reference encoder.py:60-73)."""
    return _STAGE_SPECS[backbone][2]


def max_pool_torch(x: Array) -> Array:
    """torch MaxPool2d(kernel=3, stride=2, padding=1) on NHWC input."""
    neg = jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating) else -(2**30)
    x = jnp.pad(
        x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="constant", constant_values=neg
    )
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")


class ResNetFeatures(nn.Module):
    """ResNet truncated to `num_layers` stages, emitting one feature map per stage.

    Stage 0 is conv1+bn1+relu (optionally + maxpool); stages 1..4 are the residual
    layers, mirroring the reference's layer decomposition (encoder.py:76-92).
    Parameter names mirror torchvision: conv1, bn1, layer{L}_{B} / conv{N} / bn{N} /
    downsample_conv / downsample_bn.
    """

    backbone: str = "resnet34"
    num_layers: int = 4  # number of feature stages to emit (1-5)
    use_first_pool: bool = True

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> list:
        block_cls, stage_blocks, _ = _STAGE_SPECS[self.backbone]
        widths = (64, 128, 256, 512)

        feats = []
        x = nn.Conv(
            64,
            (7, 7),
            strides=(2, 2),
            padding=((3, 3), (3, 3)),
            use_bias=False,
            kernel_init=conv_init,
            name="conv1",
        )(x)
        x = _bn("bn1")()(x, use_running_average=not train)
        x = nn.relu(x)
        if self.use_first_pool:
            x = max_pool_torch(x)
        feats.append(x)

        for stage in range(1, self.num_layers):
            n_blocks = stage_blocks[stage - 1]
            width = widths[stage - 1]
            for b in range(n_blocks):
                stride = 2 if (stage > 1 and b == 0) else 1
                x = block_cls(
                    filters=width,
                    stride=stride,
                    name=f"layer{stage}_{b}",
                )(x, train=train)
            feats.append(x)
        return feats
