"""Attention toolbox for multi-scale feature fusion (Flax, NHWC).

TPU re-design of the reference attention modules (attention.py:6-183).  All feature
maps are NHWC; 1x1 convs become Dense layers over the channel dim (pure MXU matmuls),
and the attention contractions are expressed as batched einsums that XLA maps
directly onto the systolic array.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

Array = jnp.ndarray


class MultiViewAttention(nn.Module):
    """Multi-head self-attention over the H*W spatial positions of a feature map
    with residual + LayerNorm (reference attention.py:6-60)."""

    channels: int
    num_heads: int = 8

    @nn.compact
    def __call__(self, x: Array) -> Array:
        """:param x: (B, H, W, C)"""
        B, H, W, C = x.shape
        assert C % self.num_heads == 0, "channels must divide num_heads"
        hd = C // self.num_heads

        q = nn.Dense(C, name="query")(x).reshape(B, H * W, self.num_heads, hd)
        k = nn.Dense(C, name="key")(x).reshape(B, H * W, self.num_heads, hd)
        v = nn.Dense(C, name="value")(x).reshape(B, H * W, self.num_heads, hd)

        attn = jnp.einsum("bihd,bjhd->bhij", q, k) / (hd**0.5)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(B, H, W, C)

        out = nn.Dense(C, name="proj")(out) + x
        return nn.LayerNorm(name="norm")(out)


class CrossViewAttention(nn.Module):
    """Target-view queries attend over reference-view keys/values; learned
    zero-init gamma gates the residual (reference attention.py:63-104)."""

    channels: int

    @nn.compact
    def __call__(self, target_feat: Array, ref_feat: Array) -> Array:
        B, H, W, C = target_feat.shape
        q = nn.Dense(C // 8, name="query_conv")(target_feat).reshape(B, H * W, -1)
        k = nn.Dense(C // 8, name="key_conv")(ref_feat).reshape(B, H * W, -1)
        v = nn.Dense(C, name="value_conv")(ref_feat).reshape(B, H * W, C)

        attn = nn.softmax(jnp.einsum("bik,bjk->bij", q, k), axis=-1)
        out = jnp.einsum("bij,bjc->bic", attn, v).reshape(B, H, W, C)

        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return gamma * out + target_feat


class SpatialAttention(nn.Module):
    """7x7 conv over channelwise [max, mean] -> sigmoid spatial gate
    (reference attention.py:107-135)."""

    kernel_size: int = 7

    @nn.compact
    def __call__(self, x: Array) -> Array:
        pad = self.kernel_size // 2
        pooled = jnp.concatenate(
            [
                jnp.max(x, axis=-1, keepdims=True),
                jnp.mean(x, axis=-1, keepdims=True),
            ],
            axis=-1,
        )
        gate = nn.Conv(
            1,
            (self.kernel_size, self.kernel_size),
            padding=((pad, pad), (pad, pad)),
            use_bias=False,
            name="conv",
        )(pooled)
        return x * nn.sigmoid(gate)


class ChannelAttention(nn.Module):
    """SE-style channel gate from global avg+max pooling through a shared
    bottleneck MLP (reference attention.py:138-166)."""

    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        hidden = max(self.channels // self.reduction, 1)
        fc1 = nn.Dense(hidden, use_bias=False, name="fc1")
        fc2 = nn.Dense(self.channels, use_bias=False, name="fc2")

        avg = jnp.mean(x, axis=(1, 2))  # (B, C)
        mx = jnp.max(x, axis=(1, 2))
        gate = nn.sigmoid(fc2(nn.relu(fc1(avg))) + fc2(nn.relu(fc1(mx))))
        return x * gate[:, None, None, :]


class CBAM(nn.Module):
    """Channel-then-spatial attention (reference attention.py:169-183)."""

    channels: int
    reduction: int = 16
    kernel_size: int = 7

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = ChannelAttention(
            self.channels, self.reduction, name="channel_attn"
        )(x)
        return SpatialAttention(self.kernel_size, name="spatial_attn")(x)
