"""Multi-scale feature fusion modules (Flax, NHWC).

TPU re-design of the fork's fusion stack:

  * :class:`SmartFeatureFusion` — reference feature_fusion.py:9-147: per-scale 1x1
    projection to output_dim/N (+BN+ReLU+dropout), bilinear upsample to the largest
    map, channel-softmax + spatial-softmax attention over scales, 3x3 fusion conv,
    optional CBAM, 1x1 enhancement.
  * :class:`AdaptiveFeatureSampler` — reference feature_fusion.py:150-231: per-scale
    quality scores.  The torch version drops low-quality scales with data-dependent
    python control flow; under jit we keep static shapes and instead *soft-gate* each
    scale by ``quality * (quality >= threshold)`` (renormalized, best scale always
    kept), which reproduces the selection semantics differentiably.
  * :class:`MultiScaleFusionModule` — reference multiscale_fusion.py:12-74: simpler
    softmax-weighted sum variant (dead code upstream, kept for capability parity).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.grid_sample import resize_bilinear
from .attention import CBAM

Array = jnp.ndarray


class SmartFeatureFusion(nn.Module):
    layer_dims: Sequence[int]
    output_dim: int = 512
    use_attention: bool = True
    dropout: float = 0.0
    num_heads: int = 8
    use_cbam: bool = True

    @nn.compact
    def __call__(
        self, features: List[Array], train: bool = False
    ) -> Array:
        """:param features: per-scale NHWC maps [(B, H_i, W_i, C_i), ...], finest first
        :return: (B, H_0, W_0, output_dim) fused feature map
        """
        if not features:
            raise ValueError("features list is empty")
        n = len(self.layer_dims)
        proj_dim = self.output_dim // n
        th, tw = features[0].shape[1], features[0].shape[2]

        projected = []
        for i, feat in enumerate(features):
            y = nn.Dense(proj_dim, name=f"proj_{i}")(feat)
            y = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                name=f"proj_bn_{i}",
            )(y)
            y = nn.relu(y)
            if self.dropout > 0:
                y = nn.Dropout(self.dropout, deterministic=not train)(y)
            if y.shape[1:3] != (th, tw):
                y = resize_bilinear(y, th, tw)
            projected.append(y)

        concat = jnp.concatenate(projected, axis=-1)  # (B, H, W, n*proj_dim)

        if self.use_attention:
            # channel attention: global pool -> per-scale softmax weights
            pooled = jnp.mean(concat, axis=(1, 2))  # (B, C)
            cw = nn.softmax(nn.Dense(n, name="channel_attn")(pooled), axis=-1)
            # spatial attention: 7x7 conv -> per-scale per-pixel softmax
            sw = nn.Conv(
                n, (7, 7), padding=((3, 3), (3, 3)), name="spatial_attn"
            )(concat)
            sw = nn.softmax(sw, axis=-1)  # (B, H, W, n)
            weights = cw[:, None, None, :] * sw  # (B, H, W, n)
            weighted = [
                projected[i] * weights[..., i : i + 1] for i in range(n)
            ]
            concat = jnp.concatenate(weighted, axis=-1)

        fused = nn.Conv(
            self.output_dim, (3, 3), padding=((1, 1), (1, 1)), name="fusion_conv"
        )(concat)
        fused = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            name="fusion_bn",
        )(fused)
        fused = nn.relu(fused)
        if self.dropout > 0:
            fused = nn.Dropout(self.dropout, deterministic=not train)(fused)

        if self.use_cbam:
            fused = CBAM(self.output_dim, name="cbam")(fused)

        fused = nn.relu(nn.Dense(self.output_dim, name="enhancement")(fused))
        return fused


class AdaptiveFeatureSampler(nn.Module):
    """Quality-gated scale weighting (static-shape analog of the torch top-k
    selection, feature_fusion.py:182-231).

    Two surfaces (PARITY.md "AdaptiveFeatureSampler"):

    * ``__call__`` — jit-friendly soft gate: each scale is weighted by
      ``quality * (quality >= threshold)`` (renormalized, best scale always
      kept).  The *kept set* (gate > 0) equals the reference's hard
      selection; kept features are additionally quality-weighted, which the
      reference does not do (it forwards them unscaled).
    * ``__call__(..., return_q=True)`` + :meth:`select` — the reference's
      exact eval-time semantics: compute qualities on device, then
      hard-select feature subsets host-side with data-dependent control
      flow (descending quality sort, optional ``top_k`` cap, >= threshold,
      at least the single best kept; like the reference, decisions read
      batch element 0, feature_fusion.py:214-216 ``.item()``).
    """

    feature_dim: int
    quality_threshold: float = 0.3

    @nn.compact
    def __call__(self, features: List[Array], return_q: bool = False):
        qualities = []
        for i, feat in enumerate(features):
            pooled = jnp.mean(feat, axis=(1, 2))  # (B, C_i)
            h = nn.relu(
                nn.Dense(max(self.feature_dim // 4, 1), name=f"quality_fc1_{i}")(
                    pooled
                )
            )
            q = nn.sigmoid(nn.Dense(1, name=f"quality_fc2_{i}")(h))  # (B, 1)
            qualities.append(q)
        q = jnp.concatenate(qualities, axis=-1)  # (B, n)
        if return_q:
            return q
        keep = (q >= self.quality_threshold).astype(q.dtype)
        # the best scale is always kept (feature_fusion.py:224-229)
        best = jnp.argmax(q, axis=-1)
        keep = jnp.maximum(
            keep, jnp.eye(q.shape[-1], dtype=q.dtype)[best]
        )
        gate = q * keep
        gate = gate / (jnp.sum(gate, axis=-1, keepdims=True) + 1e-8) * jnp.sum(
            keep, axis=-1, keepdims=True
        )
        return [
            feat * gate[:, i][:, None, None, None]
            for i, feat in enumerate(features)
        ]

    @staticmethod
    def select(
        features: List[Array],
        qualities,
        top_k: Optional[int] = None,
        quality_threshold: float = 0.3,
    ):
        """Reference hard selection (feature_fusion.py:182-231), host-side.

        :param qualities: (B, N) scores from ``__call__(..., return_q=True)``
        :return: (selected feature list, selected indices) — order is by
            DESCENDING quality, exactly like the reference.
        """
        import numpy as np

        q = np.asarray(qualities)
        order = np.argsort(-q[0], kind="stable")  # element 0, like .item()
        sel_feats, sel_idx = [], []
        for idx in order:
            if top_k is not None and len(sel_feats) >= top_k:
                break
            if q[0, idx] >= quality_threshold:
                sel_feats.append(features[idx])
                sel_idx.append(int(idx))
        if not sel_feats:  # at least the best one (feature_fusion.py:224-229)
            sel_feats.append(features[order[0]])
            sel_idx.append(int(order[0]))
        return sel_feats, sel_idx


class MultiScaleFusionModule(nn.Module):
    """Earlier, simpler fusion: unify channels with 1x1 convs, align scales to the
    coarsest map, softmax-weighted sum (reference multiscale_fusion.py:12-74)."""

    layer_dims: Sequence[int]
    output_dim: int = 256

    @nn.compact
    def __call__(self, features: List[Array]) -> Array:
        n = len(features)
        th, tw = features[-1].shape[1], features[-1].shape[2]
        unified = []
        for i, feat in enumerate(features):
            y = nn.Dense(self.output_dim, name=f"unify_{i}")(feat)
            if y.shape[1:3] != (th, tw):
                y = resize_bilinear(y, th, tw)
            unified.append(y)
        stack = jnp.stack(unified, axis=-1)  # (B, H, W, C, n)
        logits = self.param(
            "scale_logits", nn.initializers.zeros, (n,)
        )
        w = nn.softmax(logits)
        return jnp.einsum("bhwcn,n->bhwc", stack, w)


def create_feature_fusion(
    feature_dim: Optional[int] = None,
    layer_dims: Optional[Sequence[int]] = None,
    fusion_type: str = "smart",
    **kwargs,
):
    """Convenience constructor (reference feature_fusion.py:235-262)."""
    if fusion_type == "smart":
        if layer_dims is not None:
            return SmartFeatureFusion(layer_dims=tuple(layer_dims), **kwargs)
        if feature_dim is not None:
            return SmartFeatureFusion(layer_dims=(feature_dim,), **kwargs)
        raise ValueError("Must provide either feature_dim or layer_dims")
    if fusion_type == "adaptive":
        if feature_dim is None:
            raise ValueError("feature_dim is required for adaptive fusion")
        return AdaptiveFeatureSampler(feature_dim)
    raise ValueError(f"Unknown fusion type: {fusion_type}")
