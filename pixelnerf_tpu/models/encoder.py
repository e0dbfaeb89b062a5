"""Spatial (pixel-aligned) and global image encoders.

Flax re-design of the reference SpatialEncoder (encoder.py:13-256).  Differences are
deliberate and TPU-first:

  * NHWC feature maps end-to-end (XLA's preferred conv layout).
  * The encoder is stateless — ``__call__`` *returns* the feature pyramid instead of
    stashing ``self.latent`` attributes (encoder.py:105-135 is jit-hostile).
  * ``index`` is a pure function over the returned latents.

Two index-normalization conventions exist in the reference lineage:

  * ``index_normalize="image"`` (default, upstream-correct per SURVEY §0.3): uv pixel
    coordinates are normalized w.r.t. the *input image* extent, independent of the
    feature-map resolution: ``g = u * (W_l / W_img) * 2/(W_l - 1) - 1`` which with
    align_corners=True places image pixel u at feature coordinate ``u * W_l / W_img``.
  * ``index_normalize="feature"``: the fork's rewrite normalizes by the feature map's
    own (W_l-1, H_l-1) directly against image-pixel uv (encoder.py:162-176) — only
    correct when feature res == image res; kept as an option for exact fork parity.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from ..ops.grid_sample import (
    grid_sample,
    resize_bilinear_align_corners,
)
from . import resnet

Array = jnp.ndarray


class SpatialEncoder(nn.Module):
    """2D pixel-aligned feature extractor on a ResNet backbone.

    :return from __call__: list of per-stage NHWC feature maps when
        ``use_multi_scale``; otherwise a single unified map — the per-stage maps
        bilinearly upsampled to the stage-0 resolution and channel-concatenated
        (upstream pixelNeRF behavior; total 512 channels for resnet34/num_layers=4).
    """

    backbone: str = "resnet34"
    pretrained: bool = True  # consumed by the weight loader, not the module
    num_layers: int = 4
    index_interp: str = "bilinear"
    index_padding: str = "border"
    upsample_interp: str = "bilinear"
    feature_scale: float = 1.0
    use_first_pool: bool = True
    norm_type: str = "batch"
    use_multi_scale: bool = False
    index_normalize: str = "image"  # "image" (upstream) | "feature" (fork rewrite)

    @property
    def latent_sizes(self) -> Sequence[int]:
        return resnet.stage_channels(self.backbone)[: self.num_layers]

    @property
    def latent_size(self) -> Union[int, List[int]]:
        """Multi-scale -> per-scale channel list; single-scale -> total unified
        channels (reference encoder.py:94-103 exposes the same int-or-list shape)."""
        sizes = list(self.latent_sizes)
        if self.use_multi_scale:
            return sizes
        return sum(sizes)

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        """:param x: (B, H, W, 3) images in [-1, 1]
        :return: list[(B, H_i, W_i, C_i)] if multi-scale else (B, H0, W0, sum C_i)
        """
        if self.feature_scale != 1.0:
            x = x * self.feature_scale
        feats = resnet.ResNetFeatures(
            backbone=self.backbone,
            num_layers=self.num_layers,
            use_first_pool=self.use_first_pool,
            name="model",
        )(x, train=train)
        if self.use_multi_scale:
            return feats
        h0, w0 = feats[0].shape[1], feats[0].shape[2]
        # upstream upsamples the deeper latents before the channel concat with
        # F.interpolate(mode=upsample_interp, align_corners=True-for-bilinear)
        # (the fork's fusion path uses half-pixel resize instead — kept
        # separate in models/fusion.py)
        if self.upsample_interp == "bilinear":
            up = resize_bilinear_align_corners
        elif self.upsample_interp == "nearest":
            from ..ops.grid_sample import resize_nearest as up
        else:
            raise NotImplementedError(
                f"upsample_interp {self.upsample_interp!r}"
            )
        unified = [
            f if f.shape[1:3] == (h0, w0) else up(f, h0, w0) for f in feats
        ]
        return jnp.concatenate(unified, axis=-1)

    # ------------------------------------------------------------------
    # Pure feature indexing (no module state involved)
    # ------------------------------------------------------------------
    def index(
        self,
        latents,
        uv: Array,
        image_shape: Tuple[float, float],
    ) -> Array:
        """Sample pixel-aligned features at image-space points.

        :param latents: output of ``__call__`` (map or list of maps)
        :param uv: (B, N, 2) sample points in *input image pixel* coordinates
        :param image_shape: (W_img, H_img) of the encoded input images
        :return: (B, N, L_total) sampled features (channel-concat across scales)
        """
        if not isinstance(latents, (list, tuple)):
            latents = [latents]
        w_img, h_img = image_shape
        samples = []
        for lat in latents:
            h_l, w_l = lat.shape[1], lat.shape[2]
            if self.index_normalize == "feature":
                gx = uv[..., 0] / (w_l - 1) * 2.0 - 1.0
                gy = uv[..., 1] / (h_l - 1) * 2.0 - 1.0
            else:
                gx = uv[..., 0] * (w_l / w_img) * (2.0 / max(w_l - 1, 1)) - 1.0
                gy = uv[..., 1] * (h_l / h_img) * (2.0 / max(h_l - 1, 1)) - 1.0
            grid = jnp.stack([gx, gy], axis=-1)
            if self.index_interp == "bilinear":
                # tap-decomposed gather: identical forward values, but the
                # feature-table gradient is a one-hot MXU matmul rather than an
                # XLA scatter (see ops.grid_sample.gather_taps; uv carries no
                # trainable ancestors in this model family)
                from ..ops.grid_sample import bilinear_taps, gather_taps

                t_idx, t_w = bilinear_taps(
                    grid,
                    h_l,
                    w_l,
                    align_corners=True,
                    padding_mode=self.index_padding,
                )
                flat = lat.reshape(lat.shape[0], h_l * w_l, -1)
                samples.append(gather_taps(flat, t_idx, t_w))
            else:
                # align_corners=True to match the uv normalization above AND
                # the reference, which passes align_corners=self.align_corners
                # (=True) for every interp mode (encoder.py:181-186)
                samples.append(
                    grid_sample(
                        lat,
                        grid,
                        align_corners=True,
                        padding_mode=self.index_padding,
                        mode=self.index_interp,
                    )
                )
        return jnp.concatenate(samples, axis=-1)

    def index_taps(self, lat: Array, uv: Array, image_shape: Tuple[float, float]):
        """Bilinear taps for a fused-gather lookup into a SINGLE feature map.

        Same uv normalization as :meth:`index`, but instead of gathering, it
        returns the (idx, w) taps into ``lat.reshape(B, H_l*W_l, C)`` for the
        Pallas one-hot-matmul gather (ops.resnetfc_pallas.LatentGather).

        :param lat: (B, H_l, W_l, C) — the unified (single-scale) map
        :return: (idx (B, N, 4) int32, w (B, N, 4) f32)
        """
        from ..ops.grid_sample import bilinear_taps

        w_img, h_img = image_shape
        h_l, w_l = lat.shape[1], lat.shape[2]
        if self.index_normalize == "feature":
            gx = uv[..., 0] / (w_l - 1) * 2.0 - 1.0
            gy = uv[..., 1] / (h_l - 1) * 2.0 - 1.0
        else:
            gx = uv[..., 0] * (w_l / w_img) * (2.0 / max(w_l - 1, 1)) - 1.0
            gy = uv[..., 1] * (h_l / h_img) * (2.0 / max(h_l - 1, 1)) - 1.0
        grid = jnp.stack([gx, gy], axis=-1)
        return bilinear_taps(
            grid,
            h_l,
            w_l,
            align_corners=True,
            padding_mode=self.index_padding,
            pad_taps_to=8,  # the fused kernel's lane-padded tap width
        )

    @classmethod
    def from_conf(cls, conf, **kwargs) -> "SpatialEncoder":
        # reference encoder.py:235-252
        return cls(
            backbone=conf.get_string("backbone", "resnet34"),
            pretrained=conf.get_bool("pretrained", True),
            num_layers=conf.get_int("num_layers", 4),
            index_interp=conf.get_string("index_interp", "bilinear"),
            index_padding=conf.get_string("index_padding", "border"),
            upsample_interp=conf.get_string("upsample_interp", "bilinear"),
            feature_scale=conf.get_float("feature_scale", 1.0),
            use_first_pool=conf.get_bool("use_first_pool", True),
            norm_type=conf.get_string("norm_type", "batch"),
            use_multi_scale=conf.get_bool("use_multi_scale", False),
            index_normalize=conf.get_string("index_normalize", "image"),
            **kwargs,
        )


class GlobalEncoder(nn.Module):
    """Global image feature: ResNet trunk + global average pool -> (B, latent_size).

    Capability parity for the ``use_global_encoder`` path (models.py.backup2:62-66);
    the reference aliases ImageEncoder=SpatialEncoder but upstream's global encoder
    is a pooled ResNet code.
    """

    backbone: str = "resnet34"
    pretrained: bool = True
    latent_size: int = 128

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        feats = resnet.ResNetFeatures(
            backbone=self.backbone, num_layers=5, use_first_pool=True, name="model"
        )(x, train=train)
        pooled = jnp.mean(feats[-1], axis=(1, 2))  # (B, C)
        if pooled.shape[-1] != self.latent_size:
            pooled = nn.Dense(self.latent_size, name="fc")(pooled)
        return pooled

    @classmethod
    def from_conf(cls, conf, **kwargs) -> "GlobalEncoder":
        return cls(
            backbone=conf.get_string("backbone", "resnet34"),
            pretrained=conf.get_bool("pretrained", True),
            latent_size=conf.get_int("latent_size", 128),
            **kwargs,
        )


# Alias kept for reference-API compatibility (encoder.py:256)
ImageEncoder = GlobalEncoder
