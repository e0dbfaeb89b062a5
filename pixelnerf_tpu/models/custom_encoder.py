"""ConvEncoder — simple U-Net-style convolutional encoder (Flax, NHWC).

Alternative lightweight encoder matching the reference ConvEncoder
(custom_encoder.py:7-94): 7x7/2 stem, 3 stride-2 down convs (channel doubling),
a 4x4/4 bottleneck conv whose output is broadcast back over the deepest spatial
grid, skip-connected transposed-conv decoder, 128-channel output at full input
resolution.  Group norm + LeakyReLU, SAME-style padding.

Not referenced by any shipped config (same as upstream) but part of the
capability surface; usable through ``encoder { type = conv }``.
"""

from __future__ import annotations

from typing import List

import flax.linen as nn
import jax.numpy as jnp

Array = jnp.ndarray


def _gn(ch: int, name: str):
    return nn.GroupNorm(num_groups=min(32, ch), name=name)


class ConvEncoder(nn.Module):
    dim_in: int = 3
    use_leaky_relu: bool = True
    use_skip_conn: bool = True
    first_layer_chnls: int = 64
    mid_layer_chnls: int = 128
    last_layer_chnls: int = 128
    n_down_layers: int = 3

    @property
    def latent_size(self) -> int:
        return self.last_layer_chnls

    # kept for parity with SpatialEncoder's interface
    use_multi_scale: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        """:param x: (B, H, W, 3) -> (B, H, W, last_layer_chnls)"""
        act = nn.leaky_relu if self.use_leaky_relu else nn.relu

        x = nn.Conv(
            self.first_layer_chnls,
            (7, 7),
            strides=(2, 2),
            padding="SAME",
            use_bias=False,
            name="conv_in",
        )(x)
        x = act(_gn(self.first_layer_chnls, "norm_in")(x))

        inters: List[Array] = []
        chnls = self.first_layer_chnls
        for i in range(self.n_down_layers):
            x = nn.Conv(
                2 * chnls,
                (3, 3),
                strides=(2, 2),
                padding="SAME",
                use_bias=False,
                name=f"conv{i}",
            )(x)
            x = act(_gn(2 * chnls, f"norm{i}")(x))
            inters.append(x)
            chnls *= 2

        x = nn.Conv(
            self.mid_layer_chnls,
            (4, 4),
            strides=(4, 4),
            padding="SAME",
            use_bias=False,
            name="conv_mid",
        )(x)
        x = act(_gn(self.mid_layer_chnls, "norm_mid")(x))
        # global bottleneck broadcast over the deepest grid
        B = x.shape[0]
        x = x.reshape(B, 1, 1, -1)
        deep_h, deep_w = inters[-1].shape[1:3]
        x = jnp.broadcast_to(x, (B, deep_h, deep_w, x.shape[-1]))

        for i in reversed(range(self.n_down_layers)):
            if self.use_skip_conn:
                x = jnp.concatenate([x, inters[i]], axis=-1)
            out_ch = self.first_layer_chnls * (2**i)
            x = nn.ConvTranspose(
                out_ch,
                (3, 3),
                strides=(2, 2),
                padding="SAME",
                use_bias=False,
                name=f"deconv{i}",
            )(x)
            x = act(_gn(out_ch, f"denorm{i}")(x))

        x = nn.ConvTranspose(
            self.last_layer_chnls,
            (3, 3),
            strides=(2, 2),
            padding="SAME",
            name="deconv_last",
        )(x)
        return x

    def index(self, latents, uv: Array, image_shape) -> Array:
        """Pixel-aligned sampling, same contract as SpatialEncoder.index."""
        from ..ops.grid_sample import grid_sample

        w_img, h_img = image_shape
        h_l, w_l = latents.shape[1], latents.shape[2]
        gx = uv[..., 0] * (w_l / w_img) * (2.0 / max(w_l - 1, 1)) - 1.0
        gy = uv[..., 1] * (h_l / h_img) * (2.0 / max(h_l - 1, 1)) - 1.0
        return grid_sample(latents, jnp.stack([gx, gy], axis=-1))

    @classmethod
    def from_conf(cls, conf, **kwargs) -> "ConvEncoder":
        return cls(
            dim_in=conf.get_int("dim_in", 3),
            use_leaky_relu=conf.get_bool("use_leaky_relu", True),
            use_skip_conn=conf.get_bool("use_skip_conn", True),
            **kwargs,
        )
