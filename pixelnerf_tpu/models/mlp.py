"""IGR-style implicit MLP decoder (``type = mlp``) — Flax.

Semantics follow the reference ImplicitNet (mlp.py:7-137): configurable hidden dims,
input skip connections scaled by 1/sqrt(2), multi-view combination at
``combine_layer``, geometric SDF initialization of the last layer (sphere of
``radius_init``; negated IDR convention, inside positive), and zeroing of the
positional-encoding input columns at layer 0 / skip layers.

Note: in the reference this path is unreachable through ``make_mlp`` due to a missing
import (model_util.py:5-8, SURVEY §0.6); it is fully functional here.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.geometry import combine_interleaved

Array = jnp.ndarray


class ImplicitNet(nn.Module):
    d_in: int
    dims: Sequence[int]
    skip_in: Sequence[int] = ()
    d_out: int = 4
    geometric_init: bool = True
    radius_init: float = 0.3
    beta: float = 0.0
    output_init_gain: float = 2.0
    num_position_inputs: int = 3
    sdf_scale: float = 1.0
    dim_excludes_skip: bool = False
    combine_layer: int = 1000
    combine_type: str = "average"

    def _layer_dims(self) -> list:
        dims = [self.d_in] + list(self.dims) + [self.d_out]
        if self.dim_excludes_skip:
            for i in range(1, len(dims) - 1):
                if i in self.skip_in:
                    dims[i] += self.d_in
        return dims

    def _make_inits(self, layer: int, in_dim: int, out_dim: int, is_last: bool):
        d_in = self.d_in
        if not self.geometric_init:
            kinit = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
            return kinit, nn.initializers.zeros

        if is_last:
            mean0 = -math.sqrt(math.pi) / math.sqrt(in_dim) * self.sdf_scale

            def kernel_init(key, shape, dtype=jnp.float32):
                # flax kernels are (in, out); torch rows are out.
                k0, k1 = jax.random.split(key)
                col0 = mean0 + 1e-5 * jax.random.normal(k0, (shape[0], 1), dtype)
                rest = self.output_init_gain * jax.random.normal(
                    k1, (shape[0], shape[1] - 1), dtype
                )
                return jnp.concatenate([col0, rest], axis=1)

            def bias_init(key, shape, dtype=jnp.float32):
                b = jnp.zeros(shape, dtype)
                return b.at[0].set(self.radius_init)

            return kernel_init, bias_init

        std = math.sqrt(2.0) / math.sqrt(out_dim)

        def kernel_init(key, shape, dtype=jnp.float32):
            w = std * jax.random.normal(key, shape, dtype)
            if d_in > self.num_position_inputs and (
                layer == 0 or layer in self.skip_in
            ):
                # zero the positional-encoding input rows (mlp.py:86-88)
                n_zero = d_in - self.num_position_inputs
                w = w.at[shape[0] - n_zero :, :].set(0.0)
            return w

        return kernel_init, nn.initializers.zeros

    @nn.compact
    def __call__(
        self,
        x,
        combine_inner_dims: Sequence[int] = (1,),
        planar_out: bool = False,
    ) -> Array:
        if type(x) is tuple:  # (z, x) parts — see ResnetFC.__call__
            from ..ops.resnetfc_pallas import materialize_parts

            z_p, x_p = materialize_parts(*x)
            if z_p is not None:
                x = jnp.concatenate([z_p, x_p], axis=-1)
            else:
                x = x_p
        dims = self._layer_dims()
        num_layers = len(dims)
        if self.beta > 0:
            act = lambda v: nn.softplus(v * self.beta) / self.beta
        else:
            act = nn.relu

        x_init = x
        for layer in range(num_layers - 1):
            if layer + 1 in self.skip_in:
                out_dim = dims[layer + 1] - self.d_in
            else:
                out_dim = dims[layer + 1]

            if layer == self.combine_layer:
                x = combine_interleaved(x, combine_inner_dims, self.combine_type)
                x_init = combine_interleaved(
                    x_init, combine_inner_dims, self.combine_type
                )

            if layer < self.combine_layer and layer in self.skip_in:
                x = jnp.concatenate([x, x_init], axis=-1) / math.sqrt(2.0)

            kinit, binit = self._make_inits(
                layer, x.shape[-1], out_dim, is_last=layer == num_layers - 2
            )
            x = nn.Dense(
                out_dim, kernel_init=kinit, bias_init=binit, name=f"lin{layer}"
            )(x)
            if layer < num_layers - 2:
                x = act(x)
        if planar_out:
            x = jnp.swapaxes(x, -1, -2)
        return x

    @classmethod
    def from_conf(cls, conf, d_in: int, **kwargs) -> "ImplicitNet":
        # reference mlp.py:125-137
        return cls(
            d_in,
            conf.get_list("dims"),
            skip_in=tuple(conf.get_list("skip_in", [])),
            beta=conf.get_float("beta", 0.0),
            dim_excludes_skip=conf.get_bool("dim_excludes_skip", False),
            combine_layer=conf.get_int("combine_layer", 1000),
            combine_type=conf.get_string("combine_type", "average"),
            **kwargs,
        )
