"""Fused ResnetFC field evaluation — Pallas TPU kernel.

The conditioned NeRF MLP (ResnetFC) dominates render FLOPs (~7.4 MFLOP/point at
d_hidden=512).  Under plain XLA every layer's activations round-trip through HBM
(~23 GB per 786k-point chunk), making the bf16 path memory-bound.  This kernel
keeps ALL MLP weights resident in VMEM (bf16, ~7 MB) and processes point blocks
whose activations live entirely in VMEM/registers: per block it runs

    x = lin_in(x_part); for k: [x += lin_z_k(z)] ; x = resblock_k(x)
    [multi-view mean at combine_layer] ; out = lin_out(relu(x))

with bf16 operands and fp32 MXU accumulation (``preferred_element_type``) —
numerically the same contract as the bf16-AMP XLA path.

Semantics match ResnetFC(beta=0, average combine) exactly
(reference resnetfc.py:173-236); softplus/SPADE/max-combine configs fall back to
the XLA implementation.

Layout: points are view-major ``zx (NS, B, d_latent + d_in)``; the grid tiles B.
The combine-layer multi-view mean happens inside the block (all NS rows of a
point share a block), so multi-view inputs need no cross-block communication.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(
    zx_ref,  # (NS, BB, d_latent + d_in_pad) bf16
    w_in_ref,  # (d_in_pad, H) bf16
    b_in_ref,  # (1, H) f32
    w_z_ref,  # (n_lin_z, d_latent, H) bf16  (dummy (1,1,H) when d_latent==0)
    b_z_ref,  # (n_lin_z, 1, H) f32
    w_blk_ref,  # (n_blocks, 2, H, H) bf16
    b_blk_ref,  # (n_blocks, 2, 1, H) f32
    w_out_ref,  # (H, d_out_pad) bf16
    b_out_ref,  # (1, d_out_pad) f32
    out_ref,  # (BB, d_out_pad) f32
    *,
    NS: int,
    d_latent: int,
    n_blocks: int,
    combine_layer: int,
):
    H = w_in_ref.shape[1]
    BB = zx_ref.shape[1]

    zx = zx_ref[:]  # (NS, BB, D)
    z = zx[..., :d_latent].reshape(NS * BB, d_latent) if d_latent > 0 else None
    x_part = zx[..., d_latent:].reshape(NS * BB, -1)

    x = (
        jnp.dot(x_part, w_in_ref[:], preferred_element_type=jnp.float32)
        + b_in_ref[:]
    )

    for k in range(n_blocks):
        if k == combine_layer and NS > 1:
            x = jnp.mean(x.reshape(NS, BB, H), axis=0)
        if d_latent > 0 and k < combine_layer:
            tz = (
                jnp.dot(
                    z, w_z_ref[k], preferred_element_type=jnp.float32
                )
                + b_z_ref[k]
            )
            x = x + tz
        # ResnetBlockFC: x + fc_1(relu(fc_0(relu(x))))
        h = (
            jnp.dot(
                jnp.maximum(x, 0.0).astype(jnp.bfloat16),
                w_blk_ref[k, 0],
                preferred_element_type=jnp.float32,
            )
            + b_blk_ref[k, 0]
        )
        dx = (
            jnp.dot(
                jnp.maximum(h, 0.0).astype(jnp.bfloat16),
                w_blk_ref[k, 1],
                preferred_element_type=jnp.float32,
            )
            + b_blk_ref[k, 1]
        )
        x = x + dx

    out_ref[:] = (
        jnp.dot(
            jnp.maximum(x, 0.0).astype(jnp.bfloat16),
            w_out_ref[:],
            preferred_element_type=jnp.float32,
        )
        + b_out_ref[:]
    )


def resnetfc_pallas(
    params: dict,
    zx: Array,
    NS: int,
    d_latent: int,
    d_in: int,
    n_blocks: int,
    combine_layer: int,
    d_out: int = 4,
    block_points: int = 1024,
    interpret: bool = False,
) -> Array:
    """Evaluate ResnetFC at ``zx (NS*B, d_latent + d_in)`` -> ``(1, B, d_out)``
    (matching the XLA ResnetFC output shape for combine_inner_dims=(NS, B)).

    :param params: the ResnetFC param subtree (lin_in / lin_z_k / blocks_k / lin_out)
    """
    total, D = zx.shape
    assert D == d_latent + d_in, (D, d_latent, d_in)
    assert total % NS == 0
    assert NS == 1 or combine_layer < n_blocks, (
        "multi-view inputs require an in-range combine_layer"
    )
    B = total // NS
    H = params["lin_out"]["kernel"].shape[0]

    bf = jnp.bfloat16
    d_in_pad = max(_round_up(d_in, 128), 128)
    d_out_pad = 128  # d_out=4 padded up to a lane tile

    # ---- pack weights ----
    w_in = jnp.zeros((d_in_pad, H), bf)
    if d_in > 0:
        w_in = w_in.at[:d_in].set(params["lin_in"]["kernel"].astype(bf))
        b_in = params["lin_in"]["bias"].astype(jnp.float32)[None]
    else:
        b_in = jnp.zeros((1, H), jnp.float32)

    n_lin_z = min(combine_layer, n_blocks) if d_latent > 0 else 0
    if n_lin_z > 0:
        w_z = jnp.stack(
            [params[f"lin_z_{k}"]["kernel"].astype(bf) for k in range(n_lin_z)]
        )
        b_z = jnp.stack(
            [
                params[f"lin_z_{k}"]["bias"].astype(jnp.float32)[None]
                for k in range(n_lin_z)
            ]
        )
    else:
        w_z = jnp.zeros((1, max(d_latent, 1), H), bf)
        b_z = jnp.zeros((1, 1, H), jnp.float32)

    w_blk = jnp.stack(
        [
            jnp.stack(
                [
                    params[f"blocks_{k}"]["fc_0"]["kernel"].astype(bf),
                    params[f"blocks_{k}"]["fc_1"]["kernel"].astype(bf),
                ]
            )
            for k in range(n_blocks)
        ]
    )
    b_blk = jnp.stack(
        [
            jnp.stack(
                [
                    params[f"blocks_{k}"]["fc_0"]["bias"].astype(jnp.float32)[None],
                    params[f"blocks_{k}"]["fc_1"]["bias"].astype(jnp.float32)[None],
                ]
            )
            for k in range(n_blocks)
        ]
    )
    w_out = jnp.zeros((H, d_out_pad), bf)
    w_out = w_out.at[:, :d_out].set(params["lin_out"]["kernel"].astype(bf))
    b_out = jnp.zeros((1, d_out_pad), jnp.float32)
    b_out = b_out.at[0, :d_out].set(params["lin_out"]["bias"].astype(jnp.float32))

    # ---- pack input: (NS, B_pad, d_latent + d_in_pad), bf16 ----
    BB = min(block_points, _round_up(B, 128))
    B_pad = _round_up(B, BB)
    zxr = zx.reshape(NS, B, D).astype(bf)
    zx_pad = jnp.zeros((NS, B_pad, d_latent + d_in_pad), bf)
    zx_pad = zx_pad.at[:, :B, :d_latent].set(zxr[..., :d_latent])
    zx_pad = zx_pad.at[:, :B, d_latent : d_latent + d_in].set(zxr[..., d_latent:])

    n_grid = B_pad // BB
    Dp = d_latent + d_in_pad

    kern = functools.partial(
        _kernel,
        NS=NS,
        d_latent=d_latent,
        n_blocks=n_blocks,
        combine_layer=combine_layer,
    )
    flops_per_pt = 2 * H * (d_in_pad + 2 * n_blocks * H + n_lin_z * d_latent + d_out_pad)
    out = pl.pallas_call(
        kern,
        grid=(n_grid,),
        in_specs=[
            pl.BlockSpec((NS, BB, Dp), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BB, d_out_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B_pad, d_out_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pt * NS * B_pad,
            bytes_accessed=zx_pad.size * 2 + B_pad * d_out_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(zx_pad, w_in, b_in, w_z, b_z, w_blk, b_blk, w_out, b_out)

    return out[:B, :d_out][None]  # (1, B, d_out)


def supports(beta: float, use_spade: bool, combine_type: str) -> bool:
    """Config envelope the kernel implements; others use the XLA path."""
    return beta == 0.0 and not use_spade and combine_type == "average"
