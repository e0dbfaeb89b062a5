"""Differentiable fused ResnetFC — Pallas TPU forward + backward kernels.

Round-2 left the fused field kernel (`resnetfc_pallas`) eval-only: training
steps ran the memory-bound XLA MLP (every layer activation round-tripping
HBM) at 13% MFU on the reference recipe.  This module gives the fused kernel
a reverse-mode derivative so TRAINING rides the same VMEM-resident weights:

  * ``resnetfc_pallas_diff`` — a :func:`jax.custom_vjp` entry for the dense
    two-ref input layout ``(z, x)`` (the layout every train step produces;
    the deferred LatentGather / RawCode eval paths stay on the eval kernel).
  * Forward: the existing `_kernel_2d` / `_kernel_2d_mv` Mosaic kernels,
    bf16 operands with f32 MXU accumulation.
  * Backward: ONE Pallas kernel per point-block that (a) recomputes the
    forward activations entirely in VMEM (recompute-not-store: the only
    residuals saved are the kernel's own inputs — ~1 KB/point instead of
    ~20 KB/point of layer activations), then (b) backpropagates through the
    block, writing per-point ``dz``/``dx`` blocks and accumulating the
    weight gradients in VMEM across the sequential TPU grid (constant
    ``index_map`` outputs, zeroed at ``program_id == 0``).  All transposed
    products (``g @ W^T``, ``act^T @ g``) are ``dot_general`` contractions on
    the MXU — no materialized weight transposes.

Semantics: ResnetFC(beta=0, average combine), identical envelope to the
forward kernel (reference resnetfc.py:173-236 under autograd via
train/train.py:375-412 — the reference's dominant GPU consumer).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .resnetfc_pallas import (
    _ct,
    _kernel_2d,
    _kernel_2d_mv,
    _pad_last,
    _round_up,
)

Array = jnp.ndarray


class _Cfg(NamedTuple):
    """Static kernel configuration (hashable; nondiff arg of the custom_vjp)."""

    NS: int
    d_latent: int  # true latent width (0 = unconditioned)
    d_lat_in: int  # packed per-view z width (128 dummy when d_latent == 0)
    d_in: int  # true coordinate-code width
    d_in_pad: int  # packed per-view x width
    d_out: int
    d_out_pad: int
    n_blocks: int
    combine_layer: int
    n_lin_z: int
    planar_out: bool
    interpret: bool
    block_points: int
    bwd_block_points: int


# ---------------------------------------------------------------------------
# packing (plain differentiable jnp ops — their transposes ARE the unpacking)
# ---------------------------------------------------------------------------


def _pack_weights(params: dict, cfg: _Cfg):
    """ResnetFC param subtree -> the kernel's padded/stacked weight operands.

    Runs OUTSIDE the custom_vjp boundary: autodiff of these pads/stacks/casts
    routes the packed-weight cotangents back onto the original param tree
    (slice-of-pad, unstack, f32 accumulation of the bf16 cast) for free.
    """
    bf = _ct(cfg.interpret)
    H = params["lin_out"]["kernel"].shape[0]

    w_in = jnp.zeros((cfg.d_in_pad, H), bf)
    if cfg.d_in > 0:
        w_in = w_in.at[: cfg.d_in].set(params["lin_in"]["kernel"].astype(bf))
        b_in = params["lin_in"]["bias"].astype(jnp.float32)[None]
    else:
        b_in = jnp.zeros((1, H), jnp.float32)

    if cfg.n_lin_z > 0:
        w_z = jnp.stack(
            [
                params[f"lin_z_{k}"]["kernel"].astype(bf)
                for k in range(cfg.n_lin_z)
            ]
        )
        b_z = jnp.stack(
            [
                params[f"lin_z_{k}"]["bias"].astype(jnp.float32)[None]
                for k in range(cfg.n_lin_z)
            ]
        )
    else:
        w_z = jnp.zeros((1, max(cfg.d_latent, 1), H), bf)
        b_z = jnp.zeros((1, 1, H), jnp.float32)

    w_blk = jnp.stack(
        [
            jnp.stack(
                [
                    params[f"blocks_{k}"]["fc_0"]["kernel"].astype(bf),
                    params[f"blocks_{k}"]["fc_1"]["kernel"].astype(bf),
                ]
            )
            for k in range(cfg.n_blocks)
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
            for k in range(cfg.n_blocks)
        ]
    )
    w_out = jnp.zeros((H, cfg.d_out_pad), bf)
    w_out = w_out.at[:, : cfg.d_out].set(params["lin_out"]["kernel"].astype(bf))
    if cfg.planar_out:
        b_out = jnp.zeros((cfg.d_out_pad, 1), jnp.float32)
        b_out = b_out.at[: cfg.d_out, 0].set(
            params["lin_out"]["bias"].astype(jnp.float32)
        )
    else:
        b_out = jnp.zeros((1, cfg.d_out_pad), jnp.float32)
        b_out = b_out.at[0, : cfg.d_out].set(
            params["lin_out"]["bias"].astype(jnp.float32)
        )
    return (w_in, b_in, w_z, b_z, w_blk, b_blk, w_out, b_out)


# ---------------------------------------------------------------------------
# transposed-product helpers (MXU dot_general, no materialized transposes)
# ---------------------------------------------------------------------------


def _dot_gwT(a, w):
    """a @ w.T — contract last dims: (B, N) x (M, N) -> (B, M), f32 accum."""
    return jax.lax.dot_general(
        a, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_aTg(a, g):
    """a.T @ g — contract dim 0: (B, M) x (B, N) -> (M, N), f32 accum."""
    return jax.lax.dot_general(
        a, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _rowsum(g):
    return jnp.sum(g, axis=0, keepdims=True)  # (1, N) f32


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(
    g_ref,  # (BB, d_out_pad) f32, or (d_out_pad, BB) when planar
    z_ref,  # (BB, NS * d_lat_in) bf16
    x_ref,  # (BB, NS * d_in_pad) bf16
    w_in_ref,
    b_in_ref,
    w_z_ref,
    b_z_ref,
    w_blk_ref,
    b_blk_ref,
    w_out_ref,
    dz_ref,  # (BB, NS * d_lat_in) f32 out
    dx_ref,  # (BB, NS * d_in_pad) f32 out
    dw_in_ref,  # (d_in_pad, H) f32 out, accumulated over the grid
    db_in_ref,
    dw_z_ref,
    db_z_ref,
    dw_blk_ref,
    db_blk_ref,
    dw_out_ref,
    db_out_ref,
    *,
    cfg: _Cfg,
):
    """Fused recompute + backward for one point block.

    The forward recompute replays the EXACT forward kernel arithmetic (same
    bf16 casts, same f32 accumulation order), so the relu masks derived from
    the recomputed activations match the primal pass bit-for-bit.
    """
    NS = cfg.NS
    ct = _ct(cfg.interpret)
    n_blocks, cl = cfg.n_blocks, cfg.combine_layer
    has_z = cfg.d_latent > 0
    d_lat, d_x = cfg.d_lat_in, cfg.d_in_pad

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        for ref in (
            dw_in_ref,
            db_in_ref,
            dw_z_ref,
            db_z_ref,
            dw_blk_ref,
            db_blk_ref,
            dw_out_ref,
            db_out_ref,
        ):
            ref[...] = jnp.zeros_like(ref)

    zs = (
        [z_ref[:, v * d_lat : (v + 1) * d_lat] for v in range(NS)]
        if has_z
        else None
    )
    xfs = [x_ref[:, v * d_x : (v + 1) * d_x] for v in range(NS)]

    # ---- forward recompute, stashing the relu'd (bf16) operands ----
    xs = [
        jnp.dot(xfs[v], w_in_ref[:], preferred_element_type=jnp.float32)
        + b_in_ref[:]
        for v in range(NS)
    ]
    pre = [[None] * n_blocks for _ in range(NS)]  # (r, s) per view, k < n_pre
    post = [None] * n_blocks  # (r, s) shared, k >= combine point
    x = None  # combined trunk value
    for k in range(n_blocks):
        if k == cl and NS >= 1:
            x = xs[0] if NS == 1 else sum(xs) * (1.0 / NS)
        if x is not None:
            r = jnp.maximum(x, 0.0).astype(ct)
            h = (
                jnp.dot(r, w_blk_ref[k, 0], preferred_element_type=jnp.float32)
                + b_blk_ref[k, 0]
            )
            s = jnp.maximum(h, 0.0).astype(ct)
            x = x + (
                jnp.dot(s, w_blk_ref[k, 1], preferred_element_type=jnp.float32)
                + b_blk_ref[k, 1]
            )
            post[k] = (r, s)
            continue
        for v in range(NS):
            xv = xs[v]
            if has_z and k < cl:
                xv = xv + (
                    jnp.dot(
                        zs[v], w_z_ref[k], preferred_element_type=jnp.float32
                    )
                    + b_z_ref[k]
                )
            r = jnp.maximum(xv, 0.0).astype(ct)
            h = (
                jnp.dot(r, w_blk_ref[k, 0], preferred_element_type=jnp.float32)
                + b_blk_ref[k, 0]
            )
            s = jnp.maximum(h, 0.0).astype(ct)
            xs[v] = xv + (
                jnp.dot(s, w_blk_ref[k, 1], preferred_element_type=jnp.float32)
                + b_blk_ref[k, 1]
            )
            pre[v][k] = (r, s)
    if x is None:  # combine_layer >= n_blocks (NS == 1 only)
        x = xs[0]
    t = jnp.maximum(x, 0.0).astype(ct)

    # ---- backward ----
    g = g_ref[:]
    if cfg.planar_out:
        g = g.T  # (BB, d_out_pad) f32; free relayout vs the matmuls below
    gt = g.astype(ct)
    dw_out_ref[...] += _dot_aTg(t, gt)
    db_out_ref[...] += _rowsum(g)
    dt = _dot_gwT(gt, w_out_ref[:])  # (BB, H) f32
    # relu masks compare in f32: Mosaic has no bf16 vector cmpf on this
    # target ("Target does not support this comparison"), and the f32 cast
    # is a cheap VPU op
    mask = lambda a: (a.astype(jnp.float32) > 0).astype(jnp.float32)
    dxc = dt * mask(t)

    def block_bwd(k, dx_cur, r, s):
        """Backward through resblock k; returns d(input of block k)."""
        gb = dx_cur.astype(ct)
        dw_blk_ref[k, 1] += _dot_aTg(s, gb)
        db_blk_ref[k, 1] += _rowsum(dx_cur)
        ds = _dot_gwT(gb, w_blk_ref[k, 1])
        dh = ds * mask(s)
        dht = dh.astype(ct)
        dw_blk_ref[k, 0] += _dot_aTg(r, dht)
        db_blk_ref[k, 0] += _rowsum(dh)
        dr = _dot_gwT(dht, w_blk_ref[k, 0])
        return dx_cur + dr * mask(r)

    n_pre = min(cl, n_blocks)  # blocks below the combine point (per-view)
    for k in reversed(range(n_pre, n_blocks)):
        dxc = block_bwd(k, dxc, *post[k])

    # split across views at the combine mean (identity when NS == 1)
    dview = dxc if NS == 1 else dxc * (1.0 / NS)
    for v in range(NS):
        dv = dview
        dzv = None  # accumulates the view's latent cotangent across lin_z_k
        for k in reversed(range(n_pre)):
            dv = block_bwd(k, dv, *pre[v][k])
            if cfg.n_lin_z > 0:  # injection happened at every k < n_pre
                dvt = dv.astype(ct)
                dw_z_ref[k] += _dot_aTg(zs[v], dvt)
                db_z_ref[k] += _rowsum(dv)
                c = _dot_gwT(dvt, w_z_ref[k])  # (BB, d_lat) f32
                dzv = c if dzv is None else dzv + c
        if dzv is not None:
            dz_ref[:, v * d_lat : (v + 1) * d_lat] = dzv
        dvt = dv.astype(ct)
        dw_in_ref[...] += _dot_aTg(xfs[v], dvt)
        db_in_ref[...] += _rowsum(dv)
        dx_ref[:, v * d_x : (v + 1) * d_x] = _dot_gwT(dvt, w_in_ref[:])
    if cfg.n_lin_z == 0:
        # no injection anywhere (d_latent == 0, or combine_layer == 0): the
        # latent operand (possibly a dummy) contributes nothing
        dz_ref[...] = jnp.zeros_like(dz_ref)


# ---------------------------------------------------------------------------
# custom_vjp core over PACKED operands
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _core(cfg: _Cfg, weights: Tuple[Array, ...], z_in: Array, x_in: Array):
    return _fwd_call(cfg, weights, z_in, x_in)


def _fwd_call(cfg: _Cfg, weights, z_in, x_in):
    """Forward pallas_call on pre-packed operands (shared with the eval path's
    kernel bodies; dummies stand in for the fused-code refs)."""
    B_pad = x_in.shape[0]
    BB = min(cfg.block_points, B_pad)
    n_grid = B_pad // BB
    bf = _ct(cfg.interpret)
    H = weights[0].shape[1]

    wc = jnp.zeros((1, 128), bf)
    fc = pc = mc = jnp.zeros((1, 128), jnp.float32)
    weight_args = weights + (wc, fc, pc, mc)
    weight_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weight_args)

    if cfg.NS == 1:
        kern = functools.partial(
            _kernel_2d,
            d_latent=cfg.d_latent,
            n_blocks=cfg.n_blocks,
            combine_layer=cfg.combine_layer,
            planar_out=cfg.planar_out,
            fused_code=False,
            interpret=cfg.interpret,
        )
    else:
        kern = functools.partial(
            _kernel_2d_mv,
            NS=cfg.NS,
            d_latent=cfg.d_latent,
            d_x=cfg.d_in_pad,
            n_blocks=cfg.n_blocks,
            combine_layer=cfg.combine_layer,
            planar_out=cfg.planar_out,
            fused_code=False,
            interpret=cfg.interpret,
        )
    in_specs = [
        pl.BlockSpec(
            (BB, z_in.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (BB, x_in.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    ]
    if cfg.planar_out:
        out_spec = pl.BlockSpec(
            (cfg.d_out_pad, BB), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((cfg.d_out_pad, B_pad), jnp.float32)
    else:
        out_spec = pl.BlockSpec(
            (BB, cfg.d_out_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((B_pad, cfg.d_out_pad), jnp.float32)

    flops_per_pt = 2 * H * (
        cfg.d_in_pad
        + 2 * cfg.n_blocks * H
        + cfg.n_lin_z * cfg.d_latent
        + cfg.d_out_pad
    )
    return pl.pallas_call(
        kern,
        grid=(n_grid,),
        in_specs=in_specs + weight_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pt * cfg.NS * B_pad,
            bytes_accessed=z_in.size * 2 + x_in.size * 2 + B_pad * cfg.d_out_pad * 4,
            transcendentals=0,
        ),
        interpret=cfg.interpret,
    )(z_in, x_in, *weight_args)


def _core_fwd(cfg, weights, z_in, x_in):
    out = _fwd_call(cfg, weights, z_in, x_in)
    return out, (weights, z_in, x_in)


def _core_bwd(cfg, res, g):
    weights, z_in, x_in = res
    (w_in, b_in, w_z, b_z, w_blk, b_blk, w_out, b_out) = weights
    B_pad = x_in.shape[0]
    BB = min(cfg.bwd_block_points, B_pad)
    n_grid = B_pad // BB
    H = w_in.shape[1]

    kern = functools.partial(_bwd_kernel, cfg=cfg)
    if cfg.planar_out:
        g_spec = pl.BlockSpec(
            (cfg.d_out_pad, BB), lambda i: (0, i), memory_space=pltpu.VMEM
        )
    else:
        g_spec = pl.BlockSpec(
            (BB, cfg.d_out_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
    const = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [
        g_spec,
        pl.BlockSpec(
            (BB, z_in.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (BB, x_in.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    ] + [const()] * 7  # w_in, b_in, w_z, b_z, w_blk, b_blk, w_out
    # weight-grad outputs: ONE block revisited every grid step (sequential TPU
    # grid) — zeroed at program 0, accumulated in VMEM, flushed once at end
    acc_spec = lambda nd: pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct(z_in.shape, jnp.float32),  # dz
        jax.ShapeDtypeStruct(x_in.shape, jnp.float32),  # dx
        jax.ShapeDtypeStruct(w_in.shape, jnp.float32),
        jax.ShapeDtypeStruct(b_in.shape, jnp.float32),
        jax.ShapeDtypeStruct(w_z.shape, jnp.float32),
        jax.ShapeDtypeStruct(b_z.shape, jnp.float32),
        jax.ShapeDtypeStruct(w_blk.shape, jnp.float32),
        jax.ShapeDtypeStruct(b_blk.shape, jnp.float32),
        jax.ShapeDtypeStruct(w_out.shape, jnp.float32),
        jax.ShapeDtypeStruct((1, cfg.d_out_pad), jnp.float32),  # db_out row
    )
    out_specs = (
        pl.BlockSpec(
            (BB, z_in.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (BB, x_in.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    ) + tuple(acc_spec(s) for s in out_shapes[2:])

    flops_per_pt = 6 * H * (
        cfg.d_in_pad
        + 2 * cfg.n_blocks * H
        + cfg.n_lin_z * cfg.d_latent
        + cfg.d_out_pad
    )
    outs = pl.pallas_call(
        kern,
        grid=(n_grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pt * cfg.NS * B_pad,
            bytes_accessed=(z_in.size + x_in.size) * 6 + B_pad * cfg.d_out_pad * 4,
            transcendentals=0,
        ),
        interpret=cfg.interpret,
    )(g, z_in, x_in, w_in, b_in, w_z, b_z, w_blk, b_blk, w_out)

    dz, dx, dw_in, db_in, dw_z, db_z, dw_blk, db_blk, dw_out, db_out_row = outs
    db_out = (
        db_out_row.reshape(cfg.d_out_pad, 1)
        if cfg.planar_out
        else db_out_row
    )
    cast = lambda v, like: v.astype(like.dtype)
    dweights = (
        cast(dw_in, w_in),
        cast(db_in, b_in),
        cast(dw_z, w_z),
        cast(db_z, b_z),
        cast(dw_blk, w_blk),
        cast(db_blk, b_blk),
        cast(dw_out, w_out),
        cast(db_out, b_out),
    )
    if cfg.n_lin_z == 0:
        # the packed w_z/b_z are dummies with no param lineage; zero their
        # cotangents so nothing leaks through the dummy path
        dweights = dweights[:2] + (
            jnp.zeros_like(w_z),
            jnp.zeros_like(b_z),
        ) + dweights[4:]
    return (dweights, cast(dz, z_in), cast(dx, x_in))


_core.defvjp(_core_fwd, _core_bwd)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def resnetfc_pallas_diff(
    params: dict,
    zx,
    NS: int,
    d_latent: int,
    d_in: int,
    n_blocks: int,
    combine_layer: int,
    d_out: int = 4,
    sb: int = 1,
    block_points: int = 1024,
    bwd_block_points: int = 512,
    interpret: bool = False,
    planar_out: bool = False,
) -> Array:
    """Differentiable fused ResnetFC evaluation -> ``(1, SB*B, d_out)`` (or
    ``(1, d_out, SB*B)`` channel-major with ``planar_out``).

    Dense inputs only: ``zx`` is the concatenated ``(SB*NS*B, d_latent + d_in)``
    array or a tuple ``(z, x)`` of dense arrays (``z`` may be None when
    ``d_latent == 0``).  Deferred LatentGather / RawCode inputs use the
    eval-only :func:`resnetfc_pallas.resnetfc_pallas`.

    :param sb: outer superbatch (object) count.  Rows arrive object-major
        ``(SB, NS, B)``-flattened (reference combine_interleaved layout,
        util.py:466-476); the view mean at combine_layer only spans the NS
        views of one object, so multi-view packing must interleave per object.
    """
    if isinstance(zx, tuple):
        z, x_part = zx
        assert (z is None) == (d_latent == 0)
        if z is not None:
            z = z.reshape(-1, z.shape[-1])
        x_part = x_part.reshape(-1, x_part.shape[-1])
    else:
        total, D = zx.shape
        assert D == d_latent + d_in, (D, d_latent, d_in)
        z = zx[..., :d_latent] if d_latent > 0 else None
        x_part = zx[..., d_latent:]
    total = x_part.shape[0]
    assert total % (NS * sb) == 0, (total, NS, sb)
    assert NS == 1 or combine_layer < n_blocks
    assert x_part.shape[-1] == d_in, (x_part.shape, d_in)
    B = total // NS  # kernel-visible point count (sb folded in)
    B_obj = B // sb  # per-object points (the multi-view interleave stride)

    bf = _ct(interpret)
    d_in_pad = max(_round_up(d_in, 128), 128)
    d_out_pad = max(_round_up(d_out, 8), 8) if planar_out else 128
    d_lat_in = d_latent if d_latent > 0 else 128
    n_lin_z = min(combine_layer, n_blocks) if d_latent > 0 else 0

    BB = min(block_points, _round_up(B, 128))
    B_pad = _round_up(B, BB)
    pad_b = B_pad - B
    # block sizes must tile B_pad for BOTH fwd and bwd grids
    bwd_bb = min(bwd_block_points, BB)
    while BB % bwd_bb:
        bwd_bb -= 128
    bwd_bb = max(bwd_bb, 128)

    cfg = _Cfg(
        NS=NS,
        d_latent=d_latent,
        d_lat_in=d_lat_in,
        d_in=d_in,
        d_in_pad=d_in_pad,
        d_out=d_out,
        d_out_pad=d_out_pad,
        n_blocks=n_blocks,
        combine_layer=combine_layer,
        n_lin_z=n_lin_z,
        planar_out=planar_out,
        interpret=interpret,
        block_points=BB,
        bwd_block_points=bwd_bb,
    )
    weights = _pack_weights(params, cfg)

    def pack_pm(a, width, dtype):
        """(SB*NS*B_obj, width_raw) -> point-major (B_pad, NS*width) padded.

        Rows are object-major (s, v, b); point-major packing interleaves the
        NS views of each (s, b) point into one row: row s*B_obj+b holds view
        column groups [v0 | v1 | ...]."""
        a = _pad_last(a, width, dtype)
        if NS > 1:
            a = (
                a.reshape(sb, NS, B_obj, width)
                .transpose(0, 2, 1, 3)
                .reshape(B, NS * width)
            )
        if pad_b:
            a = jnp.pad(a, ((0, pad_b), (0, 0)))
        return a

    x_in = pack_pm(x_part, d_in_pad, bf)
    if d_latent > 0:
        z_in = pack_pm(z, d_latent, bf)
    else:
        z_in = jnp.zeros((B_pad, NS * d_lat_in), bf)

    out = _core(cfg, weights, z_in, x_in)

    if planar_out:
        return out[:d_out, :B][None]  # (1, d_out, B)
    return out[:B, :d_out][None]  # (1, B, d_out)
