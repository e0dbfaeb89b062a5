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

Layout: the latent ``z`` and coordinate code ``x`` are passed as SEPARATE refs —
the caller never materializes the concatenated (d_latent + d_in) tensor, and
when ``z`` arrives already in bf16 with ``B % block_points == 0`` it streams
straight from the gather output with zero repacking (the dominant non-MLP HBM
cost otherwise).  Multi-view (NS > 1) inputs are packed POINT-MAJOR — all NS
views of a point live in one row as per-view column groups — so every kernel
block stays plain 2D (a (NS, BB, D) 3D layout compiled ~10x slower under Mosaic
and ran below peak); the combine-layer multi-view mean happens inside the
block, so multi-view inputs need no cross-block communication.  ``z`` may also
be a :class:`LatentGather`, deferring the pixel-aligned bilinear lookup into
the kernel as a one-hot matmul against a VMEM-resident feature table.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


class LatentGather(NamedTuple):
    """A deferred pixel-aligned feature lookup: ``z[i] = sum_j w[i,j] * table[idx[i,j]]``.

    Instead of gathering the 4 bilinear corner rows from HBM (~190 GB/s
    effective — 4 x C x 2 bytes per point), the fused kernel keeps ``table``
    VMEM-resident and evaluates the lookup as a one-hot matmul on the MXU
    (2*T*C FLOPs/point; profitable whenever T = H_l*W_l is small, e.g. 1024
    rows for 64px inputs).  Exactly reproduces border-clamped bilinear
    grid_sample: clamped duplicate corners simply accumulate their weights.
    """

    table: Array  # (T, C) flattened feature rows
    idx: Array  # (B, 4) int32 flat row indices (already padding-resolved)
    w: Array  # (B, 4) f32 bilinear corner weights (0 for masked-out corners)


class RawCode(NamedTuple):
    """Deferred positional encoding: the field kernel receives the RAW per-view
    coordinate features ``x (B, d_raw)`` (camera-space xyz [+ viewdirs], ~8
    columns) plus the flat code arrays from
    :meth:`PositionalEncoding.flat_arrays`, and evaluates

        xg = x @ w;  enc = where(m, sin(xg * f + p), xg)

    in-register before ``lin_in``.  The encoded (B, d_in~42 -> 128-padded)
    tensor therefore never exists in HBM — input traffic per point drops from
    256 B (bf16 x128 code) to 32 B (f32 x8 raw), and the XLA-side positional
    encode + pad/convert disappear entirely."""

    x: Array  # (B, d_raw) raw coordinate features
    w: Array  # (d_raw, d_code) channel-select matrix
    f: Array  # (d_code,) per-column frequency (1 for passthrough)
    p: Array  # (d_code,) per-column phase
    m: Array  # (d_code,) 1.0 where sin applies, 0.0 passthrough
    cd: Optional[Array] = None  # (0,) compute-dtype marker: under AMP the
    # bounded encoded output is cast to cd.dtype (x itself stays f32 — pre-sin
    # rounding is amplified by the code frequencies)


def materialize_code(rc: RawCode) -> Array:
    """XLA fallback: resolve a RawCode to the dense encoded (B, d_code) array
    (same math as PositionalEncoding._encode + tail concat).

    The select-matmul and sin always run in f32 — pre-sin rounding of the
    coordinates is amplified by the code frequencies (see _x_feat).  Non-f32
    inputs (AMP) get the f32-encoded result cast back to their dtype, matching
    the default AMP path (which casts the bounded encoded features, never the
    raw coordinates)."""
    with jax.named_scope("positional_enc"):  # reference code.py:40 cut point
        xg = jnp.einsum(
            "...i,io->...o",
            rc.x.astype(jnp.float32),
            rc.w.astype(jnp.float32),
            precision="highest",
        )
        enc = jnp.sin(xg * rc.f + rc.p)
        out_dtype = rc.cd.dtype if rc.cd is not None else rc.x.dtype
        return jnp.where(rc.m > 0, enc, xg).astype(out_dtype)


def materialize_parts(z, x):
    """Resolve deferred kernel inputs (LatentGather latent / RawCode code) to
    dense arrays for the XLA fallback, unifying dtypes the AMP way: if either
    side is bf16, both sides run in bf16 — the code itself is still evaluated
    in f32 (materialize_code) and only its bounded output is downcast, so the
    deferred path matches the default AMP path's numerics AND its compute
    dtype (no silent f32 upcast of the whole MLP)."""
    if not hasattr(x, "dtype"):  # RawCode
        x = materialize_code(x)
    if z is not None and not hasattr(z, "dtype"):  # LatentGather
        z = materialize_gather(z)
    if z is not None and z.dtype != x.dtype:
        dt = (
            jnp.bfloat16
            if jnp.bfloat16 in (z.dtype, x.dtype)
            else x.dtype
        )
        z = z.astype(dt)
        x = x.astype(dt)
    return z, x


def materialize_gather(g: LatentGather) -> Array:
    """XLA fallback: resolve a LatentGather to dense (B, C) features.

    ``table`` may be (T, C) or per-view (NS, T, C) with view-major idx/w —
    per-view indices are offset into the flattened table.
    """
    table, idx = g.table, g.idx
    if table.ndim == 3:
        NS, T, C = table.shape
        B = idx.shape[0] // NS
        offs = (jnp.arange(NS, dtype=idx.dtype) * T)[:, None, None]
        idx = (idx.reshape(NS, B, -1) + offs).reshape(NS * B, -1)
        table = table.reshape(NS * T, C)
    rows = jnp.take(table, idx.reshape(-1), axis=0)
    rows = rows.reshape(idx.shape + (table.shape[-1],))  # (B, 4, C)
    return jnp.sum(rows * g.w[..., None].astype(rows.dtype), axis=-2)


def _ct(interpret: bool):
    """Kernel compute dtype: bf16 on TPU; f32 under interpret mode (the CPU
    DotThunk backing interpret mode has no bf16 path for narrow outputs)."""
    return jnp.float32 if interpret else jnp.bfloat16


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _x_feat(xr, wc_ref, fc_ref, pc_ref, mc_ref, fused_code, interpret):
    """Deferred positional code (see RawCode): applied in-register when
    ``fused_code``; otherwise ``xr`` already holds the encoded features.

    The channel-select "matmul" runs as an unrolled broadcast-MAC over the
    d_raw (~8) input columns on the VPU — exact f32 (Mosaic's f32 ``dot``
    defaults to a single bf16 MXU pass, whose ~1e-3 relative error is
    amplified by the sin frequencies to O(1) feature error) and off the MXU,
    which the surrounding MLP matmuls saturate."""
    if not fused_code:
        return xr
    xg = (xr[:, 0:1] * wc_ref[0:1, :]).astype(jnp.float32)
    for j in range(1, wc_ref.shape[0]):
        xg = xg + xr[:, j : j + 1] * wc_ref[j : j + 1, :]
    enc = jnp.sin(xg * fc_ref[:] + pc_ref[:])
    enc = jnp.where(mc_ref[:] > 0, enc, xg)
    return enc.astype(_ct(interpret))


def _kernel_2d(
    z_ref,  # (BB, d_latent) bf16   (dummy (BB, 128) zeros when d_latent==0)
    x_ref,  # (BB, d_in_pad) bf16 | (BB, d_raw_pad) f32 raw coords (fused_code)
    w_in_ref,  # (d_in_pad, H) bf16
    b_in_ref,  # (1, H) f32
    w_z_ref,  # (n_lin_z, d_latent, H) bf16
    b_z_ref,  # (n_lin_z, 1, H) f32
    w_blk_ref,  # (n_blocks, 2, H, H) bf16
    b_blk_ref,  # (n_blocks, 2, 1, H) f32
    w_out_ref,  # (H, d_out_pad) bf16
    b_out_ref,  # (1, d_out_pad) or (d_out_pad, 1) f32
    wc_ref,  # (d_raw_pad, d_in_pad) code select matrix ((1, 128) dummy unless fused_code)
    fc_ref,  # (1, d_in_pad) code frequencies
    pc_ref,  # (1, d_in_pad) code phases
    mc_ref,  # (1, d_in_pad) code sin mask
    out_ref,  # (BB, d_out_pad) or (d_out_pad, BB) f32
    *,
    d_latent: int,
    n_blocks: int,
    combine_layer: int,
    planar_out: bool,
    fused_code: bool = False,
    interpret: bool = False,
):
    """Single-view (NS==1) fast path: plain 2D blocks compile ~10x faster under
    Mosaic than the (NS, BB, D) 3D layout and run at ~92% of the chip's matmul
    peak (115 vs 112-124 TFLOP/s measured).

    With ``planar_out`` the result is written channel-major ``(d_out_pad, BB)``:
    downstream compositing then reads each output channel as a contiguous row.
    Column-slicing a (B, 128) result instead costs ~70 ms per 917k points in XLA
    (lane-select + relayout) — more than the entire MLP; the in-kernel (BB, 8)
    transpose is free.
    """
    xf = _x_feat(x_ref[:], wc_ref, fc_ref, pc_ref, mc_ref, fused_code, interpret)
    x = (
        jnp.dot(xf, w_in_ref[:], preferred_element_type=jnp.float32)
        + b_in_ref[:]
    )
    for k in range(n_blocks):
        if d_latent > 0 and k < combine_layer:
            x = x + (
                jnp.dot(z_ref[:], w_z_ref[k], preferred_element_type=jnp.float32)
                + b_z_ref[k]
            )
        h = (
            jnp.dot(
                jnp.maximum(x, 0.0).astype(_ct(interpret)),
                w_blk_ref[k, 0],
                preferred_element_type=jnp.float32,
            )
            + b_blk_ref[k, 0]
        )
        dx = (
            jnp.dot(
                jnp.maximum(h, 0.0).astype(_ct(interpret)),
                w_blk_ref[k, 1],
                preferred_element_type=jnp.float32,
            )
            + b_blk_ref[k, 1]
        )
        x = x + dx
    res = jnp.dot(
        jnp.maximum(x, 0.0).astype(_ct(interpret)),
        w_out_ref[:],
        preferred_element_type=jnp.float32,
    )
    if planar_out:
        out_ref[:] = res.T + b_out_ref[:]
    else:
        out_ref[:] = res + b_out_ref[:]


def _kernel_2d_gather(
    idx_ref,  # (BB, 8) int32 — cols 0..3 are the bilinear corner rows
    w_ref,  # (BB, 8) f32 — cols 0..3 are the corner weights
    x_ref,  # (BB, d_in_pad) bf16 | (BB, d_raw_pad) f32 raw coords (fused_code)
    table_ref,  # (T, C) bf16 — VMEM-resident flattened feature map
    w_in_ref,
    b_in_ref,
    w_z_ref,
    b_z_ref,
    w_blk_ref,
    b_blk_ref,
    w_out_ref,
    b_out_ref,
    wc_ref,
    fc_ref,
    pc_ref,
    mc_ref,
    out_ref,  # (d_out_pad, BB) f32 (planar) or (BB, d_out_pad)
    *,
    n_blocks: int,
    combine_layer: int,
    planar_out: bool,
    fused_code: bool = False,
    interpret: bool = False,
):
    """NS==1 fast path with the feature gather fused in: the bilinear lookup is
    a one-hot (BB, T) @ (T, C) matmul against the VMEM-resident table (see
    LatentGather).  The one-hot is built from 4 iota compares on the VPU."""
    BB = idx_ref.shape[0]
    T = table_ref.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (BB, T), 1)
    idx = idx_ref[:]
    w4 = w_ref[:]
    S = jnp.zeros((BB, T), jnp.float32)
    for j in range(4):
        S = S + jnp.where(iota == idx[:, j : j + 1], 1.0, 0.0) * w4[:, j : j + 1]
    z = jnp.dot(
        S.astype(_ct(interpret)), table_ref[:], preferred_element_type=jnp.float32
    ).astype(_ct(interpret))

    xf = _x_feat(x_ref[:], wc_ref, fc_ref, pc_ref, mc_ref, fused_code, interpret)
    x = (
        jnp.dot(xf, w_in_ref[:], preferred_element_type=jnp.float32)
        + b_in_ref[:]
    )
    for k in range(n_blocks):
        if k < combine_layer:
            x = x + (
                jnp.dot(z, w_z_ref[k], preferred_element_type=jnp.float32)
                + b_z_ref[k]
            )
        h = (
            jnp.dot(
                jnp.maximum(x, 0.0).astype(_ct(interpret)),
                w_blk_ref[k, 0],
                preferred_element_type=jnp.float32,
            )
            + b_blk_ref[k, 0]
        )
        dx = (
            jnp.dot(
                jnp.maximum(h, 0.0).astype(_ct(interpret)),
                w_blk_ref[k, 1],
                preferred_element_type=jnp.float32,
            )
            + b_blk_ref[k, 1]
        )
        x = x + dx
    res = jnp.dot(
        jnp.maximum(x, 0.0).astype(_ct(interpret)),
        w_out_ref[:],
        preferred_element_type=jnp.float32,
    )
    if planar_out:
        out_ref[:] = res.T + b_out_ref[:]
    else:
        out_ref[:] = res + b_out_ref[:]


def _resblock(x, k, w_blk_ref, b_blk_ref, interpret):
    """ResnetBlockFC: x + fc_1(relu(fc_0(relu(x))))."""
    h = (
        jnp.dot(
            jnp.maximum(x, 0.0).astype(_ct(interpret)),
            w_blk_ref[k, 0],
            preferred_element_type=jnp.float32,
        )
        + b_blk_ref[k, 0]
    )
    dx = (
        jnp.dot(
            jnp.maximum(h, 0.0).astype(_ct(interpret)),
            w_blk_ref[k, 1],
            preferred_element_type=jnp.float32,
        )
        + b_blk_ref[k, 1]
    )
    return x + dx


def _mv_body(
    zs,  # list of NS per-view latents (BB, d_latent) or None
    xs,  # list of NS per-view lin_in activations (BB, H)
    w_z_ref,
    b_z_ref,
    w_blk_ref,
    b_blk_ref,
    w_out_ref,
    b_out_ref,
    out_ref,
    *,
    n_blocks,
    combine_layer,
    planar_out,
    interpret,
):
    """Shared multi-view trunk: per-view inject+resblock branches until
    ``combine_layer``, mean across views, then the shared tail.  Matches
    ResnetFC semantics exactly (inject only while blkid < combine_layer,
    reference resnetfc.py:203-232)."""
    NS = len(xs)
    x = None  # combined
    for k in range(n_blocks):
        if k == combine_layer:
            x = xs[0] if NS == 1 else sum(xs) * (1.0 / NS)
        if x is not None:
            x = _resblock(x, k, w_blk_ref, b_blk_ref, interpret)
            continue
        for v in range(NS):
            xv = xs[v]
            if zs is not None:
                xv = xv + (
                    jnp.dot(
                        zs[v], w_z_ref[k], preferred_element_type=jnp.float32
                    )
                    + b_z_ref[k]
                )
            xs[v] = _resblock(xv, k, w_blk_ref, b_blk_ref, interpret)
    if x is None:  # combine_layer >= n_blocks (only legal for NS == 1)
        x = xs[0]
    res = jnp.dot(
        jnp.maximum(x, 0.0).astype(_ct(interpret)),
        w_out_ref[:],
        preferred_element_type=jnp.float32,
    )
    if planar_out:
        out_ref[:] = res.T + b_out_ref[:]
    else:
        out_ref[:] = res + b_out_ref[:]


def _kernel_2d_mv(
    z_ref,  # (BB, NS * d_latent) bf16, point-major per-view column groups
    x_ref,  # (BB, NS * d_x) bf16 (encoded) | f32 raw coords (fused_code)
    w_in_ref,
    b_in_ref,
    w_z_ref,
    b_z_ref,
    w_blk_ref,
    b_blk_ref,
    w_out_ref,
    b_out_ref,
    wc_ref,
    fc_ref,
    pc_ref,
    mc_ref,
    out_ref,
    *,
    NS: int,
    d_latent: int,
    d_x: int,
    n_blocks: int,
    combine_layer: int,
    planar_out: bool,
    fused_code: bool = False,
    interpret: bool = False,
):
    """Multi-view point-major kernel: all NS views of a point live in one row as
    column groups, so blocks stay plain 2D (the (NS, BB, D) 3D layout compiled
    ~10x slower under Mosaic and ran below peak).  Per-view branches unroll in
    Python; the view mean happens at combine_layer."""
    zs = None
    if d_latent > 0:
        zs = [
            z_ref[:, v * d_latent : (v + 1) * d_latent] for v in range(NS)
        ]
    xs = [
        jnp.dot(
            _x_feat(
                x_ref[:, v * d_x : (v + 1) * d_x],
                wc_ref, fc_ref, pc_ref, mc_ref, fused_code, interpret,
            ),
            w_in_ref[:],
            preferred_element_type=jnp.float32,
        )
        + b_in_ref[:]
        for v in range(NS)
    ]
    _mv_body(
        zs,
        xs,
        w_z_ref,
        b_z_ref,
        w_blk_ref,
        b_blk_ref,
        w_out_ref,
        b_out_ref,
        out_ref,
        n_blocks=n_blocks,
        combine_layer=combine_layer,
        planar_out=planar_out,
        interpret=interpret,
    )


def _kernel_2d_mv_gather(
    idx_ref,  # (BB, NS * 8) int32 — per-view column groups, cols 0..3 used
    w4_ref,  # (BB, NS * 8) f32
    x_ref,  # (BB, NS * d_x) bf16 (encoded) | f32 raw coords (fused_code)
    table_ref,  # (NS, T, C) bf16 — per-view VMEM-resident feature tables
    w_in_ref,
    b_in_ref,
    w_z_ref,
    b_z_ref,
    w_blk_ref,
    b_blk_ref,
    w_out_ref,
    b_out_ref,
    wc_ref,
    fc_ref,
    pc_ref,
    mc_ref,
    out_ref,
    *,
    NS: int,
    d_x: int,
    n_blocks: int,
    combine_layer: int,
    planar_out: bool,
    fused_code: bool = False,
    interpret: bool = False,
):
    """Multi-view fused-gather kernel: per-view one-hot matmuls against the
    stacked (NS, T, C) table (see LatentGather / _kernel_2d_gather)."""
    BB = idx_ref.shape[0]
    T = table_ref.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (BB, T), 1)
    zs = []
    for v in range(NS):
        S = jnp.zeros((BB, T), jnp.float32)
        for j in range(4):
            c = v * 8 + j
            S = S + (
                jnp.where(iota == idx_ref[:, c : c + 1], 1.0, 0.0)
                * w4_ref[:, c : c + 1]
            )
        zs.append(
            jnp.dot(
                S.astype(_ct(interpret)),
                table_ref[v],
                preferred_element_type=jnp.float32,
            ).astype(_ct(interpret))
        )
    xs = [
        jnp.dot(
            _x_feat(
                x_ref[:, v * d_x : (v + 1) * d_x],
                wc_ref, fc_ref, pc_ref, mc_ref, fused_code, interpret,
            ),
            w_in_ref[:],
            preferred_element_type=jnp.float32,
        )
        + b_in_ref[:]
        for v in range(NS)
    ]
    _mv_body(
        zs,
        xs,
        w_z_ref,
        b_z_ref,
        w_blk_ref,
        b_blk_ref,
        w_out_ref,
        b_out_ref,
        out_ref,
        n_blocks=n_blocks,
        combine_layer=combine_layer,
        planar_out=planar_out,
        interpret=interpret,
    )


def _pad_last(x: Array, to: int, dtype) -> Array:
    """astype + zero-pad the last axis (no-op copy avoided when possible)."""
    x = x.astype(dtype)
    pad = to - x.shape[-1]
    if pad > 0:
        x = jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, pad),))
    return x


def resnetfc_pallas(
    params: dict,
    zx: Union[Array, Tuple[Optional[Array], Array]],
    NS: int,
    d_latent: int,
    d_in: int,
    n_blocks: int,
    combine_layer: int,
    d_out: int = 4,
    sb: int = 1,
    block_points: int = 1024,
    interpret: bool = False,
    planar_out: bool = False,
) -> Array:
    """Evaluate ResnetFC -> ``(1, B, d_out)``, or ``(1, d_out, B)`` channel-major
    when ``planar_out`` (matching the XLA ResnetFC output shape for
    combine_inner_dims=(NS, B)).

    :param zx: either the concatenated ``(NS*B, d_latent + d_in)`` array, or a
        tuple ``(z, x)`` of ``(NS*B, d_latent)`` latent (may be None/bf16, or a
        :class:`LatentGather`) and ``(NS*B, d_in)`` coordinate code (may be a
        :class:`RawCode` whose positional encoding is then evaluated in-kernel)
        — the fast path that skips repacking
    :param params: the ResnetFC param subtree (lin_in / lin_z_k / blocks_k / lin_out)
    :param planar_out: write the result channel-major — each output channel lands
        as a contiguous row, so compositing never column-slices (see _kernel_2d)
    :param sb: outer superbatch (object) count.  Rows arrive object-major
        ``(SB, NS, B)``-flattened (reference combine_interleaved layout,
        util.py:466-476); the view mean at combine_layer only spans the NS
        views of one object, so multi-view packing interleaves per object.
    """
    raw_code = False
    if isinstance(zx, tuple):
        z, x_part = zx
        if isinstance(x_part, RawCode):
            # deferred positional code: pack the raw coords, evaluate the
            # code in-register inside the kernel (see RawCode)
            raw_code = True
            rc = x_part
            x_part = rc.x
            assert rc.w.shape[-1] == d_in, (rc.w.shape, d_in)
        else:
            assert x_part.shape[-1] == d_in, (x_part.shape, d_in)
        total = x_part.shape[0]
        assert (z is None) == (d_latent == 0)
        if isinstance(z, LatentGather):
            assert z.table.shape[-1] == d_latent, (z.table.shape, d_latent)
            if NS > 1:
                assert z.table.ndim == 3 and z.table.shape[0] == NS, (
                    "multi-view fused gather needs per-view tables (NS, T, C)",
                    z.table.shape,
                    NS,
                )
    else:
        total, D = zx.shape
        assert D == d_latent + d_in, (D, d_latent, d_in)
        z = zx[..., :d_latent] if d_latent > 0 else None
        x_part = zx[..., d_latent:]
    assert total % (NS * sb) == 0, (total, NS, sb)
    assert NS == 1 or combine_layer < n_blocks, (
        "multi-view inputs require an in-range combine_layer"
    )
    assert sb == 1 or not isinstance(z, LatentGather), (
        "fused gather tables are per-object (one table set in VMEM): SB must be 1"
    )
    B = total // NS  # kernel-visible point count (sb folded in)
    B_obj = B // sb  # per-object points (the multi-view interleave stride)
    H = params["lin_out"]["kernel"].shape[0]

    bf = _ct(interpret)
    d_in_pad = max(_round_up(d_in, 128), 128)
    # planar: d_out rides the sublane dim (min tile 8 for f32); otherwise it is
    # the lane dim and must pad to 128
    d_out_pad = max(_round_up(d_out, 8), 8) if planar_out else 128

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
    if planar_out:
        b_out = jnp.zeros((d_out_pad, 1), jnp.float32)
        b_out = b_out.at[:d_out, 0].set(
            params["lin_out"]["bias"].astype(jnp.float32)
        )
    else:
        b_out = jnp.zeros((1, d_out_pad), jnp.float32)
        b_out = b_out.at[0, :d_out].set(
            params["lin_out"]["bias"].astype(jnp.float32)
        )

    # ---- pack inputs ----
    BB = min(block_points, _round_up(B, 128))
    B_pad = _round_up(B, BB)
    pad_b = B_pad - B
    n_grid = B_pad // BB
    flops_per_pt = 2 * H * (d_in_pad + 2 * n_blocks * H + n_lin_z * d_latent + d_out_pad)

    # ---- deferred positional-code arrays (dummies when not raw_code) ----
    if raw_code:
        d_x = max(_round_up(rc.w.shape[0], 8), 8)  # packed raw-coord width
        wc = jnp.zeros((d_x, d_in_pad), jnp.float32)
        wc = wc.at[: rc.w.shape[0], :d_in].set(rc.w.astype(jnp.float32))
        fc = jnp.ones((1, d_in_pad), jnp.float32)
        fc = fc.at[0, :d_in].set(rc.f.astype(jnp.float32))
        pc = jnp.zeros((1, d_in_pad), jnp.float32)
        pc = pc.at[0, :d_in].set(rc.p.astype(jnp.float32))
        mc = jnp.zeros((1, d_in_pad), jnp.float32)
        mc = mc.at[0, :d_in].set(rc.m.astype(jnp.float32))
        flops_per_pt += 2 * d_x * d_in_pad
    else:
        d_x = d_in_pad
        wc = jnp.zeros((1, 128), bf)
        fc = pc = mc = jnp.zeros((1, 128), jnp.float32)

    def pack_x(a2d):
        """astype+pad the coordinate input to its packed kernel width (raw
        coords keep their dtype — the in-kernel code computes in f32)."""
        return _pad_last(a2d, d_x, a2d.dtype if raw_code else bf)

    weight_args = (w_in, b_in, w_z, b_z, w_blk, b_blk, w_out, b_out, wc, fc, pc, mc)
    weight_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weight_args)

    if NS == 1 and isinstance(z, LatentGather):
        x_in = pack_x(x_part.reshape(B, -1))
        idx_in = _pad_last(z.idx.reshape(B, -1), 8, jnp.int32)
        w_in_taps = _pad_last(z.w.reshape(B, -1), 8, jnp.float32)
        if pad_b:
            x_in = jnp.pad(x_in, ((0, pad_b), (0, 0)))
            idx_in = jnp.pad(idx_in, ((0, pad_b), (0, 0)))
            w_in_taps = jnp.pad(w_in_taps, ((0, pad_b), (0, 0)))
        kern = functools.partial(
            _kernel_2d_gather,
            n_blocks=n_blocks,
            combine_layer=combine_layer,
            planar_out=planar_out,
            fused_code=raw_code,
            interpret=interpret,
        )
        in_specs = [
            pl.BlockSpec((BB, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, d_x), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # table, VMEM-resident
        ]
        point_args = (idx_in, w_in_taps, x_in, z.table.astype(bf))
        in_bytes = idx_in.size * 4 + w_in_taps.size * 4 + x_in.size * x_in.dtype.itemsize
    elif NS == 1:
        x_in = pack_x(x_part.reshape(B, -1))
        if pad_b:
            x_in = jnp.pad(x_in, ((0, pad_b), (0, 0)))
        if d_latent > 0:
            # fast path: z already bf16 and aligned -> streams with zero copies
            z_in = z.reshape(B, d_latent).astype(bf)
            if pad_b:
                z_in = jnp.pad(z_in, ((0, pad_b), (0, 0)))
            d_lat_in = d_latent
        else:
            z_in = jnp.zeros((B_pad, 128), bf)
            d_lat_in = 128
        kern = functools.partial(
            _kernel_2d,
            d_latent=d_latent,
            n_blocks=n_blocks,
            combine_layer=combine_layer,
            planar_out=planar_out,
            fused_code=raw_code,
            interpret=interpret,
        )
        in_specs = [
            pl.BlockSpec((BB, d_lat_in), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, d_x), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        point_args = (z_in, x_in)
        in_bytes = z_in.size * 2 + x_in.size * x_in.dtype.itemsize
    else:
        # multi-view: point-major column groups — all NS views of a point in
        # one row, so blocks stay 2D (see _kernel_2d_mv)
        def to_point_major(a, width):
            # rows are object-major (s, v, b): interleave the NS views of each
            # (s, b) point into one row of per-view column groups
            a = a.reshape(sb, NS, B_obj, width).transpose(0, 2, 1, 3)
            a = a.reshape(B, NS * width)
            if pad_b:
                a = jnp.pad(a, ((0, pad_b), (0, 0)))
            return a

        x_in = to_point_major(pack_x(x_part.reshape(NS * B, -1)), d_x)
        if isinstance(z, LatentGather):
            idx_in = to_point_major(
                _pad_last(z.idx.reshape(NS * B, -1), 8, jnp.int32), 8
            )
            w_in_taps = to_point_major(
                _pad_last(z.w.reshape(NS * B, -1), 8, jnp.float32), 8
            )
            kern = functools.partial(
                _kernel_2d_mv_gather,
                NS=NS,
                d_x=d_x,
                n_blocks=n_blocks,
                combine_layer=combine_layer,
                planar_out=planar_out,
                fused_code=raw_code,
                interpret=interpret,
            )
            in_specs = [
                pl.BlockSpec((BB, NS * 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BB, NS * 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (BB, NS * d_x), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # (NS, T, C) tables
            ]
            point_args = (idx_in, w_in_taps, x_in, z.table.astype(bf))
            in_bytes = (
                idx_in.size * 4
                + w_in_taps.size * 4
                + x_in.size * x_in.dtype.itemsize
            )
        else:
            if d_latent > 0:
                z_in = to_point_major(z.reshape(NS * B, d_latent).astype(bf), d_latent)
                d_lat_in = d_latent
            else:
                z_in = jnp.zeros((B_pad, NS * 128), bf)
                d_lat_in = 128
            kern = functools.partial(
                _kernel_2d_mv,
                NS=NS,
                d_latent=d_latent,
                d_x=d_x,
                n_blocks=n_blocks,
                combine_layer=combine_layer,
                planar_out=planar_out,
                fused_code=raw_code,
                interpret=interpret,
            )
            in_specs = [
                pl.BlockSpec(
                    (BB, NS * d_lat_in), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (BB, NS * d_x), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
            ]
            point_args = (z_in, x_in)
            in_bytes = z_in.size * 2 + x_in.size * x_in.dtype.itemsize

    if planar_out:
        out_spec = pl.BlockSpec(
            (d_out_pad, BB), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((d_out_pad, B_pad), jnp.float32)
    else:
        out_spec = pl.BlockSpec(
            (BB, d_out_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((B_pad, d_out_pad), jnp.float32)

    out = pl.pallas_call(
        kern,
        grid=(n_grid,),
        in_specs=in_specs + weight_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        # The default 16 MB scoped-VMEM budget is too tight once the resident
        # weights (+ per-view lin_in/lin_z stacks and latent tables at NS=3,
        # e.g. the DTU 3-view recipe) share it with the result buffer XLA
        # stack-allocates in VMEM; the chip has 128 MB of VMEM.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pt * NS * B_pad,
            bytes_accessed=in_bytes + B_pad * d_out_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*point_args, *weight_args)

    if planar_out:
        return out[:d_out, :B][None]  # (1, d_out, B)
    return out[:B, :d_out][None]  # (1, B, d_out)


def supports(beta: float, use_spade: bool, combine_type: str) -> bool:
    """Config envelope the kernel implements; others use the XLA path."""
    return beta == 0.0 and not use_spade and combine_type == "average"
