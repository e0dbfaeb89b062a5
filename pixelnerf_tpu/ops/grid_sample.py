"""Pixel-aligned feature sampling (the TPU equivalent of CUDA ``F.grid_sample``).

The reference's hottest memory op is bilinear feature-map sampling at scattered ray
points, done by torch's CUDA grid_sample kernel (encoder.py:182-205).  Here it is an
XLA gather: features are kept NHWC (the natural TPU conv layout), flattened to
(B, H*W, C), and the four bilinear corners are fetched with ``take_along_axis`` then
lerped on the VPU.  XLA fuses the address math + gathers + lerp into a single loop,
so there is no intermediate (B, N, 2) grid tensor like in torch.

Semantics match ``torch.nn.functional.grid_sample`` with ``align_corners=True`` and
padding modes border / zeros / reflection, plus nearest/bilinear interpolation — the
exact configuration surface of the reference encoder (encoder.py:23-26,51-55).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

Array = jnp.ndarray

# feature tables up to this many rows backprop via a chunked one-hot matmul
# (MXU); larger tables fall back to XLA scatter-add.  The point-chunk size
# adapts to the table so the one-hot S matrix stays within a fixed VMEM
# footprint.  The default is the measured crossover on one v5e chip at
# N=12032, C=512 (grad-of-sum through gather_taps, 5-call mean): one-hot/
# scatter ms = 9.0/12.7 at T=4096, 10.3/12.7 at 8k, 12.5/13.8 at 16k,
# 22.0/15.5 at 30k — the one-hot matmul cost scales with T and loses to
# scatter near T~20k (docs/PERFORMANCE.md "Training at realistic scale").
_ONEHOT_BWD_MAX_ROWS = int(
    os.environ.get("PIXELNERF_ONEHOT_BWD_MAX_ROWS", 16384)
)
# cap on chunk*T one-hot elements (bf16 S tile ~32 MB at the default)
_ONEHOT_BWD_MAX_S_ELEMS = 1 << 24


@jax.custom_vjp
def gather_taps(flat: Array, idx: Array, w: Array) -> Array:
    """Weighted tap gather: ``out[b,n] = sum_j w[b,n,j] * flat[b, idx[b,n,j]]``.

    The forward is the standard bilinear 4-tap lookup (use
    :func:`bilinear_taps` to build idx/w from normalized uv).  The backward
    treats the tap WEIGHTS as frozen (zero cotangent) — valid here because uv
    is always a camera projection of non-trainable inputs (poses/focal/ray
    points are data in every pixelNeRF recipe; the reference's grid_sample
    grid-gradients are computed but never reach a parameter).  In exchange the
    feature-table gradient becomes a chunked one-hot MATMUL on the MXU instead
    of an XLA scatter-add (which dominates the naive train step backward).
    """
    return _gather_taps_fwd(flat, idx, w)[0]


def _gather_taps_fwd(flat, idx, w):
    out = None
    for j in range(idx.shape[-1]):
        v = jnp.take_along_axis(flat, idx[..., j][..., None], axis=1)
        v = v * w[..., j][..., None].astype(flat.dtype)
        out = v if out is None else out + v
    # residuals hold a zero-width stub of the feature table purely for its
    # shape/dtype — a dtype object itself is not a valid jax residual under
    # checkpointing
    return out, (jnp.zeros_like(flat, shape=flat.shape[:2] + (0,)), idx, w)


def _gather_taps_bwd(res, g):
    flat_stub, idx, w = res
    flat_dtype = flat_stub.dtype
    B, T = flat_stub.shape[:2]
    C = g.shape[-1]
    n_taps = idx.shape[-1]
    g = g.astype(jnp.float32)

    if T <= _ONEHOT_BWD_MAX_ROWS:
        def per_view(idx_b, w_b, g_b):
            N = idx_b.shape[0]
            chunk = min(max(_ONEHOT_BWD_MAX_S_ELEMS // T, 128), N)
            n_chunks = -(-N // chunk)
            pad = n_chunks * chunk - N
            idx_p = jnp.pad(idx_b, ((0, pad), (0, 0)), constant_values=0)
            # zero weights on padding -> padded rows contribute nothing
            w_p = jnp.pad(w_b, ((0, pad), (0, 0)))
            g_p = jnp.pad(g_b, ((0, pad), (0, 0)))

            def one(args):
                ic, wc, gc = args
                iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, T), 1)
                S = jnp.zeros((chunk, T), jnp.float32)
                for j in range(n_taps):
                    S = S + (
                        jnp.where(iota == ic[:, j : j + 1], 1.0, 0.0)
                        * wc[:, j : j + 1]
                    )
                return jnp.dot(
                    S.T.astype(jnp.bfloat16),
                    gc.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )

            def step(acc, args):
                # carried (T, C) accumulator: lax.map + sum would materialize
                # all n_chunks partials (n_chunks x T x C blows HBM at DTU
                # full-res shapes)
                return acc + one(args), None

            acc, _ = jax.lax.scan(
                step,
                jnp.zeros((T, g_b.shape[-1]), jnp.float32),
                (
                    idx_p.reshape(n_chunks, chunk, n_taps),
                    w_p.reshape(n_chunks, chunk, n_taps),
                    g_p.reshape(n_chunks, chunk, -1),
                ),
            )
            return acc

        d_flat = jax.vmap(per_view)(idx, w, g)
    else:
        d_flat = jnp.zeros((B, T, C), jnp.float32)
        for j in range(n_taps):
            d_flat = d_flat.at[
                jnp.arange(B)[:, None], idx[..., j]
            ].add(g * w[..., j][..., None])

    return d_flat.astype(flat_dtype), None, jnp.zeros_like(w)


gather_taps.defvjp(_gather_taps_fwd, _gather_taps_bwd)


def _unnormalize(coord: Array, size: int, align_corners: bool) -> Array:
    """[-1, 1] -> pixel coordinates."""
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _reflect(x: Array, lo: float, hi: float) -> Array:
    """Reflect coordinates into [lo, hi] (torch 'reflection', align_corners=True)."""
    if lo == hi:
        return jnp.zeros_like(x)
    span = hi - lo
    x = jnp.abs(x - lo) % (2 * span)
    return hi - jnp.abs(x - span)


def grid_sample(
    feat: Array,
    uv: Array,
    align_corners: bool = True,
    padding_mode: str = "border",
    mode: str = "bilinear",
) -> Array:
    """Sample `feat` at normalized points `uv`.

    :param feat: (B, H, W, C) feature maps (NHWC — TPU conv layout)
    :param uv: (B, N, 2) sample points in [-1, 1], uv[..., 0]=x, uv[..., 1]=y
    :param padding_mode: 'border' | 'zeros' | 'reflection'
    :param mode: 'bilinear' | 'nearest'
    :return: (B, N, C) sampled features
    """
    B, H, W, C = feat.shape
    x = _unnormalize(uv[..., 0].astype(jnp.float32), W, align_corners)
    y = _unnormalize(uv[..., 1].astype(jnp.float32), H, align_corners)

    # Sanitize non-finite coordinates (points projected from near a source
    # camera's z=0 plane give uv -> inf, and inf - floor(inf) = NaN).
    x = jnp.nan_to_num(x, nan=-2.0, posinf=1e7, neginf=-1e7)
    y = jnp.nan_to_num(y, nan=-2.0, posinf=1e7, neginf=-1e7)

    if padding_mode == "reflection":
        x = _reflect(x, 0.0, float(W - 1))
        y = _reflect(y, 0.0, float(H - 1))
    else:
        # clamp just outside the valid range: preserves border-clamp and
        # zeros-mask semantics, keeps floor()/wx exact for huge coords
        x = jnp.clip(x, -2.0, W + 1.0)
        y = jnp.clip(y, -2.0, H + 1.0)

    flat = feat.reshape(B, H * W, C)

    def gather(ix: Array, iy: Array) -> Array:
        idx = (iy * W + ix).astype(jnp.int32)  # (B, N)
        return jnp.take_along_axis(flat, idx[..., None], axis=1)  # (B, N, C)

    if mode == "nearest":
        # torch rounds half away from bankers' semantics here; round-to-nearest-even
        # differences only matter at exact .5 boundaries.
        ix = jnp.clip(jnp.round(x), 0, W - 1).astype(jnp.int32)
        iy = jnp.clip(jnp.round(y), 0, H - 1).astype(jnp.int32)
        out = gather(ix, iy)
        if padding_mode == "zeros":
            valid = (
                (x >= -0.5) & (x <= W - 0.5) & (y >= -0.5) & (y <= H - 0.5)
            )
            out = out * valid[..., None].astype(out.dtype)
        return out

    if mode != "bilinear":
        raise NotImplementedError(f"grid_sample mode {mode!r}")

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f  # (B, N)
    wy = y - y0f

    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    x0c = jnp.clip(x0, 0, W - 1)
    x1c = jnp.clip(x1, 0, W - 1)
    y0c = jnp.clip(y0, 0, H - 1)
    y1c = jnp.clip(y1, 0, H - 1)

    v00 = gather(x0c, y0c)
    v01 = gather(x1c, y0c)
    v10 = gather(x0c, y1c)
    v11 = gather(x1c, y1c)

    if padding_mode == "zeros":
        def in_x(ix):
            return ((ix >= 0) & (ix <= W - 1)).astype(jnp.float32)

        def in_y(iy):
            return ((iy >= 0) & (iy <= H - 1)).astype(jnp.float32)

        m00 = (in_x(x0) * in_y(y0))[..., None]
        m01 = (in_x(x1) * in_y(y0))[..., None]
        m10 = (in_x(x0) * in_y(y1))[..., None]
        m11 = (in_x(x1) * in_y(y1))[..., None]
        v00, v01, v10, v11 = v00 * m00, v01 * m01, v10 * m10, v11 * m11
    # 'border' and 'reflection' are handled by clamping/reflecting coordinates.

    wx = wx[..., None]
    wy = wy[..., None]
    # lerp arithmetic promotes to f32 (weights are f32); the result is cast back
    # to the feature dtype so a bf16 feature table yields a bf16 sample stream
    # (half the HBM write traffic) — XLA fuses gather+lerp+cast into one loop.
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return (top * (1 - wy) + bot * wy).astype(feat.dtype)


def bilinear_taps(
    uv: Array,
    height: int,
    width: int,
    align_corners: bool = True,
    padding_mode: str = "border",
    pad_taps_to: int = 0,
):
    """Decompose a bilinear grid_sample into its 4 (index, weight) taps.

    Same coordinate semantics as :func:`grid_sample` (bilinear); the returned
    taps satisfy ``sample = sum_j w[..., j] * flat_feat[idx[..., j]]`` with
    ``flat_feat = feat.reshape(H*W, C)``.  Used by the fused Pallas field
    kernel to evaluate the lookup as a one-hot matmul against a VMEM-resident
    feature table (ops.resnetfc_pallas.LatentGather).

    :param uv: (..., 2) sample points in [-1, 1]
    :return: (idx (..., 4) int32, w (..., 4) f32)
    """
    H, W = height, width
    x = _unnormalize(uv[..., 0].astype(jnp.float32), W, align_corners)
    y = _unnormalize(uv[..., 1].astype(jnp.float32), H, align_corners)
    x = jnp.nan_to_num(x, nan=-2.0, posinf=1e7, neginf=-1e7)
    y = jnp.nan_to_num(y, nan=-2.0, posinf=1e7, neginf=-1e7)

    if padding_mode == "reflection":
        x = _reflect(x, 0.0, float(W - 1))
        y = _reflect(y, 0.0, float(H - 1))
    else:
        x = jnp.clip(x, -2.0, W + 1.0)
        y = jnp.clip(y, -2.0, H + 1.0)

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    x0c = jnp.clip(x0, 0, W - 1)
    x1c = jnp.clip(x1, 0, W - 1)
    y0c = jnp.clip(y0, 0, H - 1)
    y1c = jnp.clip(y1, 0, H - 1)

    w00 = (1 - wx) * (1 - wy)
    w01 = wx * (1 - wy)
    w10 = (1 - wx) * wy
    w11 = wx * wy
    if padding_mode == "zeros":
        in_x0 = ((x0 >= 0) & (x0 <= W - 1)).astype(jnp.float32)
        in_x1 = ((x1 >= 0) & (x1 <= W - 1)).astype(jnp.float32)
        in_y0 = ((y0 >= 0) & (y0 <= H - 1)).astype(jnp.float32)
        in_y1 = ((y1 >= 0) & (y1 <= H - 1)).astype(jnp.float32)
        w00 = w00 * in_x0 * in_y0
        w01 = w01 * in_x1 * in_y0
        w10 = w10 * in_x0 * in_y1
        w11 = w11 * in_x1 * in_y1

    idx_list = [y0c * W + x0c, y0c * W + x1c, y1c * W + x0c, y1c * W + x1c]
    w_list = [w00, w01, w10, w11]
    if pad_taps_to > 4:
        # stack straight into the kernel's lane-padded width (weight 0 ->
        # padding rows contribute nothing); avoids a later pad relayout
        zero_i = jnp.zeros_like(idx_list[0])
        zero_w = jnp.zeros_like(w_list[0])
        idx_list += [zero_i] * (pad_taps_to - 4)
        w_list += [zero_w] * (pad_taps_to - 4)
    idx = jnp.stack(idx_list, axis=-1).astype(jnp.int32)
    w = jnp.stack(w_list, axis=-1)
    return idx, w


def resize_bilinear(feat: Array, out_h: int, out_w: int) -> Array:
    """Bilinear resize with half-pixel centers (= torch F.interpolate
    align_corners=False), used by the fusion modules to unify feature-map scales
    (feature_fusion.py:104-113).  feat: (B, H, W, C)."""
    import jax

    B, H, W, C = feat.shape
    return jax.image.resize(feat, (B, out_h, out_w, C), method="linear")


def resize_nearest(feat: Array, out_h: int, out_w: int) -> Array:
    """Nearest resize with torch ``F.interpolate(mode="nearest")`` semantics:
    ``src = floor(dst * in / out)`` per axis.  feat: (B, H, W, C)."""
    import numpy as np

    B, H, W, C = feat.shape
    rows = np.minimum((np.arange(out_h) * H) // out_h, H - 1)
    cols = np.minimum((np.arange(out_w) * W) // out_w, W - 1)
    return feat[:, jnp.asarray(rows)][:, :, jnp.asarray(cols)]


def _align_corners_interp_matrix(out_n: int, in_n: int) -> "np.ndarray":
    import numpy as np

    M = np.zeros((out_n, in_n), np.float32)
    if in_n == 1 or out_n == 1:
        M[:, 0] = 1.0
        return M
    pos = np.arange(out_n, dtype=np.float64) * (in_n - 1) / (out_n - 1)
    lo = np.clip(np.floor(pos).astype(np.int64), 0, in_n - 1)
    hi = np.minimum(lo + 1, in_n - 1)
    w = (pos - lo).astype(np.float32)
    M[np.arange(out_n), lo] += 1.0 - w
    M[np.arange(out_n), hi] += w
    return M


def resize_bilinear_align_corners(feat: Array, out_h: int, out_w: int) -> Array:
    """Bilinear resize with align_corners=True (= torch F.interpolate
    align_corners=True) — the upstream encoder's semantics when unifying the
    multi-layer latent (latents upsampled to the stage-0 resolution before
    channel-concat).  Separable exact form: two small interp-matrix matmuls.
    feat: (B, H, W, C)."""
    import numpy as np

    B, H, W, C = feat.shape
    R = jnp.asarray(_align_corners_interp_matrix(out_h, H))
    Cm = jnp.asarray(_align_corners_interp_matrix(out_w, W))
    out = jnp.einsum("hH,bHWc->bhWc", R, feat, precision="highest")
    return jnp.einsum("wW,bhWc->bhwc", Cm, out, precision="highest")
