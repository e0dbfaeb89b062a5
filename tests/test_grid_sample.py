"""Parity tests: ops.grid_sample vs torch.nn.functional.grid_sample.

The reference relies on CUDA grid_sample for pixel-aligned feature indexing
(encoder.py:182-205, align_corners=True, border padding). Our XLA gather must
match those numerics bit-closely for checkpoint/PSNR parity.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pixelnerf_tpu.ops import grid_sample as _gs_fn, resize_bilinear as _rb_fn


class gs:
    grid_sample = staticmethod(_gs_fn)
    resize_bilinear = staticmethod(_rb_fn)


def _torch_ref(feat_nhwc, uv, mode, padding, align):
    feat_t = torch.from_numpy(np.transpose(feat_nhwc, (0, 3, 1, 2)))
    grid = torch.from_numpy(uv[:, None])  # (B, 1, N, 2)
    out = F.grid_sample(
        feat_t, grid, mode=mode, padding_mode=padding, align_corners=align
    )
    return out.squeeze(2).transpose(1, 2).numpy()  # (B, N, C)


@pytest.mark.parametrize("padding", ["border", "zeros", "reflection"])
def test_bilinear_matches_torch(padding):
    rng = np.random.default_rng(0)
    B, H, W, C, N = 2, 7, 9, 5, 64
    feat = rng.normal(size=(B, H, W, C)).astype(np.float32)
    # include far out-of-range points to exercise padding
    uv = rng.uniform(-1.7, 1.7, size=(B, N, 2)).astype(np.float32)
    ours = np.asarray(
        gs.grid_sample(feat, uv, align_corners=True, padding_mode=padding)
    )
    ref = _torch_ref(feat, uv, "bilinear", padding, True)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_bilinear_in_range_tight():
    rng = np.random.default_rng(1)
    B, H, W, C, N = 1, 16, 16, 8, 200
    feat = rng.normal(size=(B, H, W, C)).astype(np.float32)
    uv = rng.uniform(-0.99, 0.99, size=(B, N, 2)).astype(np.float32)
    ours = np.asarray(gs.grid_sample(feat, uv))
    ref = _torch_ref(feat, uv, "bilinear", "border", True)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_nearest_matches_torch_off_half_pixels():
    rng = np.random.default_rng(2)
    B, H, W, C, N = 2, 8, 8, 3, 128
    feat = rng.normal(size=(B, H, W, C)).astype(np.float32)
    uv = rng.uniform(-0.95, 0.95, size=(B, N, 2)).astype(np.float32)
    # nudge off exact .5 pixel-center boundaries where rounding rules differ
    px = (uv + 1) * 0.5 * (np.array([W, H]) - 1)
    frac = px - np.floor(px)
    uv = np.where(np.abs(frac - 0.5)[..., :] < 1e-3, uv + 5e-3, uv).astype(
        np.float32
    )
    ours = np.asarray(gs.grid_sample(feat, uv, mode="nearest"))
    ref = _torch_ref(feat, uv, "nearest", "border", True)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_exact_grid_points():
    """Sampling exactly at pixel centers returns the pixel values."""
    rng = np.random.default_rng(3)
    B, H, W, C = 1, 4, 6, 2
    feat = rng.normal(size=(B, H, W, C)).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    u = xs.reshape(-1) / (W - 1) * 2 - 1
    v = ys.reshape(-1) / (H - 1) * 2 - 1
    uv = np.stack([u, v], axis=-1)[None].astype(np.float32)
    out = np.asarray(gs.grid_sample(feat, uv))
    np.testing.assert_allclose(out[0], feat[0].reshape(-1, C), atol=1e-6)


def test_resize_bilinear_matches_torch():
    rng = np.random.default_rng(4)
    feat = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    out = np.asarray(gs.resize_bilinear(feat, 16, 16))
    ref = F.interpolate(
        torch.from_numpy(np.transpose(feat, (0, 3, 1, 2))),
        size=(16, 16),
        mode="bilinear",
        align_corners=False,
    )
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_gather_taps_gradient_matches_take_along_axis():
    """The custom-vjp matmul gradient must equal the scatter gradient of the
    plain take_along_axis formulation (table cotangent; tap weights frozen)."""
    import jax
    import jax.numpy as jnp

    from pixelnerf_tpu.ops.grid_sample import bilinear_taps, gather_taps

    rng = np.random.default_rng(3)
    B, T, C, N = 2, 35, 6, 64
    flat = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    uv = jnp.asarray(rng.uniform(-1.2, 1.2, size=(B, N, 2)).astype(np.float32))
    idx, w = bilinear_taps(uv, 5, 7, padding_mode="zeros")
    g_out = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))

    def ref_fn(flat):
        out = None
        for j in range(4):
            v = jnp.take_along_axis(flat, idx[..., j][..., None], axis=1)
            v = v * w[..., j][..., None]
            out = v if out is None else out + v
        return jnp.sum(out * g_out)

    def fused_fn(flat):
        return jnp.sum(gather_taps(flat, idx, w) * g_out)

    np.testing.assert_allclose(
        float(fused_fn(flat)), float(ref_fn(flat)), rtol=1e-5
    )
    g_ref = jax.grad(ref_fn)(flat)
    g_fused = jax.grad(fused_fn)(flat)
    # bf16 matmul accumulation in the one-hot path -> loose-ish tolerance
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), atol=2e-2, rtol=2e-2
    )
    # weights are frozen by design: zero cotangent
    gw = jax.grad(lambda w_: jnp.sum(gather_taps(flat, idx, w_) * g_out))(w)
    assert float(jnp.max(jnp.abs(gw))) == 0.0


def test_gather_taps_scatter_fallback_gradient():
    """Tables above the one-hot threshold use the scatter path — same grad."""
    import jax
    import jax.numpy as jnp

    import importlib

    gsm = importlib.import_module("pixelnerf_tpu.ops.grid_sample")

    rng = np.random.default_rng(4)
    B, T, C, N = 1, 30, 4, 40
    flat = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, T, size=(B, N, 4)), jnp.int32)
    w = jnp.asarray(rng.normal(size=(B, N, 4)).astype(np.float32))
    g_out = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))

    def loss(flat):
        return jnp.sum(gsm.gather_taps(flat, idx, w) * g_out)

    g_matmul = jax.grad(loss)(flat)
    orig = gsm._ONEHOT_BWD_MAX_ROWS
    gsm._ONEHOT_BWD_MAX_ROWS = 0  # force scatter fallback
    try:
        g_scatter = jax.grad(loss)(flat)
    finally:
        gsm._ONEHOT_BWD_MAX_ROWS = orig
    np.testing.assert_allclose(
        np.asarray(g_matmul), np.asarray(g_scatter), atol=2e-2, rtol=2e-2
    )


def test_gather_taps_adaptive_chunk_gradient():
    """Large tables stay on the one-hot path with an adapted point-chunk size
    (chunk = S-budget // T); shrink the budget to force multiple chunks plus
    ragged padding and check parity against the scatter gradient."""
    import importlib

    import jax
    import jax.numpy as jnp

    gsm = importlib.import_module("pixelnerf_tpu.ops.grid_sample")

    rng = np.random.default_rng(5)
    B, T, C, N = 2, 300, 4, 333  # N not a multiple of the forced chunk (128)
    flat = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, T, size=(B, N, 4)), jnp.int32)
    w = jnp.asarray(rng.normal(size=(B, N, 4)).astype(np.float32))
    g_out = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))

    def loss(flat):
        return jnp.sum(gsm.gather_taps(flat, idx, w) * g_out)

    orig_budget = gsm._ONEHOT_BWD_MAX_S_ELEMS
    orig_rows = gsm._ONEHOT_BWD_MAX_ROWS
    try:
        gsm._ONEHOT_BWD_MAX_S_ELEMS = 4096  # -> chunk = max(4096//300, 128)
        gsm._ONEHOT_BWD_MAX_ROWS = 10**9
        g_onehot = jax.grad(loss)(flat)
        gsm._ONEHOT_BWD_MAX_ROWS = 0  # scatter oracle
        g_scatter = jax.grad(loss)(flat)
    finally:
        gsm._ONEHOT_BWD_MAX_S_ELEMS = orig_budget
        gsm._ONEHOT_BWD_MAX_ROWS = orig_rows
    np.testing.assert_allclose(
        np.asarray(g_onehot), np.asarray(g_scatter), atol=2e-2, rtol=2e-2
    )


def test_resize_bilinear_align_corners_matches_torch():
    import torch
    import torch.nn.functional as F

    from pixelnerf_tpu.ops.grid_sample import resize_bilinear_align_corners

    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 7, 9, 5)).astype(np.float32)
    for oh, ow in [(13, 18), (7, 9), (3, 4), (1, 9)]:
        got = np.asarray(
            resize_bilinear_align_corners(jnp.asarray(x), oh, ow)
        )
        ref = (
            F.interpolate(
                torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                size=(oh, ow),
                mode="bilinear",
                align_corners=True,
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(got, ref, atol=1e-5)
