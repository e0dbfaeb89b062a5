"""Depth-based view warping and consistency utilities (jnp).

Functional ports of the fork's auxiliary geometry toolbox
(reference sampling_utils.py:6-167): depth-based image warping between views
with validity masks, occlusion masks from depth consistency, reprojection
error, plane-depth maps, and random source-view sampling.  Not used by the
main render path (same as upstream) but part of the capability surface.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.grid_sample import grid_sample

Array = jnp.ndarray


def warp_image(
    img: Array,
    depth: Array,
    K: Array,
    pose: Array,
    target_K: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Warp `img` into a new view given per-pixel depth and the relative pose
    (reference sampling_utils.py:6-84).

    :param img: (B, H, W, C) source images
    :param depth: (B, H, W) or (B, H, W, 1) source-view depth
    :param K: (B, 3, 3) source intrinsics (CV convention, pixel units)
    :param pose: (B, 4, 4) source->target transform
    :param target_K: (B, 3, 3) target intrinsics (defaults to K)
    :return: (warped (B, H, W, C), valid_mask (B, H, W, 1))
    """
    B, H, W, C = img.shape
    if depth.ndim == 4:
        depth = depth[..., 0]
    if target_K is None:
        target_K = K

    jj, ii = jnp.meshgrid(
        jnp.arange(W, dtype=jnp.float32), jnp.arange(H, dtype=jnp.float32)
    )
    pix = jnp.stack([jj, ii, jnp.ones_like(jj)], axis=-1)  # (H, W, 3)

    K_inv = jnp.linalg.inv(K)  # (B, 3, 3)
    cam = jnp.einsum("bij,hwj->bhwi", K_inv, pix) * depth[..., None]

    R = pose[:, :3, :3]
    t = pose[:, :3, 3]
    tgt = jnp.einsum("bij,bhwj->bhwi", R, cam) + t[:, None, None, :]

    proj = jnp.einsum("bij,bhwj->bhwi", target_K, tgt)
    Z = jnp.maximum(proj[..., 2:3], 1e-3)
    uv = proj[..., :2] / Z

    gx = 2.0 * uv[..., 0] / (W - 1) - 1.0
    gy = 2.0 * uv[..., 1] / (H - 1) - 1.0
    grid = jnp.stack([gx, gy], axis=-1).reshape(B, H * W, 2)

    warped = grid_sample(img, grid, padding_mode="zeros").reshape(B, H, W, C)
    valid = (
        (gx >= -1)
        & (gx <= 1)
        & (gy >= -1)
        & (gy <= 1)
        & (tgt[..., 2] > 0)
    )
    return warped, valid.astype(jnp.float32)[..., None]


def compute_occlusion_mask(
    depth_src: Array, depth_warped: Array, threshold: float = 0.01
) -> Array:
    """Pixels where warped depth disagrees with source depth beyond `threshold`
    (relative) are occluded (reference sampling_utils.py:87-101)."""
    rel = jnp.abs(depth_src - depth_warped) / jnp.maximum(depth_src, 1e-6)
    return (rel < threshold).astype(jnp.float32)


def compute_reprojection_error(
    img_target: Array, img_warped: Array, valid_mask: Optional[Array] = None
) -> Array:
    """Mean absolute photometric error over valid pixels
    (reference sampling_utils.py:104-121)."""
    err = jnp.abs(img_target - img_warped)
    if valid_mask is not None:
        err = err * valid_mask
        denom = jnp.maximum(jnp.sum(valid_mask), 1.0) * img_target.shape[-1]
        return jnp.sum(err) / denom
    return jnp.mean(err)


def bilinear_sampler(img: Array, coords: Array) -> Array:
    """Sample (B, H, W, C) at normalized coords (B, N, 2) in [-1, 1]
    (reference sampling_utils.py:124-136)."""
    return grid_sample(img, coords, padding_mode="zeros")


def generate_depth_map(
    plane_depth: float, height: int, width: int, batch: int = 1
) -> Array:
    """Constant-plane depth map (reference sampling_utils.py:139-152)."""
    return jnp.full((batch, height, width), plane_depth, jnp.float32)


def sample_random_views(
    n_views: int, n_sample: int, rng: np.random.Generator, exclude=()
) -> np.ndarray:
    """Sample distinct view indices, excluding some (host-side;
    reference sampling_utils.py:155-167)."""
    pool = np.array([i for i in range(n_views) if i not in set(exclude)])
    n_sample = min(n_sample, len(pool))
    return rng.choice(pool, size=n_sample, replace=False)
