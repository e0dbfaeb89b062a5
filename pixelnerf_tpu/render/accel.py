"""Per-scene occupancy-grid acceleration for the eval render path.

The reference composites EVERY sample of EVERY ray through the conditioned
field MLP (/root/reference/src/render/nerf.py:163-249) — there is no empty-
space skipping or early ray termination anywhere in its lineage.  On TPU the
field evaluation is matmul-roofline-bound (docs/PERFORMANCE.md), so the only
remaining eval-path win is *evaluating fewer points*.  This module implements
the classic occupancy-grid scheme (Plenoxels / Instant-NGP style), adapted to
XLA's static-shape model:

  1. **Build** (once per encoded scene, amortized over a whole video): the
     field's sigma head is probed at every voxel center of a ``resolution``^3
     grid spanning the axis-aligned bounding box of the rays to be rendered,
     under several view-direction probes (pixelNeRF's MLP sees viewdirs, so
     sigma is not strictly direction-independent), max-reduced, thresholded at
     a conservative alpha contribution, and dilated by max-pooling.
  2. **Mask**: each ray sample is tested against the grid (nearest voxel);
     fine-pass samples are additionally pruned where the coarse transmittance
     has already collapsed (occluded behind the surface).
  3. **Compaction** (renderer.py): active points are gathered into a
     fixed-capacity buffer (``jnp.nonzero(size=...)``) so every downstream
     per-point stage — positional code, projection, feature gather, field MLP —
     runs only on live points; results scatter back with dropped out-of-bounds
     indices.  A ``lax.cond`` falls back to the dense path if a chunk exceeds
     capacity, so the output is never wrong, only occasionally unpruned.

Pruned samples contribute exactly zero weight (sigma = 0 after relu), so the
compositing math of kept samples is IDENTICAL to the dense path; the only
output difference is the (thresholded-away) contribution of near-empty space.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


class OccupancyGrid(flax.struct.PyTreeNode):
    """Boolean occupancy over an axis-aligned box, stored flat for gathers.

    ``sig`` optionally keeps the (dilated) max-sigma field the occupancy was
    thresholded from: the grid-proposal render path (renderer accel_mode
    "proposal") composites it into transmittance-weighted importance weights,
    which concentrate fine samples at the surface instead of uniformly over
    the occupied span (and give occluded bins ~zero pdf mass).  ``None``
    falls back to the binary-mask pdf."""

    occ: Array  # (R*R*R,) float32 in {0, 1}
    lo: Array  # (3,) world-space box min corner
    inv_cell: Array  # (3,) R / (hi - lo)
    sig: Optional[Array] = None  # (R*R*R,) float32 dilated max sigma
    thresh: Optional[Array] = None  # () the build's sigma_thresh
    resolution: int = flax.struct.field(pytree_node=False, default=64)


def aabb_from_rays(rays: np.ndarray, pad_frac: float = 0.01):
    """World AABB of all ray segments (host-side numpy).

    A segment's AABB is the AABB of its endpoints, so the union over rays is
    the AABB of all near/far endpoints.

    :param rays: (..., 8) [o, d, near, far]
    :return: (lo (3,), hi (3,)) float32 numpy
    """
    rays = np.asarray(rays, np.float32).reshape(-1, 8)
    o, d = rays[:, :3], rays[:, 3:6]
    p0 = o + rays[:, 6:7] * d
    p1 = o + rays[:, 7:8] * d
    pts = np.concatenate([p0, p1], axis=0)
    lo = pts.min(axis=0)
    hi = pts.max(axis=0)
    pad = (hi - lo) * pad_frac + 1e-6
    return (lo - pad).astype(np.float32), (hi + pad).astype(np.float32)


def build_occupancy_grid(
    field_fn: Callable,
    lo,
    hi,
    resolution: int = 64,
    sigma_thresh: float = 1e-2,
    dilate: int = 1,
    n_dir_probes: int = 4,
    rng: Optional[Array] = None,
    chunk: int = 1 << 18,
    use_fine: bool = True,
    use_viewdirs: bool = False,
) -> OccupancyGrid:
    """Probe the field's sigma on a voxel grid and threshold into occupancy.

    :param field_fn: ``(points (1, P, 3), viewdirs | None, coarse: bool) ->
        (1, 4, P)`` channel-major rgb+sigma — the renderer's model contract
    :param sigma_thresh: keep voxels with max sigma > this; callers should set
        it from the ray step size (``sigma_thresh ~ eps_alpha / delta``)
    :param dilate: rounds of 3x3x3 max-pool dilation (guards against the field
        varying within a voxel and samples landing off-center)
    :param n_dir_probes: view-direction probes max-reduced (sigma is weakly
        direction-dependent in pixelNeRF: viewdirs enter the MLP input);
        ignored when ``use_viewdirs`` is False
    """
    R = int(resolution)
    lo = jnp.asarray(lo, jnp.float32)
    hi = jnp.asarray(hi, jnp.float32)
    extent = hi - lo
    idx = (jnp.arange(R, dtype=jnp.float32) + 0.5) / R
    gx, gy, gz = jnp.meshgrid(idx, idx, idx, indexing="ij")
    centers = lo + jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3) * extent
    P = centers.shape[0]

    if use_viewdirs:
        if rng is None:
            rng = jax.random.PRNGKey(0)
        dirs = jax.random.normal(rng, (max(n_dir_probes, 1), 3))
        dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-8)
    else:
        dirs = jnp.zeros((1, 3), jnp.float32)

    heads = (True, False) if use_fine else (True,)
    sigma_max = jnp.zeros((P,), jnp.float32)
    n_chunks = -(-P // chunk)
    pad = n_chunks * chunk - P
    pts = jnp.pad(centers, ((0, pad), (0, 0))).reshape(n_chunks, chunk, 3)
    for coarse in heads:
        for di in range(dirs.shape[0]):
            vd = jnp.broadcast_to(dirs[di], (chunk, 3))

            def one(p, coarse=coarse, vd=vd):
                out = field_fn(
                    p[None], vd[None] if use_viewdirs else None, coarse
                )
                return out[0, 3]  # sigma plane

            sig = jax.lax.map(one, pts).reshape(-1)[:P]
            sigma_max = jnp.maximum(sigma_max, sig)

    # dilate the sigma field itself (max-pool commutes with the threshold,
    # so occ = dilated sigma > thresh is the same mask as dilating occ)
    sig = jax.nn.relu(sigma_max).reshape(R, R, R)
    for _ in range(max(dilate, 0)):
        sig = jax.lax.reduce_window(
            sig,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(3, 3, 3),
            window_strides=(1, 1, 1),
            padding="SAME",
        )
    occ = (sig > sigma_thresh).astype(jnp.float32)
    return OccupancyGrid(
        occ=occ.reshape(-1),
        lo=lo,
        inv_cell=R / jnp.maximum(extent, 1e-8),
        sig=sig.reshape(-1),
        thresh=jnp.asarray(sigma_thresh, jnp.float32),
        resolution=R,
    )


def occupancy_lookup(grid: OccupancyGrid, points: Array) -> Array:
    """Nearest-voxel occupancy test.

    :param points: (..., 3) world points
    :return: (...) bool — True where the field must be evaluated.  Points
        outside the box are conservatively OCCUPIED (rays outside the build
        set; the grid only ever *skips* space it has verified empty).
    """
    R = grid.resolution
    rel = (points - grid.lo) * grid.inv_cell
    idx = jnp.floor(rel).astype(jnp.int32)
    inside = jnp.all((idx >= 0) & (idx < R), axis=-1)
    idx = jnp.clip(idx, 0, R - 1)
    flat = (idx[..., 0] * R + idx[..., 1]) * R + idx[..., 2]
    occ = jnp.take(grid.occ, flat.reshape(-1), axis=0).reshape(flat.shape)
    return jnp.where(inside, occ > 0.5, True)


def sigma_lookup(grid: OccupancyGrid, points: Array) -> Array:
    """Nearest-voxel (dilated) sigma — the grid-proposal pdf's density source.

    Points outside the box read ``grid.thresh``: the box only covers the
    build rays' segments, so out-of-box points are unknown space — a small
    positive sigma keeps them sampleable (conservative, like
    :func:`occupancy_lookup` returning occupied) without letting them
    outweigh real surface voxels.
    """
    R = grid.resolution
    rel = (points - grid.lo) * grid.inv_cell
    idx = jnp.floor(rel).astype(jnp.int32)
    inside = jnp.all((idx >= 0) & (idx < R), axis=-1)
    idx = jnp.clip(idx, 0, R - 1)
    flat = (idx[..., 0] * R + idx[..., 1]) * R + idx[..., 2]
    sig = jnp.take(grid.sig, flat.reshape(-1), axis=0).reshape(flat.shape)
    return jnp.where(inside, sig, grid.thresh)


def probe_lookup(
    grid: OccupancyGrid, points: Array
) -> Tuple[Array, Optional[Array]]:
    """Fused occupancy + sigma probe: ONE grid gather per point.

    ``occ`` was built as ``dilated_sig > thresh`` (build_occupancy_grid), so
    for sigma-carrying grids the mask is derivable from the sigma gather —
    random-access HBM gathers dominate the proposal path's non-MLP time
    (three per probe point before this: outer liveness occupancy_lookup +
    inner occupancy_lookup + sigma_lookup at the SAME z's), and this plus
    probe-result forwarding (renderer._render_rays_ray_compacted) collapses
    them to one.

    :return: (mask (...) bool, sig (...) float32 | None) — identical to
        ``(occupancy_lookup(grid, points), sigma_lookup(grid, points))``;
        sig is None for mask-only grids (grid.sig is None).
    """
    R = grid.resolution
    rel = (points - grid.lo) * grid.inv_cell
    idx = jnp.floor(rel).astype(jnp.int32)
    inside = jnp.all((idx >= 0) & (idx < R), axis=-1)
    idx = jnp.clip(idx, 0, R - 1)
    flat = (idx[..., 0] * R + idx[..., 1]) * R + idx[..., 2]
    if grid.sig is None:
        occ = jnp.take(grid.occ, flat.reshape(-1), axis=0).reshape(flat.shape)
        return jnp.where(inside, occ > 0.5, True), None
    sig = jnp.take(grid.sig, flat.reshape(-1), axis=0).reshape(flat.shape)
    mask = jnp.where(inside, sig > grid.thresh, True)
    return mask, jnp.where(inside, sig, grid.thresh)


def occupancy_fraction(grid: OccupancyGrid) -> float:
    """Host-side diagnostic: fraction of occupied voxels."""
    return float(jnp.mean(grid.occ))
