"""Camera / ray geometry — pure jnp functions, jit- and vmap-friendly.

Functional ports of the reference math utilities (semantics follow
/root/reference/src/util/util.py): ``unproj_map`` (:121-148), ``gen_rays`` (:243-281),
``pose_spherical`` (:284-316), ``coord_from_blender``/``coord_to_blender`` (:151-177),
``look_at`` (:180-196), ``quat_to_rot``/``rot_to_quat`` (:489-530),
``combine_interleaved`` (:466-476), ``repeat_interleave`` (:66-73).

Everything here is stateless: no classes, no buffers.  All functions accept and return
``jnp`` arrays (numpy inputs are accepted and converted).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def _as_f32(x) -> Array:
    return jnp.asarray(x, dtype=jnp.float32)


def _focal_to_2d(f) -> Array:
    """Normalize focal to shape (2,) = [fx, fy]."""
    f = _as_f32(f)
    if f.ndim == 0:
        return jnp.stack([f, f])
    f = f.reshape(-1)
    if f.shape[0] == 1:
        return jnp.concatenate([f, f])
    return f[:2]


def unproj_map(
    width: int, height: int, f, c=None, dtype=jnp.float32
) -> Array:
    """Per-pixel unit camera-ray direction map, OpenGL-style camera (+x right, +y up,
    camera looks down -z).  Matches reference util.unproj_map (util.py:121-148):
    ``dir = normalize([(x - cx)/fx, -(y - cy)/fy, -1])``.

    :param f: focal, scalar or [fx, fy]
    :param c: principal point, None (image center) or [cx, cy]
    :return: (height, width, 3) unit direction per pixel
    """
    if c is None:
        c = jnp.array([width * 0.5, height * 0.5], dtype=dtype)
    else:
        c = _as_f32(c).reshape(-1)[:2]
    f2 = _focal_to_2d(f)
    xs = (jnp.arange(width, dtype=dtype) - c[0]) / f2[0]
    ys = (jnp.arange(height, dtype=dtype) - c[1]) / f2[1]
    X, Y = jnp.meshgrid(xs, ys, indexing="xy")  # (H, W)
    Z = jnp.ones_like(X)
    unproj = jnp.stack([X, -Y, -Z], axis=-1)  # (H, W, 3)
    unproj = unproj / jnp.linalg.norm(unproj, axis=-1, keepdims=True)
    return unproj.astype(dtype)


def gen_rays(
    poses: Array,
    width: int,
    height: int,
    focal,
    z_near: float,
    z_far: float,
    c=None,
    ndc: bool = False,
) -> Array:
    """Generate camera rays for each pixel of each view.

    Matches reference util.gen_rays (util.py:243-281): camera-to-world poses,
    ray = [origin(3), direction(3), near(1), far(1)].

    :param poses: (B, 4, 4) camera-to-world matrices
    :return: (B, height, width, 8)
    """
    poses = _as_f32(poses)
    num_images = poses.shape[0]
    cam_unproj = unproj_map(width, height, jnp.squeeze(_as_f32(focal)), c=c)
    # (B, H, W, 3): rotate local directions into world space.
    # Tiny 3x3 contractions: keep full f32 (default matmul precision may be bf16).
    cam_raydir = jnp.einsum(
        "bij,hwj->bhwi", poses[:, :3, :3], cam_unproj, precision="highest"
    )
    cam_centers = jnp.broadcast_to(
        poses[:, None, None, :3, 3], (num_images, height, width, 3)
    )
    if ndc:
        # forward-facing NDC parameterization (reference util.py:255-264)
        if not (z_near == 0 and z_far == 1):
            import warnings

            warnings.warn(
                "dataset z near and z_far not compatible with NDC, "
                "setting them to 0, 1 NOW"
            )
        z_near, z_far = 0.0, 1.0
        cam_centers, cam_raydir = ndc_rays(
            width, height, focal, 1.0, cam_centers, cam_raydir
        )
    nears = jnp.full((num_images, height, width, 1), z_near, dtype=jnp.float32)
    fars = jnp.full((num_images, height, width, 1), z_far, dtype=jnp.float32)
    return jnp.concatenate([cam_centers, cam_raydir, nears, fars], axis=-1)


def ndc_rays(
    width: int,
    height: int,
    focal,
    near: float,
    rays_o: Array,
    rays_d: Array,
) -> Tuple[Array, Array]:
    """Shift ray origins to the near plane and map to NDC space (the standard
    NeRF forward-facing transform; reference util.gen_rays ndc branch,
    util.py:258-264)."""
    f = jnp.squeeze(_as_f32(focal))
    fx = f if f.ndim == 0 else f.reshape(-1)[0]
    fy = f if f.ndim == 0 else f.reshape(-1)[-1]
    # shift o to the near plane
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (width / (2.0 * fx)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (height / (2.0 * fy)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]
    d0 = (
        -1.0
        / (width / (2.0 * fx))
        * (rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2])
    )
    d1 = (
        -1.0
        / (height / (2.0 * fy))
        * (rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2])
    )
    d2 = -2.0 * near / rays_o[..., 2]
    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)


def batched_index_select_nd(t: Array, inds: Array) -> Array:
    """Index dim 1 of a batched array: t (B, n, ...), inds (B, k) -> (B, k, ...)
    (reference util.py:33-42; used for source-view selection, train.py:315-318)."""
    return jnp.take_along_axis(
        t, inds.reshape(inds.shape + (1,) * (t.ndim - 2)), axis=1
    )


def batched_index_select_nd_last(t: Array, inds: Array) -> Array:
    """Index the last dim: t (..., n, m), inds (..., k) -> (..., n, k)
    (reference util.py:45-55)."""
    dummy = jnp.broadcast_to(
        inds[..., None, :], t.shape[:-1] + (inds.shape[-1],)
    )
    return jnp.take_along_axis(t, dummy, axis=-1)


def masked_sample_np(
    masks: np.ndarray,
    num_pix: int,
    prop_inside: float,
    rng: np.random.Generator,
    thresh: float = 0.5,
) -> np.ndarray:
    """Sample pixel indices with a target in/out-of-mask proportion
    (reference util.py:210-224).  masks (NV, H, W[, 1]) -> (num_pix, 3) [view,y,x]."""
    m = masks[..., 0] if masks.ndim == 4 else masks
    num_inside = int(num_pix * prop_inside + 0.5)
    num_outside = num_pix - num_inside
    inside = np.argwhere(m >= thresh)
    outside = np.argwhere(m < thresh)
    pix_inside = inside[rng.integers(0, len(inside), num_inside)]
    pix_outside = outside[rng.integers(0, len(outside), num_outside)]
    return np.concatenate([pix_inside, pix_outside], axis=0)


def _intrinsics_np(focal, c, width: int, height: int):
    """Shared (fx, fy, cx, cy) parsing for the host-side ray generators —
    gen_rays_np and gen_rays_at_np must stay in lockstep (the sparse training
    rays are golden-tested against the full grid)."""
    f = np.atleast_1d(np.asarray(focal, np.float32).squeeze())
    fx, fy = (f[0], f[0]) if f.size == 1 else (f[0], f[1])
    if c is None:
        cx, cy = width * 0.5, height * 0.5
    else:
        cc = np.asarray(c, np.float32).reshape(-1)
        cx, cy = cc[0], cc[1]
    return fx, fy, cx, cy


def gen_rays_np(
    poses: np.ndarray,
    width: int,
    height: int,
    focal,
    z_near: float,
    z_far: float,
    c=None,
) -> np.ndarray:
    """Pure-numpy gen_rays (same math as :func:`gen_rays`) for host-side ray
    generation in the data/training path — no device round-trip for tiny arrays."""
    poses = np.asarray(poses, np.float32)
    fx, fy, cx, cy = _intrinsics_np(focal, c, width, height)
    xs = (np.arange(width, dtype=np.float32) - cx) / fx
    ys = (np.arange(height, dtype=np.float32) - cy) / fy
    X, Y = np.meshgrid(xs, ys)
    dirs = np.stack([X, -Y, -np.ones_like(X)], axis=-1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    B = poses.shape[0]
    world_dirs = np.einsum("bij,hwj->bhwi", poses[:, :3, :3], dirs)
    centers = np.broadcast_to(poses[:, None, None, :3, 3], world_dirs.shape)
    nears = np.full(world_dirs.shape[:-1] + (1,), z_near, np.float32)
    fars = np.full(world_dirs.shape[:-1] + (1,), z_far, np.float32)
    return np.concatenate(
        [centers, world_dirs, nears, fars], axis=-1
    ).astype(np.float32)


def gen_rays_at_np(
    poses: np.ndarray,
    width: int,
    height: int,
    focal,
    z_near: float,
    z_far: float,
    pix: np.ndarray,
    c=None,
) -> np.ndarray:
    """Rays for a sparse set of pixels only — same per-pixel math as
    :func:`gen_rays_np` but O(R) instead of O(NV*H*W).

    Training samples ~128 pixels per object out of the NV*H*W grid
    (reference train.py:296-305); building the full grid on the host costs
    more than the whole device step, so this is the train-loop path.

    :param pix: (R, 3) int [view, row, col]
    :return: (R, 8) rays [origin, dir, near, far]
    """
    poses = np.asarray(poses, np.float32)
    fx, fy, cx, cy = _intrinsics_np(focal, c, width, height)
    v = pix[:, 0]
    dx = (pix[:, 2].astype(np.float32) - cx) / fx
    dy = (pix[:, 1].astype(np.float32) - cy) / fy
    dirs = np.stack([dx, -dy, -np.ones_like(dx)], axis=-1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    world_dirs = np.einsum("rij,rj->ri", poses[v, :3, :3], dirs)
    centers = poses[v, :3, 3]
    R = pix.shape[0]
    nears = np.full((R, 1), z_near, np.float32)
    fars = np.full((R, 1), z_far, np.float32)
    return np.concatenate(
        [centers, world_dirs, nears, fars], axis=-1
    ).astype(np.float32)


def bbox_sample_np(
    bboxes: np.ndarray, num_pix: int, rng: np.random.Generator
) -> np.ndarray:
    """Sample pixel indices inside per-view foreground bboxes (util.py:450-463).

    :param bboxes: (NV, 4) [cmin, rmin, cmax, rmax]
    :return: (num_pix, 3) [view, y, x]
    """
    image_ids = rng.integers(0, bboxes.shape[0], (num_pix,))
    pb = bboxes[image_ids]
    x = (rng.random(num_pix) * (pb[:, 2] + 1 - pb[:, 0]) + pb[:, 0]).astype(
        np.int64
    )
    y = (rng.random(num_pix) * (pb[:, 3] + 1 - pb[:, 1]) + pb[:, 1]).astype(
        np.int64
    )
    return np.stack([image_ids, y, x], axis=-1)


# ---------------------------------------------------------------------------
# Pose constructors (used by gen_video / eval_real camera paths)
# ---------------------------------------------------------------------------


def trans_t(t: float) -> np.ndarray:
    m = np.eye(4, dtype=np.float32)
    m[2, 3] = t
    return m


def rot_phi(phi: float) -> np.ndarray:
    c, s = np.cos(phi), np.sin(phi)
    return np.array(
        [[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]], dtype=np.float32
    )


def rot_theta(th: float) -> np.ndarray:
    # Note the reference's sign layout (util.py:301-311): -sin in row 0.
    c, s = np.cos(th), np.sin(th)
    return np.array(
        [[c, 0, -s, 0], [0, 1, 0, 0], [s, 0, c, 0], [0, 0, 0, 1]], dtype=np.float32
    )


_POSE_SPHERICAL_FLIP = np.array(
    [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype=np.float32
)


def pose_spherical(theta: float, phi: float, radius: float) -> np.ndarray:
    """Spherical camera-to-world pose (from NeRF), matching util.pose_spherical
    (util.py:314-328).  Angles in degrees."""
    c2w = trans_t(radius)
    c2w = rot_phi(phi / 180.0 * math.pi) @ c2w
    c2w = rot_theta(theta / 180.0 * math.pi) @ c2w
    return _POSE_SPHERICAL_FLIP @ c2w


def coord_from_blender(dtype=np.float32) -> np.ndarray:
    """Blender -> standard (x right, y up, z out) coordinate transform (util.py:151-163)."""
    return np.array(
        [[1, 0, 0, 0], [0, 0, 1, 0], [0, -1, 0, 0], [0, 0, 0, 1]], dtype=dtype
    )


def coord_to_blender(dtype=np.float32) -> np.ndarray:
    """Standard -> Blender coordinate transform (util.py:166-177)."""
    return np.array(
        [[1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype=dtype
    )


def look_at(
    origin: np.ndarray,
    target: np.ndarray,
    world_up: np.ndarray = np.array([0, 1.0, 0], dtype=np.float32),
) -> np.ndarray:
    """4x4 camera-to-world for a camera at `origin` looking at `target` (util.py:180-196)."""
    back = np.asarray(origin, np.float32) - np.asarray(target, np.float32)
    back = back / np.linalg.norm(back)
    right = np.cross(world_up, back)
    right = right / np.linalg.norm(right)
    up = np.cross(back, right)
    m = np.eye(4, dtype=np.float32)
    m[:3, 0] = right
    m[:3, 1] = up
    m[:3, 2] = back
    m[:3, 3] = origin
    return m


# ---------------------------------------------------------------------------
# Quaternions (DTU spline camera path, eval/gen_video.py:120-156)
# ---------------------------------------------------------------------------


def quat_to_rot(q: Array) -> Array:
    """Unit-normalizes and converts quaternions (B, 4) [r, i, j, k] to rotation
    matrices (B, 3, 3).  Matches util.quat_to_rot (util.py:489-509)."""
    q = _as_f32(q)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    qr, qi, qj, qk = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = jnp.stack(
        [
            1 - 2 * (qj**2 + qk**2),
            2 * (qj * qi - qk * qr),
            2 * (qi * qk + qr * qj),
            2 * (qj * qi + qk * qr),
            1 - 2 * (qi**2 + qk**2),
            2 * (qj * qk - qi * qr),
            2 * (qk * qi - qj * qr),
            2 * (qj * qk + qi * qr),
            1 - 2 * (qi**2 + qj**2),
        ],
        axis=-1,
    )
    return R.reshape(-1, 3, 3)


def rot_to_quat(R: Array) -> Array:
    """Rotation matrices (B, 3, 3) to quaternions (B, 4) (util.py:512-530)."""
    R = _as_f32(R)
    qr = jnp.sqrt(1.0 + R[:, 0, 0] + R[:, 1, 1] + R[:, 2, 2]) / 2
    qi = (R[:, 2, 1] - R[:, 1, 2]) / (4 * qr)
    qj = (R[:, 0, 2] - R[:, 2, 0]) / (4 * qr)
    qk = (R[:, 1, 0] - R[:, 0, 1]) / (4 * qr)
    return jnp.stack([qr, qi, qj, qk], axis=-1)


# ---------------------------------------------------------------------------
# Pose inversion (world<->camera)
# ---------------------------------------------------------------------------


def invert_poses(poses: Array) -> Array:
    """Camera-to-world (NS, 4, 4) -> compact world-to-camera (NS, 3, 4).

    Matches the reference encode-time inversion (models.py.backup2:121-123):
    ``rot = R^T; trans = -R^T t``.
    """
    poses = _as_f32(poses)
    rot = jnp.swapaxes(poses[:, :3, :3], 1, 2)  # (NS, 3, 3)
    trans = -jnp.einsum(
        "nij,nj->ni", rot, poses[:, :3, 3], precision="highest"
    )  # (NS, 3)
    return jnp.concatenate([rot, trans[..., None]], axis=-1)  # (NS, 3, 4)


# ---------------------------------------------------------------------------
# Multi-view combination helpers
# ---------------------------------------------------------------------------


def repeat_interleave(x: Array, repeats: int, axis: int = 0) -> Array:
    """Repeat-interleave along axis 0: [a, b] -> [a, a, b, b] for repeats=2
    (util.py:66-73)."""
    if repeats == 1:
        return x
    expanded = jnp.broadcast_to(
        jnp.expand_dims(x, 1), (x.shape[0], repeats) + x.shape[1:]
    )
    return expanded.reshape((-1,) + x.shape[1:])


def combine_interleaved(
    t: Array, inner_dims: Sequence[int] = (1,), agg_type: str = "average"
) -> Array:
    """Reduce over the interleaved multi-view dimension (util.py:466-476).

    ``t`` of shape (NS*B_outer, ...) is viewed as (-1, *inner_dims, ...) and reduced
    over dim 1 with mean or max.
    """
    if len(inner_dims) == 1 and inner_dims[0] == 1:
        return t
    t = t.reshape((-1,) + tuple(inner_dims) + t.shape[1:])
    if agg_type == "average":
        return jnp.mean(t, axis=1)
    elif agg_type == "max":
        return jnp.max(t, axis=1)
    raise NotImplementedError(f"Unsupported combine type {agg_type}")


def homogeneous(points: Array) -> Array:
    """Append 1 to the last dim (util.py:90-96)."""
    return jnp.concatenate(
        [points, jnp.ones(points.shape[:-1] + (1,), dtype=points.dtype)], axis=-1
    )
