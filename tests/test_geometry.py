"""Golden-value tests for camera/ray geometry against independent torch/numpy math."""

import numpy as np
import pytest

from pixelnerf_tpu.utils import geometry


def random_pose(rng):
    """Random camera-to-world with orthonormal rotation."""
    q = rng.normal(size=4)
    q = q / np.linalg.norm(q)
    r, i, j, k = q
    R = np.array(
        [
            [1 - 2 * (j * j + k * k), 2 * (i * j - k * r), 2 * (i * k + j * r)],
            [2 * (i * j + k * r), 1 - 2 * (i * i + k * k), 2 * (j * k - i * r)],
            [2 * (i * k - j * r), 2 * (j * k + i * r), 1 - 2 * (i * i + j * j)],
        ]
    )
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = R
    m[:3, 3] = rng.normal(size=3)
    return m


def test_unproj_map_center_pixel():
    H = W = 9
    f = 4.0
    m = np.asarray(geometry.unproj_map(W, H, f))
    # center pixel at (4, 4) = principal point: direction is exactly -z
    c = m[4, 4]
    # (x - cx)/fx = (4 - 4.5)/4
    expect = np.array([-0.5 / 4, 0.5 / 4, -1.0])
    expect /= np.linalg.norm(expect)
    np.testing.assert_allclose(c, expect, atol=1e-6)
    # all rows unit norm
    np.testing.assert_allclose(np.linalg.norm(m, axis=-1), 1.0, atol=1e-6)


def test_unproj_map_anisotropic_focal_and_c():
    H, W = 6, 8
    m = np.asarray(
        geometry.unproj_map(W, H, np.array([10.0, 20.0]), c=np.array([1.0, 2.0]))
    )
    x, y = 5, 3
    d = np.array([(x - 1.0) / 10.0, -(y - 2.0) / 20.0, -1.0])
    d /= np.linalg.norm(d)
    np.testing.assert_allclose(m[y, x], d, atol=1e-6)


def test_gen_rays_identity_pose():
    H = W = 4
    poses = np.eye(4, dtype=np.float32)[None]
    rays = np.asarray(geometry.gen_rays(poses, W, H, 2.0, 0.8, 1.8))
    assert rays.shape == (1, H, W, 8)
    np.testing.assert_allclose(rays[..., :3], 0.0, atol=1e-7)  # origin
    np.testing.assert_allclose(rays[..., 6], 0.8)
    np.testing.assert_allclose(rays[..., 7], 1.8)
    # identity rotation: direction equals unproj map
    m = np.asarray(geometry.unproj_map(W, H, 2.0))
    np.testing.assert_allclose(rays[0, ..., 3:6], m, atol=1e-6)


def test_gen_rays_rotated_pose():
    rng = np.random.default_rng(0)
    pose = random_pose(rng)
    H = W = 5
    rays = np.asarray(geometry.gen_rays(pose[None], W, H, 3.0, 1.0, 2.0))
    m = np.asarray(geometry.unproj_map(W, H, 3.0))
    np.testing.assert_allclose(
        rays[0, ..., 3:6], m @ pose[:3, :3].T, atol=1e-5
    )
    np.testing.assert_allclose(
        rays[0, ..., 0:3], np.broadcast_to(pose[:3, 3], (H, W, 3)), atol=1e-6
    )


def test_pose_spherical_properties():
    # radius preserved, camera looks at origin
    for theta, phi, radius in [(0, -30, 4.0), (45, -10, 2.5), (-120, -45, 1.3)]:
        c2w = geometry.pose_spherical(theta, phi, radius)
        origin = c2w[:3, 3]
        np.testing.assert_allclose(np.linalg.norm(origin), radius, rtol=1e-5)
        # camera z axis (back vector) points away from origin -> along position
        back = c2w[:3, 2]
        np.testing.assert_allclose(
            back, origin / np.linalg.norm(origin), atol=1e-5
        )
        # rotation is orthonormal with det +-1
        R = c2w[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_pose_spherical_golden():
    # Golden values computed from the documented composition
    # flip @ rot_theta(t) @ rot_phi(p) @ trans_t(r).
    c2w = geometry.pose_spherical(90.0, 0.0, 1.0)
    np.testing.assert_allclose(c2w[:3, 3], [1.0, 0.0, 0.0], atol=1e-6)
    c2w = geometry.pose_spherical(0.0, -90.0, 1.0)
    np.testing.assert_allclose(c2w[:3, 3], [0.0, 0.0, 1.0], atol=1e-6)
    c2w = geometry.pose_spherical(0.0, 0.0, 2.0)
    np.testing.assert_allclose(c2w[:3, 3], [0.0, 2.0, 0.0], atol=1e-6)


def test_quat_roundtrip():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(10, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q = np.where(q[:, :1] < 0, -q, q)  # canonical sign
    R = np.asarray(geometry.quat_to_rot(q))
    # rotation matrices orthonormal
    for i in range(10):
        np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-5)
    q2 = np.asarray(geometry.rot_to_quat(R))
    np.testing.assert_allclose(q2, q, atol=2e-3)


def test_invert_poses():
    rng = np.random.default_rng(2)
    poses = np.stack([random_pose(rng) for _ in range(3)])
    w2c = np.asarray(geometry.invert_poses(poses))
    assert w2c.shape == (3, 3, 4)
    for i in range(3):
        full = np.eye(4, dtype=np.float32)
        full[:3] = w2c[i]
        np.testing.assert_allclose(full @ poses[i], np.eye(4), atol=1e-5)


def test_repeat_and_combine_interleaved():
    x = np.arange(6, dtype=np.float32).reshape(3, 2)
    r = np.asarray(geometry.repeat_interleave(x, 2))
    np.testing.assert_allclose(r, np.repeat(x, 2, axis=0))
    # combine: (NS*B, D) viewed as (B_outer, NS, B_inner, D), mean over NS
    t = np.arange(24, dtype=np.float32).reshape(4, 6)
    out = np.asarray(geometry.combine_interleaved(t, (2, 2), "average"))
    expect = t.reshape(1, 2, 2, 6).mean(axis=1)
    np.testing.assert_allclose(out, expect)
    out_max = np.asarray(geometry.combine_interleaved(t, (2, 2), "max"))
    np.testing.assert_allclose(out_max, t.reshape(1, 2, 2, 6).max(axis=1))
    # identity case
    np.testing.assert_allclose(
        np.asarray(geometry.combine_interleaved(t, (1,))), t
    )


def test_look_at():
    m = geometry.look_at(np.array([0, 0, 2.0]), np.zeros(3))
    np.testing.assert_allclose(m[:3, 3], [0, 0, 2.0])
    np.testing.assert_allclose(m[:3, 2], [0, 0, 1.0])  # back = +z
    np.testing.assert_allclose(m[:3, 0], [1, 0, 0.0], atol=1e-6)  # right = +x


def test_coord_blender_inverse():
    a = geometry.coord_from_blender()
    b = geometry.coord_to_blender()
    np.testing.assert_allclose(a @ b, np.eye(4), atol=1e-7)


def test_ndc_rays_and_index_select():
    import jax.numpy as jnp

    # forward-facing camera at origin looking down -z
    poses = np.eye(4, dtype=np.float32)[None]
    rays = np.asarray(
        geometry.gen_rays(poses, 8, 8, 10.0, 0.0, 1.0, ndc=True)
    )
    assert np.isfinite(rays).all()
    np.testing.assert_allclose(rays[..., 6], 0.0)
    np.testing.assert_allclose(rays[..., 7], 1.0)
    # NDC origins lie on the z=-1 plane mapped to o2 = 1 + 2*near/oz = -1
    np.testing.assert_allclose(rays[..., 2], -1.0, atol=1e-5)

    t = np.arange(24, dtype=np.float32).reshape(2, 4, 3)
    inds = np.array([[1, 3], [0, 2]])
    out = np.asarray(geometry.batched_index_select_nd(jnp.asarray(t), jnp.asarray(inds)))
    np.testing.assert_allclose(out[0], t[0, [1, 3]])
    np.testing.assert_allclose(out[1], t[1, [0, 2]])

    t2 = np.arange(12, dtype=np.float32).reshape(1, 3, 4)
    inds2 = np.array([[2, 0]])
    out2 = np.asarray(
        geometry.batched_index_select_nd_last(jnp.asarray(t2), jnp.asarray(inds2))
    )
    np.testing.assert_allclose(out2[0], t2[0][:, [2, 0]])


def test_masked_sample_np():
    rng = np.random.default_rng(0)
    masks = np.zeros((2, 8, 8, 1), np.float32)
    masks[:, 2:6, 2:6] = 1.0
    pix = geometry.masked_sample_np(masks, 100, 0.7, rng)
    assert pix.shape == (100, 3)
    inside = masks[pix[:, 0], pix[:, 1], pix[:, 2], 0] > 0.5
    assert inside[:70].all() and not inside[70:].any()


def test_gen_rays_at_np_matches_full_grid():
    """Sparse per-pixel rays == rows of the full gen_rays_np grid."""
    rng = np.random.default_rng(3)
    NV, H, W = 3, 24, 20
    poses = np.tile(np.eye(4, dtype=np.float32), (NV, 1, 1))
    for i in range(NV):
        th = 0.3 * (i + 1)
        poses[i, :3, :3] = np.array(
            [
                [np.cos(th), 0, np.sin(th)],
                [0, 1, 0],
                [-np.sin(th), 0, np.cos(th)],
            ],
            np.float32,
        )
        poses[i, :3, 3] = [0.1 * i, -0.2, 1.3]
    for c in (None, np.array([9.5, 12.25], np.float32)):
        full = geometry.gen_rays_np(poses, W, H, 14.0, 0.8, 1.8, c=c)
        pix = np.stack(
            [
                rng.integers(0, NV, 64),
                rng.integers(0, H, 64),
                rng.integers(0, W, 64),
            ],
            axis=-1,
        )
        sparse = geometry.gen_rays_at_np(
            poses, W, H, 14.0, 0.8, 1.8, pix, c=c
        )
        ref = full[pix[:, 0], pix[:, 1], pix[:, 2]]
        np.testing.assert_allclose(sparse, ref, atol=1e-6)
