"""Data-layer tests: synthetic writers round-trip through every adapter, camera
decomposition recovers the generating poses, collate handles malformed batches."""

import os

import numpy as np
import pytest

from pixelnerf_tpu.data import (
    DataLoader,
    SyntheticDataset,
    collate,
    get_split_dataset,
    write_synthetic_dvr,
    write_synthetic_multi_obj,
    write_synthetic_srn,
)
from pixelnerf_tpu.data.base import decompose_projection


def check_contract(data, expect_c=True):
    NV = data["images"].shape[0]
    H, W = data["images"].shape[1:3]
    assert data["images"].shape == (NV, H, W, 3)
    assert data["images"].dtype == np.float32
    assert data["images"].min() >= -1.0 - 1e-5 and data["images"].max() <= 1.0 + 1e-5
    # white background must map to +1 in [-1,1] space
    assert data["images"].max() > 0.95
    assert data["poses"].shape == (NV, 4, 4)
    np.testing.assert_allclose(data["poses"][:, 3], [[0, 0, 0, 1]] * NV, atol=1e-5)
    assert data["masks"].shape == (NV, H, W, 1)
    assert data["bbox"].shape == (NV, 4)
    assert (data["bbox"][:, 2] >= data["bbox"][:, 0]).all()
    assert np.asarray(data["focal"]).size in (1, 2)
    if expect_c:
        assert "c" in data


def check_poses_look_at_origin(poses, radius=1.4):
    # synthetic camera ring: positions at radius, looking at origin
    np.testing.assert_allclose(
        np.linalg.norm(poses[:, :3, 3], axis=-1), radius, rtol=1e-4
    )
    back = poses[:, :3, 2]  # GL camera back vector points away from target
    pos_n = poses[:, :3, 3] / np.linalg.norm(poses[:, :3, 3], axis=-1, keepdims=True)
    np.testing.assert_allclose(back, pos_n, atol=1e-4)


def test_decompose_projection_roundtrip():
    from pixelnerf_tpu.utils import geometry

    rng = np.random.default_rng(0)
    for _ in range(5):
        c2w = geometry.pose_spherical(
            rng.uniform(-180, 180), rng.uniform(-80, -5), rng.uniform(1, 3)
        )
        K = np.array([[50.0, 0, 32], [0, 55.0, 30], [0, 0, 1]])
        w2c_cv = np.diag([1.0, -1, -1, 1]) @ np.linalg.inv(c2w.astype(np.float64))
        P = K @ w2c_cv[:3, :4]
        K2, c2w2 = decompose_projection(P)
        np.testing.assert_allclose(K2, K, atol=1e-3)
        np.testing.assert_allclose(c2w2, c2w, atol=1e-4)


def test_synthetic_in_memory():
    ds = SyntheticDataset(n_objs=2, n_views=4, image_size=32)
    assert len(ds) == 2
    data = ds[0]
    check_contract(data, expect_c=False)
    check_poses_look_at_origin(data["poses"])
    # foreground must exist (sphere visible)
    assert data["masks"].sum() > 50


def test_dvr_adapter_roundtrip(tmp_path):
    root = write_synthetic_dvr(
        str(tmp_path / "dvr"), n_objs=3, n_views=4, image_size=32, focal=30.0
    )
    train, val, test = get_split_dataset("dvr", root)
    assert len(train) == 1 and len(val) == 1 and len(test) == 1
    assert (train.z_near, train.z_far) == (1.2, 4.0)
    data = train[0]
    check_contract(data)
    check_poses_look_at_origin(data["poses"])
    np.testing.assert_allclose(float(data["focal"]), 30.0, atol=1e-3)
    # c is (1, 2): 1-D would mean per-view scalars under encode's convention
    np.testing.assert_allclose(np.asarray(data["c"]), [[16.0, 16.0]], atol=1e-3)


def test_dvr_gen_prefix_fallback(tmp_path):
    root = write_synthetic_dvr(str(tmp_path / "dvr"), n_objs=3, n_views=2, image_size=32)
    # no gen_* lists -> falls back to all objects per category
    ds = get_split_dataset("dvr_gen", root, want_split="train")
    assert len(ds) == 3


def test_srn_adapter_roundtrip(tmp_path):
    root = write_synthetic_srn(
        str(tmp_path / "srn"), n_objs=2, n_views=4, image_size=32, focal=30.0
    )
    ds = get_split_dataset("srn", root, want_split="train", image_size=(32, 32))
    assert len(ds) == 2
    assert (ds.z_near, ds.z_far) == (0.8, 1.8)  # car bounds
    data = ds[0]
    check_contract(data)
    check_poses_look_at_origin(data["poses"])
    assert float(data["focal"]) == pytest.approx(30.0)


def test_multi_obj_adapter_roundtrip(tmp_path):
    root = write_synthetic_multi_obj(
        str(tmp_path / "mo"), n_scenes=2, n_views=3, image_size=32
    )
    train = get_split_dataset("multi_obj", root, want_split="train")
    assert len(train) == 2
    data = train[0]
    check_contract(data, expect_c=False)
    check_poses_look_at_origin(data["poses"])
    assert float(data["focal"]) == pytest.approx(0.85 * 32, rel=1e-3)


def test_adapter_images_match_generator(tmp_path):
    """Loader pixels must equal the in-memory render (up to PNG quantization)."""
    from pixelnerf_tpu.data.synthetic import render_sphere_image, _object_params, _camera_ring

    root = write_synthetic_dvr(
        str(tmp_path / "dvr"), n_objs=1, n_views=2, image_size=32, focal=30.0, seed=3
    )
    ds = get_split_dataset("dvr", root, want_split="train")
    data = ds[0]
    rng = np.random.default_rng(3)
    params = _object_params(rng)
    poses = _camera_ring(2, seed=3000)
    img = render_sphere_image(poses[0], 32, 32, 30.0, **params)
    np.testing.assert_allclose(
        data["images"][0], img * 2 - 1, atol=2 / 255.0 * 2 + 1e-3
    )
    np.testing.assert_allclose(data["poses"][0], poses[0], atol=1e-4)


def test_collate_and_loader():
    ds = SyntheticDataset(n_objs=5, n_views=3, image_size=16)
    loader = DataLoader(ds, batch_size=2, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == 3
    b = batches[0]
    assert b["images"].shape == (2, 3, 16, 16, 3)
    assert b["poses"].shape == (2, 3, 4, 4)
    assert b["focal"].shape == (2,)
    assert isinstance(b["path"], list)

    # malformed samples are dropped; inconsistent views cropped to min
    s0, s1 = ds[0], ds[1]
    s1 = dict(s1)
    for key in ("images", "poses", "masks", "bbox"):
        s1[key] = s1[key][:2]
    out = collate([s0, None, s1, {"bogus": 1}])
    assert out["images"].shape[0] == 2
    assert out["images"].shape[1] == 2  # cropped to min views
    assert collate([None, None]) is None

    # shuffling differs across epochs but is deterministic per (seed, epoch)
    loader.set_epoch(0)
    ids0 = [tuple(b["img_id"]) for b in loader]
    loader.set_epoch(1)
    ids1 = [tuple(b["img_id"]) for b in loader]
    loader.set_epoch(0)
    ids0b = [tuple(b["img_id"]) for b in loader]
    assert ids0 == ids0b and ids0 != ids1


def test_dtu_dataset_roundtrip(tmp_path):
    """dvr_dtu loader: scale_mat normalization, new_val.lst split, pixel-unit
    intrinsics, and intrinsic rescale when images are loaded resized."""
    from pixelnerf_tpu.data import get_split_dataset
    from pixelnerf_tpu.data.synthetic import write_synthetic_dtu
    from pixelnerf_tpu.utils import geometry

    root = write_synthetic_dtu(str(tmp_path / "dtu"), n_scenes=2, n_views=6)
    dset = get_split_dataset("dvr_dtu", root, want_split="val", training=False)
    assert len(dset) == 2
    d = dset[0]
    NV = 6
    assert d["images"].shape[0] == NV
    H, W = d["images"].shape[1:3]
    assert (H, W) == (75, 100)
    assert d["poses"].shape == (NV, 4, 4)
    assert d["masks"].shape[0] == NV
    assert dset.z_near == 0.1 and dset.z_far == 5.0

    # cameras must live on the ring in the NORMALIZED frame (radius 1.6):
    # scale_mat undoes the arbitrary world scale/shift the writer applied
    centers = d["poses"][:, :3, 3]
    rad = np.linalg.norm(centers, axis=-1)
    np.testing.assert_allclose(rad, 1.6, atol=1e-3)

    # intrinsics: focal 0.9*W, principal point at center (per-view (1,2) or scalar)
    f = np.asarray(d["focal"]).reshape(-1)
    np.testing.assert_allclose(np.abs(f), 0.9 * 100, rtol=1e-3)
    c = np.asarray(d["c"]).reshape(-1, 2)
    np.testing.assert_allclose(c[0], [50.0, 37.5], atol=0.2)

    # projecting the sphere center (origin in normalized frame) must land in
    # the image interior for every view
    for v in range(NV):
        w2c = np.linalg.inv(d["poses"][v])
        p_cam = w2c[:3, 3]
        uv = -p_cam[:2] / p_cam[2] * np.array([f[0], -f[0] if f.size == 1 else -f[-1]])
        uv = uv + c[0]
        assert 10 < uv[0] < 90 and 10 < uv[1] < 65, (v, uv)

    # resized load rescales the intrinsics
    dset_small = get_split_dataset(
        "dvr_dtu", root, want_split="val", training=False, image_size=(38, 50)
    )
    d2 = dset_small[0]
    assert d2["images"].shape[1:3] == (38, 50)
    f2 = np.asarray(d2["focal"]).reshape(-1)
    np.testing.assert_allclose(f2[0], f[0] * 0.5, rtol=1e-3)


def test_loader_sample_cache():
    """cache_mb > 0: each index decoded once across epochs; cache freezes when
    full (no eviction), so cached indices keep hitting under a tiny cap."""
    from pixelnerf_tpu.data.loader import DataLoader

    class Counting:
        def __init__(self, n):
            self.n = n
            self.calls = np.zeros(n, np.int64)

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            self.calls[i] += 1
            return {
                "images": np.full((2, 4, 4, 3), float(i), np.float32),
                "poses": np.tile(np.eye(4, dtype=np.float32), (2, 1, 1)),
                "focal": np.float32(10.0),
            }

    ds = Counting(6)
    loader = DataLoader(ds, batch_size=2, shuffle=False, cache_mb=64.0)
    for _ in range(3):
        batches = list(loader)
        assert len(batches) == 3
    assert (ds.calls == 1).all()  # decoded exactly once, served from cache after
    # batches still correct from cache
    assert float(batches[1]["images"][0, 0, 0, 0, 0]) == 2.0

    # no cache by default
    ds2 = Counting(4)
    loader2 = DataLoader(ds2, batch_size=2, shuffle=False)
    list(loader2), list(loader2)
    assert (ds2.calls == 2).all()

    # tiny cap -> cache freezes when full (no eviction churn); cached indices
    # keep hitting, the rest re-decode every epoch
    ds3 = Counting(5)
    ds3.calls[:] = 0
    sample = {
        "images": np.zeros((2, 4, 4, 3), np.float32),
        "poses": np.zeros((2, 4, 4), np.float32),
    }
    per = sum(v.nbytes for v in sample.values())
    loader3 = DataLoader(
        ds3, batch_size=1, shuffle=False, cache_mb=per * 2.5 / 1e6
    )
    list(loader3), list(loader3), list(loader3)
    assert loader3._cache_bytes <= loader3._cache_cap
    assert (ds3.calls[:2] == 1).all()  # first two frozen in cache
    assert (ds3.calls[2:] == 3).all()  # the rest decode each epoch


def _hand_rq_decompose(P):
    """Independent oracle: RQ-decompose P = K[R|t] by hand (numpy only, no
    cv2), normalizing to positive-diagonal K and proper rotation, and return
    (K, c2w_gl) in the framework's convention."""
    P = np.asarray(P, np.float64)
    M = P[:, :3]
    # RQ via reversed-QR: M = K R with K upper-triangular
    rev = np.eye(3)[::-1]
    Q, R_ = np.linalg.qr((rev @ M).T)
    K = rev @ R_.T @ rev
    R = rev @ Q.T
    # positive-diagonal K
    S = np.diag(np.sign(np.diag(K)))
    K = K @ S
    R = S @ R
    if np.linalg.det(R) < 0:  # proper rotation (absorb the projective sign)
        R = -R
        t = -np.linalg.solve(K, P[:, 3])
    else:
        t = np.linalg.solve(K, P[:, 3])
    K = K / K[2, 2]
    w2c = np.eye(4)
    w2c[:3, :3] = R
    w2c[:3, 3] = t
    c2w_cv = np.linalg.inv(w2c)
    from pixelnerf_tpu.data.base import CV_TO_GL

    return K, c2w_cv @ CV_TO_GL


def test_decompose_projection_adversarial_oracle():
    """decompose_projection vs construction ground truth AND a hand-rolled RQ
    oracle, on the classic real-DTU failure modes: off-center principal
    point, anisotropic focal, negative projective scale (sign conventions),
    and nontrivial scale_mat chains (VERDICT #5)."""
    from pixelnerf_tpu.utils import geometry

    rng = np.random.default_rng(3)
    for trial in range(8):
        c2w = geometry.pose_spherical(
            rng.uniform(-180, 180), rng.uniform(-80, -5), rng.uniform(1, 3)
        )
        fx = rng.uniform(40, 80)
        fy = fx * rng.uniform(0.8, 1.25)  # anisotropic
        cx = rng.uniform(10, 90)  # strongly off-center
        cy = rng.uniform(5, 70)
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
        w2c_cv = np.diag([1.0, -1, -1, 1]) @ np.linalg.inv(c2w.astype(np.float64))
        P = K @ w2c_cv[:3, :4]
        # projective scaling incl. NEGATIVE (breaks naive RQ sign handling)
        lam = rng.uniform(0.5, 4.0) * (-1 if trial % 2 else 1)
        P_scaled = lam * P
        # nontrivial chain: P stored as (P @ A) @ A^-1 for a rotated+scaled A
        th = rng.uniform(0, 2 * np.pi)
        A = np.eye(4)
        A[:3, :3] = (
            np.array(
                [
                    [np.cos(th), -np.sin(th), 0],
                    [np.sin(th), np.cos(th), 0],
                    [0, 0, 1],
                ]
            )
            / rng.uniform(0.5, 3.0)
        )
        A[:3, 3] = rng.normal(size=3) * 0.3
        P_chain = (P_scaled @ A) @ np.linalg.inv(A)

        for P_test in (P, P_scaled, P_chain):
            K2, c2w2 = decompose_projection(P_test)
            np.testing.assert_allclose(K2, K, atol=2e-3, rtol=1e-5)
            np.testing.assert_allclose(c2w2, c2w, atol=1e-4)
            K3, c2w3 = _hand_rq_decompose(P_test)
            np.testing.assert_allclose(K3, K, atol=2e-3, rtol=1e-5)
            np.testing.assert_allclose(
                np.asarray(c2w3, np.float32), c2w, atol=1e-4
            )


def test_dtu_adversarial_roundtrip_geometric_oracle(tmp_path):
    """End-to-end: adversarial DTU fixtures (off-center c, anisotropic focal,
    negated world_mats, rotated scale_mat chain) through the dvr_dtu loader,
    checked by an INDEPENDENT geometric oracle: rays cast from the loaded
    cameras must hit the ground-truth sphere exactly where the stored masks
    say (any sign/convention error shifts or flips the silhouette)."""
    import json as J

    from pixelnerf_tpu.data import get_split_dataset
    from pixelnerf_tpu.data.synthetic import write_synthetic_dtu
    from pixelnerf_tpu.utils import geometry

    root = write_synthetic_dtu(
        str(tmp_path / "dtu_adv"),
        n_scenes=1,
        n_views=6,
        seed=5,
        offcenter_c=0.12,
        focal_aniso=1.2,
        negate_world_mat=True,
        scale_rot_deg=33.0,
    )
    dset = get_split_dataset("dvr_dtu", root, want_split="val", training=False)
    d = dset[0]
    meta = J.load(open(os.path.join(d["path"], "meta.json")))
    r_sphere = meta["sphere_radius"]
    NV, H, W = d["images"].shape[:3]
    focal = np.asarray(d["focal"]).reshape(-1, 2)
    cc = np.asarray(d["c"]).reshape(-1, 2)
    # per-view c survives (c varies per view; constant anisotropic focal is
    # collapsed to one (1,2) row by the loader's shape discipline)
    assert cc.shape[0] == NV
    # anisotropy must be preserved with POSITIVE fx, fy
    np.testing.assert_allclose(focal[:, 1] / focal[:, 0], 1.2, rtol=1e-3)
    assert (focal > 0).all()

    for vi in range(NV):
        rays = np.asarray(
            geometry.gen_rays_np(
                d["poses"][vi : vi + 1], W, H,
                focal[min(vi, focal.shape[0] - 1)],
                0.1, 5.0, c=cc[min(vi, cc.shape[0] - 1)],
            )
        ).reshape(H, W, 8)
        o, dirs = rays[..., :3], rays[..., 3:6]
        b = np.sum(o * dirs, axis=-1)
        c_ = np.sum(o * o, axis=-1) - r_sphere**2
        hit = (b * b - c_) > 0
        mask = d["masks"][vi, ..., 0] > 0.5
        iou = (hit & mask).sum() / max((hit | mask).sum(), 1)
        assert iou > 0.97, (vi, iou)


def test_synthetic_scene_family():
    """The adversarial accel-validation scene kinds render consistently:
    finite [-1,1] images, masks/bboxes present, and foreground fractions in
    the band each kind was designed for (docs/SCENES.md)."""
    from pixelnerf_tpu.data.synthetic import SyntheticDataset

    bands = {
        "sphere": (0.1, 0.45),
        "multi3": (0.1, 0.35),
        "thin": (0.05, 0.3),
        "offcenter": (0.005, 0.08),
        "large": (0.5, 0.95),
        "cluster": (0.05, 0.3),
    }
    for kind, (lo, hi) in bands.items():
        ds = SyntheticDataset(
            n_objs=1, n_views=3, image_size=48, scene_kind=kind
        )
        s = ds[0]
        assert np.isfinite(s["images"]).all()
        assert -1.0 <= s["images"].min() and s["images"].max() <= 1.0
        fg = float(s["masks"].mean())
        assert lo <= fg <= hi, (kind, fg)
        assert s["bbox"].shape == (3, 4)


def test_synthetic_z_span_covers_scene_family():
    """The per-family depth span must contain every object's depth range from
    every ring camera (clipped spans make GT pixels no sample can explain —
    the all-white training collapse), and z_range= must override it."""
    from pixelnerf_tpu.data.synthetic import (
        SyntheticDataset,
        _camera_ring,
        scene_objects,
    )

    for kind in ("multi3", "thin", "offcenter", "large", "cluster"):
        ds = SyntheticDataset(n_objs=1, n_views=6, scene_kind=kind)
        rng = np.random.default_rng(0 * 997 + 0)
        objs = scene_objects(kind, rng)
        poses = _camera_ring(6, seed=0 * 131 + 0)
        for pose in poses:
            cam = np.asarray(pose[:3, 3])
            for obj in objs:
                ctr = np.asarray(obj["center"], np.float32)
                r = float(np.max(np.asarray(obj.get("radii", 0.5))))
                d = float(np.linalg.norm(ctr - cam))
                assert ds.z_near <= d - r + 1e-6, (kind, d - r, ds.z_near)
                assert d + r <= ds.z_far + 1e-6, (kind, d + r, ds.z_far)

    ds = SyntheticDataset(n_objs=1, scene_kind="multi3", z_range=(0.6, 2.2))
    assert (ds.z_near, ds.z_far) == (0.6, 2.2)


def test_render_scene_image_matches_sphere_renderer():
    """A single centered sphere through the multi-object tracer equals the
    original single-sphere renderer (same camera model and shading)."""
    from pixelnerf_tpu.data.synthetic import (
        render_scene_image,
        render_sphere_image,
    )
    from pixelnerf_tpu.utils.geometry import pose_spherical

    pose = np.asarray(pose_spherical(35.0, -25.0, 1.4))
    a = render_sphere_image(
        pose, 48, 48, 40.0, radius=0.42, color=(0.7, 0.2, 0.1),
        color2=(0.1, 0.4, 0.8),
    )
    b = render_scene_image(
        pose, 48, 48, 40.0,
        [dict(center=(0, 0, 0), radii=0.42, color=(0.7, 0.2, 0.1),
              color2=(0.1, 0.4, 0.8))],
    )
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_tracer_supersampling_is_pixel_aligned():
    """supersample=N must anti-alias edges without shifting the image: the
    subpixel grid is centered on each pixel's footprint, so differences vs
    ss=1 concentrate at silhouettes while interior pixels stay put."""
    from pixelnerf_tpu.data.synthetic import (
        render_scene_image,
        render_sphere_image,
        scene_objects,
    )
    from pixelnerf_tpu.utils.geometry import pose_spherical

    pose = np.asarray(pose_spherical(35.0, -25.0, 1.4))
    a = render_sphere_image(pose, 48, 48, 40.0)
    b = render_sphere_image(pose, 48, 48, 40.0, supersample=4)
    assert a.shape == b.shape == (48, 48, 3)
    # AA only changes pixels whose 1-px neighborhood has image structure
    # (silhouette OR the interior two-tone color split); smooth regions —
    # shading gradients, flat background — must stay put, or the subpixel
    # grid is mis-centered and the whole image shifted.
    grad = np.zeros(a.shape[:2], bool)
    for ax in (0, 1):
        for sh in (1, -1):
            grad |= np.abs(a - np.roll(a, sh, axis=ax)).max(axis=-1) > 0.05
    smooth = ~grad
    for ax in (0, 1):
        for sh in (1, -1):
            smooth &= ~np.roll(grad, sh, axis=ax)
    assert smooth.sum() > 100  # the mask actually covers most of the image
    assert np.abs(a - b)[smooth].max() < 0.02
    hit = np.abs(a - 1.0).max(axis=-1) > 1e-6
    bg = ~hit
    for sh in (1, -1):
        bg &= ~np.roll(hit, sh, axis=0) & ~np.roll(hit, sh, axis=1)
    assert np.abs(a - b)[bg].max() < 1e-6
    assert np.abs(a - b)[grad].max() > 0.05  # AA actually engaged

    # multi-object tracer: same contract, and ss=1 stays the identity
    objs = scene_objects("multi3", np.random.default_rng(0))
    c = render_scene_image(pose, 48, 48, 40.0, objs)
    d = render_scene_image(pose, 48, 48, 40.0, objs, supersample=1)
    np.testing.assert_array_equal(c, d)
    e = render_scene_image(pose, 48, 48, 40.0, objs, supersample=2)
    assert 0 < np.abs(c - e).mean() < 0.05
