"""Occupancy-grid sample pruning tests (render/accel.py + the masked
compaction path in render/renderer.py).

The reference has no acceleration structure — it composites every sample of
every ray (/root/reference/src/render/nerf.py:163-249) — so these tests gate a
pure addition: pruned renders must match dense renders to tight tolerances
(pruning only ever removes verified-empty / fully-occluded samples).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelnerf_tpu.render import RenderConfig, render_rays
from pixelnerf_tpu.render.accel import (
    OccupancyGrid,
    aabb_from_rays,
    build_occupancy_grid,
    occupancy_fraction,
    occupancy_lookup,
)

SPHERE_R = 0.4
SIGMA_IN = 60.0


def sphere_field(points, viewdirs, coarse):
    """Analytic field: opaque colored sphere of radius SPHERE_R at the origin.

    Matches the renderer's model_fn contract: (SB, P, 3) -> (SB, 4, P)
    channel-major [r, g, b, sigma].  sigma is EXACTLY zero outside the sphere,
    so pruned empty-space samples contribute exactly nothing.
    """
    r2 = jnp.sum(points * points, axis=-1)  # (SB, P)
    inside = (r2 < SPHERE_R * SPHERE_R).astype(points.dtype)
    rgb = 0.5 + 0.5 * jnp.tanh(points)  # position-dependent color
    sigma = SIGMA_IN * inside
    return jnp.concatenate(
        [jnp.transpose(rgb, (0, 2, 1)), sigma[:, None, :]], axis=1
    )


def camera_rays(B=256, seed=0, near=0.8, far=2.0, cam_dist=1.4):
    """Rays from points on a camera ring toward (jittered) origin."""
    rng = np.random.default_rng(seed)
    theta = rng.uniform(0, 2 * np.pi, B)
    phi = rng.uniform(-0.5, 0.5, B)
    o = cam_dist * np.stack(
        [np.cos(theta) * np.cos(phi), np.sin(theta) * np.cos(phi), np.sin(phi)],
        axis=-1,
    ).astype(np.float32)
    target = rng.uniform(-0.55, 0.55, (B, 3)).astype(np.float32)
    d = target - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    nears = np.full((B, 1), near, np.float32)
    fars = np.full((B, 1), far, np.float32)
    return np.concatenate([o, d, nears, fars], axis=-1)


def build_sphere_grid(rays, resolution=48, dilate=1):
    lo, hi = aabb_from_rays(rays)
    return build_occupancy_grid(
        sphere_field,
        lo,
        hi,
        resolution=resolution,
        sigma_thresh=1e-2,
        dilate=dilate,
        use_fine=False,
        use_viewdirs=False,
    )


def test_aabb_from_rays():
    rays = camera_rays(64)
    lo, hi = aabb_from_rays(rays)
    o, d = rays[:, :3], rays[:, 3:6]
    for t in (rays[:, 6], rays[:, 7]):
        p = o + t[:, None] * d
        assert (p >= lo - 1e-5).all() and (p <= hi + 1e-5).all()


def test_build_grid_matches_analytic_sphere():
    rays = camera_rays(128)
    grid = build_sphere_grid(rays, resolution=48, dilate=1)
    frac = occupancy_fraction(grid)
    # sphere volume / AABB volume is small; with one dilation round still far
    # below half occupancy, and non-trivially nonzero
    assert 0.001 < frac < 0.25, frac

    # voxel-center ground truth: occupied iff within one dilated voxel of the
    # sphere.  Check well-inside points live, far-outside points are skipped.
    pts_in = np.random.default_rng(1).uniform(-0.2, 0.2, (64, 3)).astype(
        np.float32
    )
    occ_in = np.asarray(occupancy_lookup(grid, jnp.asarray(pts_in[None])))
    assert occ_in.all()

    pts_out = np.array(
        [[0.9, 0.9, 0.9], [-0.9, 0.8, 0.0], [0.0, -0.95, 0.3]], np.float32
    )
    occ_out = np.asarray(occupancy_lookup(grid, jnp.asarray(pts_out[None])))
    assert not occ_out.any()


def test_probe_lookup_matches_separate_lookups():
    """The fused single-gather probe (accel.probe_lookup) must be bit-equal
    to the separate occupancy_lookup + sigma_lookup pair on sigma-carrying
    grids (occ == dilated_sig > thresh by construction), and to
    occupancy_lookup alone on mask-only grids — including OUTSIDE-box points
    (conservatively occupied, sigma = thresh)."""
    from pixelnerf_tpu.render.accel import probe_lookup, sigma_lookup

    rays = camera_rays(64)
    grid = build_sphere_grid(rays, resolution=32, dilate=1)
    assert grid.sig is not None

    rng = np.random.default_rng(9)
    # span well past the AABB so both in- and out-of-box points are tested
    pts = jnp.asarray(rng.uniform(-3.0, 3.0, (1, 512, 3)).astype(np.float32))

    mask, sig = probe_lookup(grid, pts)
    np.testing.assert_array_equal(
        np.asarray(mask), np.asarray(occupancy_lookup(grid, pts))
    )
    np.testing.assert_array_equal(
        np.asarray(sig), np.asarray(sigma_lookup(grid, pts))
    )

    mask_grid = OccupancyGrid(
        occ=grid.occ, lo=grid.lo, inv_cell=grid.inv_cell,
        resolution=grid.resolution,
    )
    m2, s2 = probe_lookup(mask_grid, pts)
    assert s2 is None
    np.testing.assert_array_equal(
        np.asarray(m2), np.asarray(occupancy_lookup(mask_grid, pts))
    )


def test_lookup_outside_box_is_conservative():
    grid = OccupancyGrid(
        occ=jnp.zeros((8,), jnp.float32),
        lo=jnp.zeros((3,)),
        inv_cell=jnp.full((3,), 2.0),
        resolution=2,
    )
    pts = jnp.asarray([[[-1.0, 0.5, 0.5], [0.5, 0.5, 0.5], [2.0, 0.5, 0.5]]])
    occ = np.asarray(occupancy_lookup(grid, pts))
    # outside the box -> conservatively occupied; inside an empty grid -> skip
    np.testing.assert_array_equal(occ[0], [True, False, True])


def _render(rays, cfg, accel=None, seed=3):
    out = jax.jit(
        lambda r, k: render_rays(
            sphere_field,
            r,
            k,
            cfg,
            want_weights=True,
            use_viewdirs=False,
            accel=accel,
        )
    )(jnp.asarray(rays[None]), jax.random.PRNGKey(seed))
    return jax.tree_util.tree_map(np.asarray, out)


@pytest.mark.slow
def test_sample_pruned_render_matches_dense():
    """Per-sample pruning with an exact-zero-outside field must reproduce the
    dense render to float tolerance (identical compositing of live samples)."""
    rays = camera_rays(256)
    grid = build_sphere_grid(rays)
    cfg = RenderConfig(
        n_coarse=32, n_fine=16, n_fine_depth=8, white_bkgd=True,
        accel_mode="samples", accel_capacity=0.6,
    )
    dense = _render(rays, cfg, accel=None)
    pruned = _render(rays, cfg, accel=grid)
    for head in ("coarse", "fine"):
        np.testing.assert_allclose(
            pruned[head]["rgb"], dense[head]["rgb"], atol=2e-3
        )
        np.testing.assert_allclose(
            pruned[head]["depth"], dense[head]["depth"], atol=5e-3
        )
    # PSNR-style bound on the fine head (the eval output)
    mse = float(np.mean((pruned["fine"]["rgb"] - dense["fine"]["rgb"]) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-12))
    assert psnr > 50.0, psnr


@pytest.mark.slow
def test_ray_pruned_render_matches_dense():
    """Ray-level compaction (default accel_mode): miss rays composite to the
    exact background the dense path produces (sigma is exactly zero outside
    the sphere), and kept rays reuse the identical coarse z draw — the coarse
    head must match tightly, the fine head (whose importance draw differs in
    shape) to >= 40 dB."""
    rays = camera_rays(1024)
    grid = build_sphere_grid(rays)
    cfg = RenderConfig(
        n_coarse=32, n_fine=16, n_fine_depth=8, white_bkgd=True,
        accel_mode="rays", accel_capacity_rays=0.75,
    )
    dense = _render(rays, cfg, accel=None)
    pruned = _render(rays, cfg, accel=grid)
    np.testing.assert_allclose(
        pruned["coarse"]["rgb"], dense["coarse"]["rgb"], atol=2e-3
    )
    np.testing.assert_allclose(
        pruned["coarse"]["depth"], dense["coarse"]["depth"], atol=5e-3
    )
    mse = float(np.mean((pruned["fine"]["rgb"] - dense["fine"]["rgb"]) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-12))
    assert psnr > 40.0, psnr


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["rays", "samples"])
def test_capacity_overflow_falls_back_to_dense(mode):
    """A chunk with more live elements than capacity must take the lax.cond
    dense path and return bit-identical results."""
    rays = camera_rays(512)
    # all-occupied grid -> live count = everything > tiny capacity
    lo, hi = aabb_from_rays(rays)
    grid = OccupancyGrid(
        occ=jnp.ones((16**3,), jnp.float32),
        lo=jnp.asarray(lo),
        inv_cell=16.0 / (jnp.asarray(hi) - jnp.asarray(lo)),
        resolution=16,
    )
    cfg = RenderConfig(
        n_coarse=16, n_fine=8, accel_mode=mode,
        accel_capacity=0.01, accel_capacity_rays=0.25,
    )
    dense = _render(rays, cfg, accel=None)
    via_fallback = _render(rays, cfg, accel=grid)
    # same math modulo XLA refusion inside the cond branch
    np.testing.assert_allclose(
        via_fallback["fine"]["rgb"], dense["fine"]["rgb"], rtol=1e-5, atol=1e-6
    )


def test_all_occupied_grid_exactness():
    """An all-occupied grid prunes nothing: compacted eval (capacity >= live
    count) must equal the dense path to float tolerance."""
    rays = camera_rays(48)
    lo, hi = aabb_from_rays(rays)
    grid = OccupancyGrid(
        occ=jnp.ones((8**3,), jnp.float32),
        lo=jnp.asarray(lo),
        inv_cell=8.0 / (jnp.asarray(hi) - jnp.asarray(lo)),
        resolution=8,
    )
    cfg = RenderConfig(n_coarse=16, accel_mode="samples", accel_capacity=1.0)
    dense = _render(rays, cfg, accel=None)
    pruned = _render(rays, cfg, accel=grid)
    np.testing.assert_allclose(
        pruned["coarse"]["rgb"], dense["coarse"]["rgb"], atol=1e-5
    )


@pytest.mark.slow
def test_training_and_superbatch_ignore_accel():
    """accel is eval-only (SB == 1, training=False); other paths must render
    identically with or without a grid."""
    rays = np.stack([camera_rays(32, seed=s) for s in (5, 6)])  # SB=2
    grid = build_sphere_grid(rays.reshape(-1, 8))
    cfg = RenderConfig(n_coarse=16, n_fine=8)
    a = _render(rays.reshape(2, 32, 8)[0], cfg, accel=None)  # smoke dense

    out_nog = jax.jit(
        lambda r, k: render_rays(
            sphere_field, r, k, cfg, use_viewdirs=False, accel=None
        )
    )(jnp.asarray(rays), jax.random.PRNGKey(0))
    out_grid = jax.jit(
        lambda r, k: render_rays(
            sphere_field, r, k, cfg, use_viewdirs=False, accel=grid
        )
    )(jnp.asarray(rays), jax.random.PRNGKey(0))
    np.testing.assert_array_equal(
        np.asarray(out_grid["fine"]["rgb"]), np.asarray(out_nog["fine"]["rgb"])
    )
    assert np.isfinite(a["coarse"]["rgb"]).all()


@pytest.mark.slow
def test_pipeline_build_accel_and_render(monkeypatch):
    """End-to-end: RenderPipeline.build_accel on the real conditioned net,
    then render_simple with pruning enabled — finite output, close to the
    dense render, and PIXELNERF_ACCEL=0 disables the grid."""
    from pixelnerf_tpu.config import hocon
    from pixelnerf_tpu.data import SyntheticDataset
    from pixelnerf_tpu.models import PixelNeRFNet, make_model
    from pixelnerf_tpu.parallel import RenderPipeline
    from pixelnerf_tpu.render.renderer import NeRFRenderer
    from pixelnerf_tpu.utils import geometry

    conf = hocon.parse_file("conf/exp/sn64.conf")
    net = make_model(conf["model"], mlp_impl="xla")
    ds = SyntheticDataset(n_objs=1, n_views=2, image_size=16)
    sample = ds[0]
    focal = np.float32(sample["focal"])
    imgs = jnp.asarray(sample["images"][None, :1])
    poses = jnp.asarray(sample["poses"][None, :1])
    variables = jax.jit(net.init)(
        jax.random.PRNGKey(0),
        imgs,
        poses,
        jnp.asarray(focal),
        jnp.zeros((1, 8, 3), jnp.float32),
        jnp.zeros((1, 8, 3), jnp.float32),
    )
    scene = net.apply(
        variables, imgs, poses, jnp.asarray(focal), method=PixelNeRFNet.encode
    )
    renderer = NeRFRenderer(RenderConfig(n_coarse=8, n_fine=4))
    pipeline = RenderPipeline(net, renderer, simple_output=True)
    rays = np.asarray(
        geometry.gen_rays_np(
            sample["poses"][1:2], 16, 16, float(focal), 0.8, 1.8
        )
    ).reshape(-1, 8)

    rgb_dense, _ = pipeline.render_simple(
        variables, scene, rays, jax.random.PRNGKey(1), ray_batch_size=256
    )

    pipeline.build_accel(variables, scene, rays, resolution=16, n_dir_probes=1)
    # a random-init net's grid may be near-fully occupied, in which case
    # autoselect disables pruning (accel None) — both outcomes must render
    rgb_pruned, _ = pipeline.render_simple(
        variables, scene, rays, jax.random.PRNGKey(1), ray_batch_size=256
    )
    assert np.isfinite(np.asarray(rgb_pruned)).all()
    # random-init net: grid is near-fully occupied, render must stay close
    diff = float(np.max(np.abs(np.asarray(rgb_pruned) - np.asarray(rgb_dense))))
    assert diff < 0.05, diff

    monkeypatch.setenv("PIXELNERF_ACCEL", "0")
    assert pipeline.build_accel(variables, scene, rays) is None
    assert pipeline.accel is None


@pytest.mark.slow
def test_proposal_render_matches_dense():
    """Grid-proposal mode (accel_mode="proposal") replaces the coarse MLP
    with occupancy lookups and shrinks the fine union to
    accel_proposal_samples + n_fine_depth grid-guided draws.  On the analytic
    sphere (sigma exactly zero outside) the fine head must match a dense
    render to >= 30 dB, and the coarse head must report the proposal
    contract (rgb == background)."""
    rays = camera_rays(1024)
    grid = build_sphere_grid(rays)
    cfg = RenderConfig(
        n_coarse=32, n_fine=16, n_fine_depth=8, white_bkgd=True,
        accel_mode="proposal", accel_proposal_samples=24,
        accel_capacity_rays=0.75,
    )
    dense = _render(rays, cfg, accel=None)
    prop = _render(rays, cfg, accel=grid)

    # fine union = 24 proposal + 8 depth samples
    assert prop["fine"]["weights"].shape[-1] == 32
    # coarse head is the proposal: background rgb everywhere
    np.testing.assert_allclose(prop["coarse"]["rgb"], 1.0, atol=1e-6)

    mse = float(np.mean((prop["fine"]["rgb"] - dense["fine"]["rgb"]) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-12))
    assert psnr > 30.0, psnr
    # depth agreement on rays that hit the sphere (miss rays composite ~0)
    hit = dense["fine"]["weights"].sum(axis=-1)[0] > 0.5
    assert hit.any()
    d_err = np.abs(prop["fine"]["depth"][0, hit] - dense["fine"]["depth"][0, hit])
    assert np.median(d_err) < 0.05, np.median(d_err)


@pytest.mark.slow
def test_proposal_depth_samples_override():
    """accel_depth_samples shrinks the proposal union's depth draws WITHOUT
    touching the dense path's n_fine_depth (measured redundant there:
    scripts/study_proposal.py, 16 -> 8 draws at 0.0 dB cost).  The union
    width must follow the override and the render must stay >= 30 dB vs
    dense; a dense render under the same cfg keeps the full n_fine union."""
    rays = camera_rays(1024)
    grid = build_sphere_grid(rays)
    cfg = RenderConfig(
        n_coarse=32, n_fine=16, n_fine_depth=8, white_bkgd=True,
        accel_mode="proposal", accel_proposal_samples=24,
        accel_depth_samples=4, accel_capacity_rays=0.75,
    )
    dense = _render(rays, cfg, accel=None)
    prop = _render(rays, cfg, accel=grid)

    # proposal union = 24 proposal + 4 override depth draws
    assert prop["fine"]["weights"].shape[-1] == 28
    # dense path ignores the override: coarse 32 + n_fine 16 union
    assert dense["fine"]["weights"].shape[-1] == 48

    mse = float(np.mean((prop["fine"]["rgb"] - dense["fine"]["rgb"]) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-12))
    assert psnr > 30.0, psnr

    # conf surface: explicit value parsed, negative -> None (follow
    # n_fine_depth), absent -> the production default (8)
    from pixelnerf_tpu.config import hocon

    c = hocon.parse_string(
        "n_coarse = 8\naccel_mode = proposal\naccel_depth_samples = 4\n"
    )
    assert RenderConfig.from_conf(c).accel_depth_samples == 4
    c2 = hocon.parse_string("n_coarse = 8\naccel_depth_samples = -1\n")
    assert RenderConfig.from_conf(c2).accel_depth_samples is None
    c3 = hocon.parse_string("n_coarse = 8\n")
    assert RenderConfig.from_conf(c3).accel_depth_samples == 8


@pytest.mark.slow
def test_proposal_capacity_overflow_uses_proposal_dense():
    """Over-capacity chunks in proposal mode fall back to a DENSE-RAY render
    that still uses proposal sampling (consistent cond branches; finite)."""
    rays = camera_rays(512)
    lo, hi = aabb_from_rays(rays)
    grid = OccupancyGrid(
        occ=jnp.ones((16**3,), jnp.float32),
        lo=jnp.asarray(lo),
        inv_cell=16.0 / (jnp.asarray(hi) - jnp.asarray(lo)),
        resolution=16,
    )
    cfg = RenderConfig(
        n_coarse=16, n_fine=8, n_fine_depth=4, accel_mode="proposal",
        accel_proposal_samples=12, accel_depth_samples=4,
        accel_capacity_rays=0.25, white_bkgd=True,
    )
    out = _render(rays, cfg, accel=grid)
    assert out["fine"]["weights"].shape[-1] == 16  # 12 proposal + 4 depth
    for head in out.values():
        for v in head.values():
            assert np.isfinite(v).all()


def test_proposal_without_fine_degrades_to_ray_mode():
    """accel_mode="proposal" with n_fine == 0 must not drop the only MLP
    pass — it degrades to plain ray compaction (coarse head is a render)."""
    rays = camera_rays(256)
    grid = build_sphere_grid(rays)
    cfg = RenderConfig(
        n_coarse=32, n_fine=0, white_bkgd=True,
        accel_mode="proposal", accel_capacity_rays=0.75,
    )
    dense = _render(rays, cfg, accel=None)
    pruned = _render(rays, cfg, accel=grid)
    np.testing.assert_allclose(
        pruned["coarse"]["rgb"], dense["coarse"]["rgb"], atol=2e-3
    )


@pytest.mark.slow
def test_proposal_empty_ray_depth_branch_consistent():
    """A fully-empty ray's proposal coarse depth must be 0.0 from BOTH
    lax.cond branches: the compacted branch's scatter fill and the
    over-capacity dense-proposal fallback's wsum==0 case (renderer.py
    proposal depth convention — matches a dense composite of an empty ray,
    whose weights ~ 0 give depth ~ 0)."""
    rays = camera_rays(2048)
    lo, hi = aabb_from_rays(rays)
    empty_grid = OccupancyGrid(
        occ=jnp.zeros((16**3,), jnp.float32),
        lo=jnp.asarray(lo),
        inv_cell=16.0 / (jnp.asarray(hi) - jnp.asarray(lo)),
        resolution=16,
    )
    base = dict(
        n_coarse=16, n_fine=8, n_fine_depth=4, white_bkgd=False,
        accel_mode="proposal", accel_proposal_samples=12,
    )
    # 0.1 * 2048 -> capacity 256 < B: every ray is empty, so n_live = 0 and
    # the COMPACTED branch scatter-fills all outputs
    compacted = _render(
        rays, RenderConfig(**base, accel_capacity_rays=0.1), accel=empty_grid
    )
    # capacity >= B short-circuits into the dense proposal render (the same
    # code the over-capacity lax.cond branch runs)
    dense = _render(
        rays, RenderConfig(**base, accel_capacity_rays=1.0), accel=empty_grid
    )
    np.testing.assert_array_equal(compacted["coarse"]["depth"], 0.0)
    np.testing.assert_array_equal(dense["coarse"]["depth"], 0.0)
    # the proposal coarse head reports background rgb in both branches too
    np.testing.assert_allclose(compacted["coarse"]["rgb"], 0.0, atol=1e-6)
    np.testing.assert_allclose(dense["coarse"]["rgb"], 0.0, atol=1e-6)
    # (fine heads are NOT compared: the grid deliberately contradicts the
    # field here — dense proposal draws still strike the sphere while the
    # compacted branch prunes every ray; grid fidelity is build_accel's
    # contract, tested above)


@pytest.mark.slow
def test_proposal_sigma_pdf_tracks_surface():
    """With a sigma-carrying grid (build_occupancy_grid stores the dilated
    max-sigma field) the proposal pdf is the grid's compositing weight, not
    the binary mask: the depth estimate lands at the sphere's FRONT surface
    instead of the middle of the occupied span, and bins occluded behind the
    surface keep only the accel_proposal_uniform mask share of the pdf."""
    # rays aimed exactly at the origin from distance 1.4: the sphere
    # (radius 0.4) spans t in [1.0, 1.8] on every ray
    rng = np.random.default_rng(5)
    theta = rng.uniform(0, 2 * np.pi, 256)
    phi = rng.uniform(-0.5, 0.5, 256)
    o = 1.4 * np.stack(
        [np.cos(theta) * np.cos(phi), np.sin(theta) * np.cos(phi), np.sin(phi)],
        axis=-1,
    ).astype(np.float32)
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    rays = np.concatenate(
        [o, d, np.full((256, 1), 0.8, np.float32), np.full((256, 1), 2.0, np.float32)],
        axis=-1,
    )
    grid = build_sphere_grid(rays, resolution=48, dilate=1)
    assert grid.sig is not None

    cfg = RenderConfig(
        n_coarse=32, n_fine=16, n_fine_depth=8, white_bkgd=True,
        accel_mode="proposal", accel_proposal_samples=24,
        # pin the pdf shape the bounds below were calibrated for (the
        # production default cap is sharper, which legitimately spreads the
        # depth estimate ~0.07 deeper — this test is about sigma-pdf vs
        # mask-pdf TRACKING, not the default operating point)
        accel_proposal_alpha_cap=0.25,
        accel_capacity_rays=1.0,  # dense-proposal branch: every ray hits
    )
    out_sig = _render(rays, cfg, accel=grid)
    # binary-mask fallback: same occupancy, sig stripped
    mask_grid = OccupancyGrid(
        occ=grid.occ, lo=grid.lo, inv_cell=grid.inv_cell,
        resolution=grid.resolution,
    )
    out_mask = _render(rays, cfg, accel=mask_grid)

    # grid-sigma depth ~ dilated front surface (1.0 minus up to ~2 cells);
    # the mask pdf averages over the whole occupied chord (~1.4)
    d_sig = np.asarray(out_sig["coarse"]["depth"][0])
    d_mask = np.asarray(out_mask["coarse"]["depth"][0])
    assert 0.8 < np.median(d_sig) < 1.1, np.median(d_sig)
    assert np.median(d_mask) > np.median(d_sig) + 0.2, (
        np.median(d_mask), np.median(d_sig))

    # occluded mass: proposal weights beyond the sphere center keep at most
    # ~the uniform-mixture share (mask pdf: roughly half its mass)
    z = np.linspace(0.8, 2.0, 33)[:-1]  # bin lower edges, matches z_steps
    w_sig = np.asarray(out_sig["coarse"]["weights"][0])  # (B, 32) pdf
    w_mask = np.asarray(out_mask["coarse"]["weights"][0])
    behind = z > 1.45
    m_sig = w_sig[:, behind].sum(axis=-1) / np.maximum(w_sig.sum(axis=-1), 1e-9)
    m_mask = w_mask[:, behind].sum(axis=-1) / np.maximum(
        w_mask.sum(axis=-1), 1e-9
    )
    assert np.median(m_sig) < 0.15, np.median(m_sig)
    assert np.median(m_mask) > 0.3, np.median(m_mask)

    # and the render still matches dense
    dense = _render(rays, cfg, accel=None)
    mse = float(np.mean((out_sig["fine"]["rgb"] - dense["fine"]["rgb"]) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-12))
    assert psnr > 30.0, psnr


@pytest.mark.slow
def test_proposal_probe_count_decoupled_from_n_coarse():
    """accel_probe_samples probes a finer grid-lookup ladder than n_coarse in
    proposal mode (probes are ~free next to MLP evals): the pdf/liveness use
    the finer ladder, the fine union size is unchanged, and the render still
    matches dense — through BOTH the compacted and the capacity>=B branch."""
    rays = camera_rays(1024)
    grid = build_sphere_grid(rays)
    base = dict(
        n_coarse=32, n_fine=16, n_fine_depth=8, white_bkgd=True,
        accel_mode="proposal", accel_proposal_samples=24,
        accel_probe_samples=96,
    )
    dense = _render(
        rays, RenderConfig(**{**base, "accel_probe_samples": 0}), accel=None
    )
    for cap in (0.75, 1.0):  # compacted branch / short-circuit dense branch
        out = _render(
            rays, RenderConfig(**base, accel_capacity_rays=cap), accel=grid
        )
        # coarse head carries the proposal pdf over the 96-probe ladder
        assert out["coarse"]["weights"].shape[-1] == 96
        assert out["fine"]["weights"].shape[-1] == 32  # 24 + 8, unchanged
        mse = float(np.mean((out["fine"]["rgb"] - dense["fine"]["rgb"]) ** 2))
        psnr = -10.0 * np.log10(max(mse, 1e-12))
        assert psnr > 30.0, (cap, psnr)


@pytest.mark.slow
def test_proposal_subthreshold_sigma_keeps_empty_depth_zero():
    """Sub-threshold grid sigma must contribute ZERO proposal weight: a ray
    the compaction branch prunes (scatter fill depth 0.0) must read depth 0.0
    on the dense fallback branch too, even when the stored sigma field is
    positive below the build threshold (renderer.py gates the sigma pdf by
    the liveness mask)."""
    rays = camera_rays(512)
    lo, hi = aabb_from_rays(rays)
    n = 16 ** 3
    grid = OccupancyGrid(
        occ=jnp.zeros((n,), jnp.float32),
        lo=jnp.asarray(lo),
        inv_cell=16.0 / (jnp.asarray(hi) - jnp.asarray(lo)),
        sig=jnp.full((n,), 5e-3, jnp.float32),  # positive but < thresh
        thresh=jnp.asarray(1e-2, jnp.float32),
        resolution=16,
    )
    base = dict(
        n_coarse=16, n_fine=8, n_fine_depth=4, white_bkgd=False,
        accel_mode="proposal", accel_proposal_samples=12,
    )
    compacted = _render(
        rays, RenderConfig(**base, accel_capacity_rays=0.1), accel=grid
    )
    dense = _render(
        rays, RenderConfig(**base, accel_capacity_rays=1.0), accel=grid
    )
    np.testing.assert_array_equal(compacted["coarse"]["depth"], 0.0)
    np.testing.assert_array_equal(dense["coarse"]["depth"], 0.0)


@pytest.mark.slow
def test_mesh_sharded_accel_render_matches_single_device():
    """Occupancy pruning under a ray-sharded mesh: on real multi-chip
    hardware gen_video engages BOTH the grid accel and the ray mesh
    (eval/gen_video.py builds the mesh from --gpu_id and build_accel runs
    whenever the backend is not cpu) — the fixed-capacity compaction
    (jnp.nonzero gather + scatter-back) must compile and produce the same
    pixels under SPMD partitioning as on one device.  Same rng + same chunk
    shapes => identical draws; sharding must not change the math."""
    from pixelnerf_tpu.config import hocon
    from pixelnerf_tpu.data import SyntheticDataset
    from pixelnerf_tpu.models import PixelNeRFNet, make_model
    from pixelnerf_tpu.parallel import RenderPipeline, make_ray_mesh
    from pixelnerf_tpu.render.renderer import NeRFRenderer
    from pixelnerf_tpu.utils import geometry

    conf = hocon.parse_file("conf/exp/sn64.conf")
    net = make_model(conf["model"], mlp_impl="xla")
    ds = SyntheticDataset(n_objs=1, n_views=2, image_size=16)
    sample = ds[0]
    focal = np.float32(sample["focal"])
    imgs = jnp.asarray(sample["images"][None, :1])
    poses = jnp.asarray(sample["poses"][None, :1])
    variables = jax.jit(net.init)(
        jax.random.PRNGKey(0), imgs, poses, jnp.asarray(focal),
        jnp.zeros((1, 4, 3), jnp.float32), jnp.zeros((1, 4, 3), jnp.float32),
    )
    scene = net.apply(
        variables, imgs, poses, jnp.asarray(focal), method=PixelNeRFNet.encode
    )
    rays = geometry.gen_rays_np(
        sample["poses"][1:2], 16, 16, float(focal), 0.8, 1.8
    ).reshape(-1, 8)

    # a half-empty grid injected directly (build_accel on a random-init net
    # may disable pruning as near-fully-occupied; the SPMD consistency
    # contract holds for ANY grid as long as both pipelines share it)
    lo, hi = aabb_from_rays(rays)
    R = 8
    centers = (np.arange(R) + 0.5) / R
    gx, gy, gz = np.meshgrid(centers, centers, centers, indexing="ij")
    occ = (gx < 0.5).astype(np.float32)  # occupy half the box
    grid = OccupancyGrid(
        occ=jnp.asarray(occ.reshape(-1)),
        lo=jnp.asarray(lo),
        inv_cell=R / (jnp.asarray(hi) - jnp.asarray(lo)),
        resolution=R,
    )

    def make(mesh):
        cfg = RenderConfig(
            n_coarse=8, n_fine=6, n_fine_depth=2, white_bkgd=True,
            accel_mode="proposal", accel_proposal_samples=8,
            accel_capacity_rays=0.75,
        )
        pipe = RenderPipeline(net, renderer=NeRFRenderer(cfg), mesh=mesh)
        pipe.accel = grid
        return pipe

    rng = jax.random.PRNGKey(5)
    rgb1, depth1 = make(None).render_simple(
        variables, scene, rays, rng, ray_batch_size=128
    )
    rgb8, depth8 = make(make_ray_mesh(8)).render_simple(
        variables, scene, rays, rng, ray_batch_size=128
    )
    assert np.isfinite(rgb8).all()
    np.testing.assert_allclose(rgb8, rgb1, atol=2e-5)
    np.testing.assert_allclose(depth8, depth1, atol=2e-5)


def test_capacity_probe_matches_host_midpoints_and_is_deterministic():
    """The on-device capacity probe's draw 0 must equal a host-side midpoint
    liveness computation, jittered draws must be conservative supersets of
    nothing (bounded by [base, base+1/kc) bins), and repeated calls with the
    same key must agree exactly (capacity stability across runs)."""
    from pixelnerf_tpu.parallel.pipeline import _capacity_probe

    R = 8
    occ = np.zeros((R, R, R), np.float32)
    occ[:, :, :4] = 1.0  # z < 0.5 occupied
    grid = OccupancyGrid(
        occ=jnp.asarray(occ.reshape(-1)),
        lo=jnp.zeros(3),
        inv_cell=jnp.full((3,), float(R)),
        resolution=R,
    )
    N, kc, D = 512, 8, 4
    rng = np.random.default_rng(5)
    origins = rng.uniform(0.0, 1.0, (N, 3)).astype(np.float32)
    dirs = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (N, 1))
    rays = np.concatenate(
        [origins, dirs, np.zeros((N, 1), np.float32),
         np.full((N, 1), 0.25, np.float32)], axis=1,
    )
    key = jax.random.PRNGKey(0)
    live, counts = _capacity_probe(grid, jnp.asarray(rays), key, kc, D)
    live = np.asarray(live)
    assert live.shape == (D, N) and np.asarray(counts).shape == (D,)

    # draw 0 == host midpoint ladder
    t = (np.arange(kc, dtype=np.float32) + 0.5) / kc
    z = rays[:, 6:7] + t[None] * (rays[:, 7:8] - rays[:, 6:7])
    pts = rays[:, None, :3] + z[..., None] * rays[:, None, 3:6]
    host_live = np.asarray(occupancy_lookup(grid, jnp.asarray(pts))).any(-1)
    np.testing.assert_array_equal(live[0], host_live)
    assert float(np.asarray(counts)[0]) == float(
        np.asarray(occupancy_lookup(grid, jnp.asarray(pts))).sum()
    )

    # deterministic: same key -> identical liveness (capacity, and thus the
    # compiled render shape, must not wobble across runs)
    live2, counts2 = _capacity_probe(grid, jnp.asarray(rays), key, kc, D)
    np.testing.assert_array_equal(live, np.asarray(live2))
    np.testing.assert_array_equal(np.asarray(counts), np.asarray(counts2))


def test_capacity_window_matches_effective_chunk():
    """Capacity sizing must cover the WORST render chunk.  The effective
    chunk is min(device_chunk, ray_batch_size) (pipeline._dispatch), so when
    a caller renders with -R smaller than device_chunk, build_accel's
    ray_batch_size hint must shrink the estimation window accordingly —
    otherwise a chunk fully inside the object overflows its buffer and
    silently falls back to the dense path every frame."""
    from pixelnerf_tpu.parallel.pipeline import RenderPipeline
    from pixelnerf_tpu.render.renderer import NeRFRenderer

    cfg = RenderConfig(
        n_coarse=8, n_fine=4, n_fine_depth=0, white_bkgd=True,
        accel_mode="rays",
    )
    pipe = RenderPipeline.__new__(RenderPipeline)  # no model needed
    pipe.device_chunk = 8192
    R = 8
    occ = np.zeros((R, R, R), np.float32)
    occ[:, :, :4] = 1.0  # z < 0.5 occupied
    grid = OccupancyGrid(
        occ=jnp.asarray(occ.reshape(-1)),
        lo=jnp.zeros(3),
        inv_cell=jnp.full((3,), float(R)),
        resolution=R,
    )
    # 2048 rays marching +z over [0, 0.3]: the first 512 start inside the
    # occupied half (100% live), the rest in empty space (0% live)
    N = 2048
    origins = np.zeros((N, 3), np.float32)
    origins[:512, 2] = 0.1
    origins[512:, 2] = 0.6
    dirs = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (N, 1))
    rays = np.concatenate(
        [origins, dirs, np.zeros((N, 1), np.float32),
         np.full((N, 1), 0.3, np.float32)], axis=1,
    )

    # without a hint the single whole-batch window averages occupied and
    # empty regions: capacity ~0.25 x margin, an underestimate for the
    # worst 512-ray chunk (fully live)
    pipe.accel = grid
    pipe.renderer = NeRFRenderer(cfg)
    pipe._autoselect_capacity(rays)
    assert pipe.renderer.base_cfg.accel_capacity_rays < 0.5

    # with the hint the worst 512-ray window is fully live -> >= 0.95 ->
    # pruning correctly disabled (static capacity 1.0 can never win)
    pipe.accel = grid
    pipe.renderer = NeRFRenderer(cfg)
    pipe._autoselect_capacity(rays, ray_batch_size=512)
    assert pipe.accel is None


def test_capacity_window_includes_tail_chunk():
    """The worst-window scan must not drop the final partial window: a live
    tail chunk would otherwise undersize accel_capacity_rays and push that
    chunk onto the dense fallback on every render."""
    from pixelnerf_tpu.parallel.pipeline import RenderPipeline
    from pixelnerf_tpu.render.renderer import NeRFRenderer

    cfg = RenderConfig(
        n_coarse=8, n_fine=4, n_fine_depth=0, white_bkgd=True,
        accel_mode="rays",
    )
    pipe = RenderPipeline.__new__(RenderPipeline)  # no model needed
    pipe.device_chunk = 8192
    R = 8
    occ = np.zeros((R, R, R), np.float32)
    occ[:, :, :4] = 1.0  # z < 0.5 occupied
    grid = OccupancyGrid(
        occ=jnp.asarray(occ.reshape(-1)),
        lo=jnp.zeros(3),
        inv_cell=jnp.full((3,), float(R)),
        resolution=R,
    )
    # 1200 rays marching +z over [0, 0.3]: only the LAST 176 (the partial
    # 512-ray window) start inside the occupied half
    N, win = 1200, 512
    origins = np.zeros((N, 3), np.float32)
    origins[:, 2] = 0.6  # empty space
    origins[N - (N % win):, 2] = 0.1  # live tail
    dirs = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (N, 1))
    rays = np.concatenate(
        [origins, dirs, np.zeros((N, 1), np.float32),
         np.full((N, 1), 0.3, np.float32)], axis=1,
    )

    pipe.accel = grid
    pipe.renderer = NeRFRenderer(cfg)
    pipe._autoselect_capacity(rays, ray_batch_size=win)
    # the tail window is fully live (its padding repeats the live last ray),
    # so capacity >= 0.95 and pruning is disabled — NOT the 0.0625 floor the
    # tail-dropping scan produced
    assert pipe.accel is None


def test_proposal_disable_rung_keys_on_sample_capacity():
    """PROPOSAL mode keeps pruning when every RAY is live but most SAMPLES
    are not: its win (coarse MLP pass replaced by grid lookups, lean fine
    union) doesn't require dead rays.  Only a fog field — live samples
    everywhere, so the pdf is ~uniform — disables it at build time.
    The multiscale bench field is exactly the first case (ray live 0.84,
    sample live 0.47) and was losing 5x to the old ray-capacity keying."""
    from pixelnerf_tpu.parallel.pipeline import RenderPipeline
    from pixelnerf_tpu.render.renderer import NeRFRenderer

    R = 8
    occ = np.zeros((R, R, R), np.float32)
    occ[:, :, 3:5] = 1.0  # a z-slab: every +z ray crosses it; ~25% of samples
    slab_grid = OccupancyGrid(
        occ=jnp.asarray(occ.reshape(-1)),
        lo=jnp.zeros(3),
        inv_cell=jnp.full((3,), float(R)),
        resolution=R,
    )
    N = 1024
    origins = np.zeros((N, 3), np.float32)
    dirs = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (N, 1))
    rays = np.concatenate(
        [origins, dirs, np.zeros((N, 1), np.float32),
         np.ones((N, 1), np.float32)], axis=1,
    )

    cfg = RenderConfig(
        n_coarse=8, n_fine=4, n_fine_depth=0, white_bkgd=True,
        accel_mode="proposal",
    )
    pipe = RenderPipeline.__new__(RenderPipeline)  # no model needed
    pipe.device_chunk = 8192
    pipe.accel = slab_grid
    pipe.renderer = NeRFRenderer(cfg)
    pipe._autoselect_capacity(rays, ray_batch_size=N)
    assert pipe.accel is not None  # all rays live, but samples are prunable
    assert pipe.renderer.base_cfg.accel_capacity_rays == 1.0
    assert pipe.renderer.base_cfg.accel_capacity < 0.95

    # same rays against a fully-occupied grid: fog — nothing for the
    # proposal pdf to concentrate on; disabled at build
    fog_grid = OccupancyGrid(
        occ=jnp.ones(R * R * R),
        lo=jnp.zeros(3),
        inv_cell=jnp.full((3,), float(R)),
        resolution=R,
    )
    pipe.accel = fog_grid
    pipe.renderer = NeRFRenderer(cfg)
    pipe._autoselect_capacity(rays, ray_batch_size=N)
    assert pipe.accel is None

    # RAYS mode on the slab grid still keys on ray capacity: every ray is
    # live, so compaction has nothing to skip and is correctly disabled
    pipe.accel = slab_grid
    pipe.renderer = NeRFRenderer(
        dataclasses.replace(cfg, accel_mode="rays")
    )
    pipe._autoselect_capacity(rays, ray_batch_size=N)
    assert pipe.accel is None


def test_autoselect_chunk_from_point_budget():
    """Under pruning, _autoselect_capacity grows the device ray chunk within
    the live-point budget (proposal mode's cheap evals/ray afford the
    measured-fastest large chunk, scripts/study_chunk.py); costlier modes are
    bounded by the budget, and a small -R hint caps the candidates."""
    from pixelnerf_tpu.parallel.pipeline import RenderPipeline
    from pixelnerf_tpu.render.renderer import NeRFRenderer

    R = 8
    occ = np.zeros((R, R, R), np.float32)
    occ[:, :, :4] = 1.0  # z < 0.5 occupied
    grid = OccupancyGrid(
        occ=jnp.asarray(occ.reshape(-1)),
        lo=jnp.zeros(3),
        inv_cell=jnp.full((3,), float(R)),
        resolution=R,
    )
    # 65536 rays marching +z over [0, 0.3], ~30% live, interleaved so every
    # window sees the same live fraction
    N = 65536
    origins = np.zeros((N, 3), np.float32)
    origins[:, 2] = np.where(np.arange(N) % 10 < 3, 0.1, 0.6)
    dirs = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (N, 1))
    rays = np.concatenate(
        [origins, dirs, np.zeros((N, 1), np.float32),
         np.full((N, 1), 0.3, np.float32)], axis=1,
    )

    def make(mode):
        cfg = RenderConfig(
            n_coarse=8, n_fine=4, n_fine_depth=2, white_bkgd=True,
            accel_mode=mode, accel_proposal_samples=5,
        )
        pipe = RenderPipeline.__new__(RenderPipeline)  # no model needed
        pipe.device_chunk = 8192
        pipe.accel = grid
        pipe.accel_chunk = None
        pipe.renderer = NeRFRenderer(cfg)
        return pipe

    # proposal: 7 evals/live-ray x cap 0.375 fits the default budget even at
    # the max chunk
    pipe = make("proposal")
    pipe._autoselect_capacity(rays)
    assert pipe.accel is not None
    assert pipe.accel_chunk == RenderPipeline.accel_chunk_max

    # rays mode at a tight budget: 20 evals/ray (8 coarse + the 12-sample
    # union) x 0.375 x 65536 = 492k and 32768 -> 246k both exceed 200k;
    # 16384 -> 123k fits
    pipe = make("rays")
    pipe.point_budget = 200_000
    pipe._autoselect_capacity(rays)
    assert pipe.accel_chunk == 16384

    # a -R hint below device_chunk caps the candidates entirely
    pipe = make("proposal")
    pipe._autoselect_capacity(rays, ray_batch_size=4096)
    assert pipe.accel_chunk is None


@pytest.mark.slow
def test_eval_accel_metric_delta_vs_dense():
    """eval --accel quality at the METRICS level (VERDICT r2 next #6): on a
    gate-passing scene, the PSNR/SSIM an accel'd eval reports against GT must
    match the dense eval's to <= 0.1 dB / 1e-3 SSIM — the bound that makes
    --accel safe for full-split metric runs (the reference's "full SRN eval
    takes many days" pain point, /root/reference/README.md:162).

    GT must sit at a REALISTIC distance from the render: real evals score a
    trained model ~20-30 dB from ground truth, while the accel perturbation
    is ~40 dB down — the metric delta is what the 40 dB perturbation does to
    a ~20 dB measurement.  (Scoring against a converged render of the SAME
    field inverts that regime — model error ~52 dB < perturbation — and the
    delta balloons to the full perturbation, which no real eval would see.)
    GT here is a converged render of a slightly different sphere (radius and
    color offset, ~20 dB of "model error"); dense and proposal-accel renders
    are scored against it with the SAME psnr/ssim calc_metrics uses
    (utils.metrics, calc_metrics.py map step)."""
    from pixelnerf_tpu.utils import metrics as M

    from pixelnerf_tpu.data.synthetic import _camera_ring
    from pixelnerf_tpu.utils import geometry

    # two coherent VIEWS (ssim is local-window statistics — it needs real
    # images, not scattered rays reshaped into one)
    H = W = 24
    poses = _camera_ring(2, seed=9)
    rays = np.asarray(
        geometry.gen_rays_np(poses, W, H, 0.85 * W, 0.8, 2.0)
    ).reshape(-1, 8)
    grid = build_sphere_grid(rays, resolution=48)

    def gt_field(points, viewdirs, coarse):
        r2 = jnp.sum(points * points, axis=-1)
        inside = (r2 < 0.37 * 0.37).astype(points.dtype)
        rgb = 0.5 + 0.5 * jnp.tanh(points + 0.15)
        sigma = SIGMA_IN * inside
        return jnp.concatenate(
            [jnp.transpose(rgb, (0, 2, 1)), sigma[:, None, :]], axis=1
        )

    gt_cfg = RenderConfig(
        n_coarse=128, n_fine=32, n_fine_depth=16, white_bkgd=True
    )
    cfg = RenderConfig(n_coarse=32, n_fine=8, n_fine_depth=4, white_bkgd=True)
    prop = RenderConfig(
        n_coarse=32, n_fine=8, n_fine_depth=4, white_bkgd=True,
        accel_mode="proposal",
    )

    gt = np.asarray(
        jax.jit(
            lambda r, k: render_rays(
                gt_field, r, k, gt_cfg, use_viewdirs=False
            )
        )(jnp.asarray(rays[None]), jax.random.PRNGKey(3))["fine"]["rgb"]
    ).reshape(2, H, W, 3)
    dense = _render(rays, cfg)["fine"]["rgb"].reshape(2, H, W, 3)
    accel = _render(rays, prop, accel=grid)["fine"]["rgb"].reshape(2, H, W, 3)

    # the scene must actually PASS the self-gate (>= 30 dB accel vs dense) —
    # otherwise the CLI ladder would have stepped down and the comparison
    # below would be vacuous
    gate = -10.0 * np.log10(
        max(float(np.mean((accel - dense) ** 2)), 1e-12)
    )
    assert gate >= 30.0, gate

    d_psnr = np.mean([M.psnr(dense[i], gt[i]) for i in range(2)])
    a_psnr = np.mean([M.psnr(accel[i], gt[i]) for i in range(2)])
    d_ssim = np.mean([M.ssim(dense[i], gt[i], data_range=1.0) for i in range(2)])
    a_ssim = np.mean([M.ssim(accel[i], gt[i], data_range=1.0) for i in range(2)])
    assert abs(d_psnr - a_psnr) <= 0.1, (d_psnr, a_psnr)
    assert abs(d_ssim - a_ssim) <= 1e-3, (d_ssim, a_ssim)


class _FakeGateRenders:
    """render_simple stand-in: returns preset frames in call order."""

    def __init__(self, frames):
        self.frames = list(frames)
        self.calls = 0

    def __call__(self, *a, **k):
        self.calls += 1
        return self.frames.pop(0), None


def _gate_pipeline():
    """A RenderPipeline shell sufficient for gate_accel_mode: real renderer
    config dataclass, dummy grid, capacity re-selection stubbed out."""
    from pixelnerf_tpu.parallel import RenderPipeline
    from pixelnerf_tpu.render.renderer import NeRFRenderer

    renderer = NeRFRenderer(
        RenderConfig(
            n_coarse=8, n_fine=4, accel_mode="proposal",
            accel_proposal_samples=16,
        )
    )
    pipe = RenderPipeline.__new__(RenderPipeline)
    pipe.renderer = renderer
    pipe.accel = object()
    pipe.accel_chunk = None
    pipe._autoselect_capacity = lambda *a, **k: None
    return pipe


def test_gate_ladder_passes_at_default_point():
    pipe = _gate_pipeline()
    ref = np.zeros((16, 3), np.float32)
    pipe.render_simple = _FakeGateRenders([ref.copy()])
    label, psnrs = pipe.gate_accel_mode(None, None, None, None, ref)
    assert label == "proposal" and pipe.accel is not None
    assert psnrs["proposal"] > 30.0
    assert pipe.renderer.base_cfg.accel_proposal_samples == 16


def test_gate_ladder_rescues_with_denser_proposal():
    """A sharp field that misses the lean draw count must settle on the +8
    rung (the sn64_multiscale case: 28.6 dB at 16 draws, 30.9 at 24) and the
    settled config must KEEP the larger draw count for subsequent renders."""
    pipe = _gate_pipeline()
    ref = np.zeros((16, 3), np.float32)
    bad = np.full((16, 3), 0.25, np.float32)  # ~12 dB vs ref
    pipe.render_simple = _FakeGateRenders([bad, ref.copy()])
    label, psnrs = pipe.gate_accel_mode(None, None, None, None, ref)
    assert label == "proposal+8"
    assert pipe.accel is not None
    assert pipe.renderer.base_cfg.accel_proposal_samples == 24
    assert pipe.renderer.base_cfg.accel_mode == "proposal"
    assert set(psnrs) == {"proposal", "proposal+8"}

    # a LATER gate (per-object eval loop) must restart from the pristine
    # count — +8 rungs must not compound across objects
    pipe.accel = object()
    pipe.render_simple = _FakeGateRenders([ref.copy()])
    label2, _ = pipe.gate_accel_mode(None, None, None, None, ref)
    assert label2 == "proposal"
    assert pipe.renderer.base_cfg.accel_proposal_samples == 16


def test_gate_ladder_rescues_at_plus16():
    """A field that misses the gate at both the lean count and +8 but agrees
    at +16 settles on proposal+16 (32 draws) instead of falling to the ray
    compaction floor."""
    pipe = _gate_pipeline()
    ref = np.zeros((16, 3), np.float32)
    bad = np.full((16, 3), 0.25, np.float32)
    pipe.render_simple = _FakeGateRenders([bad, bad, ref.copy()])
    label, psnrs = pipe.gate_accel_mode(None, None, None, None, ref)
    assert label == "proposal+16"
    assert pipe.accel is not None
    assert pipe.renderer.base_cfg.accel_proposal_samples == 32
    assert pipe.renderer.base_cfg.accel_mode == "proposal"
    assert set(psnrs) == {"proposal", "proposal+8", "proposal+16"}


def test_gate_ladder_steps_down_to_rays_then_dense():
    pipe = _gate_pipeline()
    ref = np.zeros((16, 3), np.float32)
    bad = np.full((16, 3), 0.25, np.float32)
    # proposal, proposal+8, proposal+16, rays all disagree -> dense,
    # config restored
    pipe.render_simple = _FakeGateRenders([bad, bad, bad, bad])
    label, psnrs = pipe.gate_accel_mode(None, None, None, None, ref)
    assert label == "dense"
    assert pipe.accel is None and pipe.accel_chunk is None
    assert pipe.renderer.base_cfg.accel_proposal_samples == 16
    assert pipe.renderer.base_cfg.accel_mode == "proposal"
    assert set(psnrs) == {"proposal", "proposal+8", "proposal+16", "rays"}

    # rays rung passing keeps compaction
    pipe2 = _gate_pipeline()
    pipe2.render_simple = _FakeGateRenders([bad, bad, bad, ref.copy()])
    label2, _ = pipe2.gate_accel_mode(None, None, None, None, ref)
    assert label2 == "rays"
    assert pipe2.accel is not None
    assert pipe2.renderer.base_cfg.accel_mode == "rays"
