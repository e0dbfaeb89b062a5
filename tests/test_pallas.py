"""Parity tests for the fused Pallas ResnetFC kernel (interpret mode on CPU)
against the XLA implementation run at bf16-equivalent precision."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelnerf_tpu.models.resnetfc import ResnetFC
from pixelnerf_tpu.ops import resnetfc_pallas as rp


def _make(d_in, d_latent, d_hidden, n_blocks, combine_layer, seed=0):
    model = ResnetFC(
        d_out=4,
        n_blocks=n_blocks,
        d_latent=d_latent,
        d_hidden=d_hidden,
        combine_layer=combine_layer,
    )
    zx0 = jnp.zeros((4, d_latent + d_in))
    params = model.init(jax.random.PRNGKey(seed), zx0)["params"]
    # randomize fc_1 (zero-init) so the test isn't trivially identity
    def bump(p, path=()):
        if isinstance(p, dict):
            return {k: bump(v, path + (k,)) for k, v in p.items()}
        if "fc_1" in path and path[-1] == "kernel":
            key = jax.random.PRNGKey(sum(map(len, path)) * 7919 + 13)
            return 0.05 * jax.random.normal(key, p.shape)
        return p

    return model, bump(params)


@pytest.mark.parametrize(
    "NS,B,combine_layer",
    [(1, 300, 3), (2, 257, 3), (3, 128, 2), (1, 100, 1000)],
)
@pytest.mark.slow
def test_pallas_matches_xla(NS, B, combine_layer):
    d_in, d_latent, d_hidden, n_blocks = 42, 512, 512, 5
    if combine_layer >= n_blocks and NS > 1:
        pytest.skip("unsupported envelope")
    model, params = _make(d_in, d_latent, d_hidden, n_blocks, combine_layer)
    rng = np.random.default_rng(0)
    zx = rng.normal(size=(NS * B, d_latent + d_in)).astype(np.float32)

    ref = model.apply({"params": params}, jnp.asarray(zx), combine_inner_dims=(NS, B))
    out = rp.resnetfc_pallas(
        params,
        jnp.asarray(zx),
        NS=NS,
        d_latent=d_latent,
        d_in=d_in,
        n_blocks=n_blocks,
        combine_layer=combine_layer,
        block_points=128,
        interpret=True,
    )
    ref = np.asarray(ref).reshape(1, B, 4)
    out = np.asarray(out)
    assert out.shape == (1, B, 4)
    # kernel computes in bf16 with f32 accumulation; bf16 error scales with the
    # activation magnitude -> tolerance relative to the global output scale
    tol = 0.015 * max(float(np.abs(ref).max()), 1.0)
    np.testing.assert_allclose(out, ref, atol=tol)
    cc = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert cc > 0.999


def test_pallas_no_latent():
    """d_latent=0 path (pure coordinate MLP)."""
    model, params = _make(39, 0, 128, 3, 1000)
    rng = np.random.default_rng(1)
    zx = rng.normal(size=(200, 39)).astype(np.float32)
    ref = np.asarray(
        model.apply({"params": params}, jnp.asarray(zx), combine_inner_dims=(1, 200))
    ).reshape(1, 200, 4)
    out = np.asarray(
        rp.resnetfc_pallas(
            params,
            jnp.asarray(zx),
            NS=1,
            d_latent=0,
            d_in=39,
            n_blocks=3,
            combine_layer=1000,
            block_points=128,
            interpret=True,
        )
    )
    tol = 0.015 * max(float(np.abs(ref).max()), 1.0)
    np.testing.assert_allclose(out, ref, atol=tol)


def test_resnetfc_pallas_impl_flag(monkeypatch):
    """ResnetFC(impl='pallas') must route through the kernel outside init and
    produce outputs close to the XLA path."""
    model_x = ResnetFC(d_out=4, n_blocks=3, d_latent=64, d_hidden=128, combine_layer=2)
    model_p = ResnetFC(
        d_out=4, n_blocks=3, d_latent=64, d_hidden=128, combine_layer=2, impl="pallas"
    )
    zx0 = jnp.zeros((6, 64 + 10))
    params = model_x.init(jax.random.PRNGKey(0), zx0)["params"]
    rng = np.random.default_rng(2)
    zx = jnp.asarray(rng.normal(size=(2 * 50, 74)).astype(np.float32))

    # route pallas through interpret mode on CPU
    monkeypatch.setenv("PIXELNERF_PALLAS_INTERPRET", "1")
    out_p = model_p.apply({"params": params}, zx, combine_inner_dims=(2, 50))
    out_x = model_x.apply({"params": params}, zx, combine_inner_dims=(2, 50))
    ref = np.asarray(out_x)
    tol = 0.015 * max(float(np.abs(ref).max()), 1.0)
    np.testing.assert_allclose(np.asarray(out_p), ref, atol=tol)
    assert rp.supports(0.0, False, "average")
    assert not rp.supports(100.0, False, "average")
    assert not rp.supports(0.0, True, "average")
    assert not rp.supports(0.0, False, "max")


def test_bilinear_taps_match_grid_sample():
    from pixelnerf_tpu.ops.grid_sample import bilinear_taps, grid_sample

    rng = np.random.default_rng(11)
    H, W, C, N = 9, 7, 5, 200
    feat = jnp.asarray(rng.normal(size=(1, H, W, C)).astype(np.float32))
    uv = jnp.asarray(rng.uniform(-1.3, 1.3, size=(1, N, 2)).astype(np.float32))
    for mode in ("border", "zeros"):
        ref = np.asarray(grid_sample(feat, uv, padding_mode=mode))
        idx, w = bilinear_taps(uv, H, W, padding_mode=mode)
        flat = np.asarray(feat).reshape(H * W, C)
        got = np.einsum("bnj,bnjc->bnc", np.asarray(w), flat[np.asarray(idx)])
        np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.slow
def test_pallas_fused_gather_matches_dense():
    """LatentGather path (interpret mode) == dense-latent path == XLA."""
    from pixelnerf_tpu.ops.grid_sample import bilinear_taps

    d_in, d_latent, d_hidden, n_blocks = 10, 64, 128, 3
    model, params = _make(d_in, d_latent, d_hidden, n_blocks, combine_layer=2)
    rng = np.random.default_rng(3)
    B, T = 150, 48
    table = jnp.asarray(rng.normal(size=(T, d_latent)).astype(np.float32))
    uv = jnp.asarray(rng.uniform(-1.1, 1.1, size=(1, B, 2)).astype(np.float32))
    idx, w = bilinear_taps(uv, 6, 8)
    x_part = jnp.asarray(rng.normal(size=(B, d_in)).astype(np.float32))

    g = rp.LatentGather(table, idx[0], w[0])
    z_dense = rp.materialize_gather(g)

    ref = model.apply(
        {"params": params},
        jnp.concatenate([z_dense, x_part], axis=-1),
        combine_inner_dims=(1, B),
    )
    for planar in (False, True):
        out = rp.resnetfc_pallas(
            params,
            (g, x_part),
            NS=1,
            d_latent=d_latent,
            d_in=d_in,
            n_blocks=n_blocks,
            combine_layer=2,
            interpret=True,
            planar_out=planar,
        )
        got = np.asarray(out[0]).T if planar else np.asarray(out[0])
        refn = np.asarray(ref[0] if ref.ndim == 3 else ref)
        tol = 0.02 * max(float(np.abs(refn).max()), 1.0)
        np.testing.assert_allclose(got, refn, atol=tol)


@pytest.mark.slow
def test_query_fused_gather_matches_dense_query():
    """PixelNeRFNet.query with the fused-gather path (pallas, interpret) equals
    the XLA dense path within bf16 tolerance."""
    import pixelnerf_tpu.ops.resnetfc_pallas as rpmod
    from pixelnerf_tpu.config import hocon
    from pixelnerf_tpu.models import PixelNeRFNet, make_model

    conf = hocon.parse_file("conf/exp/sn64.conf")
    net_x = make_model(conf["model"])
    net_p = make_model(conf["model"], mlp_impl="pallas")
    rng = np.random.default_rng(5)
    images = jnp.asarray(rng.uniform(-1, 1, size=(1, 1, 32, 32, 3)).astype(np.float32))
    poses = np.eye(4, dtype=np.float32)[None, None]
    poses[0, 0, 2, 3] = 1.3
    poses = jnp.asarray(poses)
    focal = jnp.asarray(np.float32(30.0))
    xyz = jnp.asarray(rng.normal(size=(1, 64, 3)).astype(np.float32) * 0.3)
    vd = jnp.asarray(rng.normal(size=(1, 64, 3)).astype(np.float32))

    variables = jax.jit(net_x.init)(jax.random.PRNGKey(0), images, poses, focal, xyz, vd)
    scene = net_x.apply(variables, images, poses, focal, method=PixelNeRFNet.encode)
    ref = net_x.apply(
        variables, scene, xyz, viewdirs=vd, method=PixelNeRFNet.query
    )

    assert net_p.apply(
        variables, jnp.asarray(scene.latents), 1,
        method=PixelNeRFNet._fused_gather_ok,
    )

    orig = rpmod.resnetfc_pallas
    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)
    rpmod.resnetfc_pallas = interp
    try:
        for planar in (False, True):
            out = net_p.apply(
                variables, scene, xyz, viewdirs=vd, planar_out=planar,
                method=PixelNeRFNet.query,
            )
            got = np.swapaxes(np.asarray(out), 1, 2) if planar else np.asarray(out)
            np.testing.assert_allclose(got, np.asarray(ref), atol=0.02)
    finally:
        rpmod.resnetfc_pallas = orig


@pytest.mark.slow
def test_pallas_mv_fused_gather_matches_dense():
    """Multi-view LatentGather (point-major kernel, interpret) == dense XLA."""
    from pixelnerf_tpu.ops.grid_sample import bilinear_taps

    d_in, d_latent, d_hidden, n_blocks = 10, 64, 128, 3
    NS, B, T = 3, 96, 48
    model, params = _make(d_in, d_latent, d_hidden, n_blocks, combine_layer=2)
    rng = np.random.default_rng(7)
    tables = jnp.asarray(rng.normal(size=(NS, T, d_latent)).astype(np.float32))
    uv = jnp.asarray(rng.uniform(-1.1, 1.1, size=(NS, B, 2)).astype(np.float32))
    idx, w = bilinear_taps(uv, 6, 8)  # (NS, B, 4)
    x_part = jnp.asarray(rng.normal(size=(NS * B, d_in)).astype(np.float32))

    g = rp.LatentGather(tables, idx.reshape(NS * B, 4), w.reshape(NS * B, 4))
    z_dense = rp.materialize_gather(g)  # (NS*B, C)

    ref = model.apply(
        {"params": params},
        jnp.concatenate([z_dense, x_part], axis=-1),
        combine_inner_dims=(NS, B),
    )
    for planar in (False, True):
        out = rp.resnetfc_pallas(
            params,
            (g, x_part),
            NS=NS,
            d_latent=d_latent,
            d_in=d_in,
            n_blocks=n_blocks,
            combine_layer=2,
            interpret=True,
            planar_out=planar,
        )
        got = np.asarray(out[0]).T if planar else np.asarray(out[0])
        refn = np.asarray(ref[0] if ref.ndim == 3 else ref)
        tol = 0.02 * max(float(np.abs(refn).max()), 1.0)
        np.testing.assert_allclose(got, refn, atol=tol)


@pytest.mark.slow
@pytest.mark.parametrize("NS,gather", [(1, False), (2, False), (1, True), (2, True)])
def test_pallas_raw_code_matches_encoded(NS, gather):
    """RawCode (in-kernel positional code) == pre-encoded input, for the dense
    and fused-gather kernels, single- and multi-view."""
    from pixelnerf_tpu.models.code import PositionalEncoding

    pe = PositionalEncoding(num_freqs=6, d_in=3, include_input=True)
    tail = 3  # raw viewdirs appended after the code block
    d_in = pe.d_out + tail
    d_latent, d_hidden, n_blocks, B, T = 64, 128, 3, 160, 48
    model, params = _make(d_in, d_latent, d_hidden, n_blocks, combine_layer=2)
    rng = np.random.default_rng(11)

    W, f, p, m = pe.flat_arrays(tail=tail)
    raw = jnp.asarray(rng.normal(size=(NS * B, 3 + tail)).astype(np.float32))
    rc = rp.RawCode(
        raw, jnp.asarray(W), jnp.asarray(f), jnp.asarray(p), jnp.asarray(m)
    )
    encoded = rp.materialize_code(rc)
    # materialization layout check: [code(x), viewdirs]
    np.testing.assert_allclose(
        np.asarray(encoded),
        np.concatenate(
            [np.asarray(pe(raw[:, :3])), np.asarray(raw[:, 3:])], axis=-1
        ),
        atol=1e-5,
    )

    if gather:
        idx = jnp.asarray(rng.integers(0, T, size=(NS * B, 4)).astype(np.int32))
        w4 = jnp.asarray(rng.random(size=(NS * B, 4)).astype(np.float32))
        tables = jnp.asarray(
            rng.normal(size=(T, d_latent)).astype(np.float32)
            if NS == 1
            else rng.normal(size=(NS, T, d_latent)).astype(np.float32)
        )
        z_arg = rp.LatentGather(tables, idx, w4)
        z_dense = rp.materialize_gather(z_arg)
    else:
        z_arg = z_dense = jnp.asarray(
            rng.normal(size=(NS * B, d_latent)).astype(np.float32)
        )

    kwargs = dict(
        NS=NS,
        d_latent=d_latent,
        d_in=d_in,
        n_blocks=n_blocks,
        combine_layer=2,
        interpret=True,
    )
    ref = rp.resnetfc_pallas(params, (z_dense, encoded), **kwargs)
    out = rp.resnetfc_pallas(params, (z_arg, rc), **kwargs)
    tol = 1e-4 * max(float(np.abs(np.asarray(ref)).max()), 1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=tol)

    # the XLA module path also accepts RawCode (materializes it)
    ref_xla = model.apply(
        {"params": params},
        (z_dense, encoded),
        combine_inner_dims=(NS, B),
    )
    out_xla = model.apply(
        {"params": params}, (z_dense, rc), combine_inner_dims=(NS, B)
    )
    np.testing.assert_allclose(
        np.asarray(out_xla), np.asarray(ref_xla), atol=1e-5
    )
