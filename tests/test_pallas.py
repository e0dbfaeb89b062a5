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


def test_resnetfc_pallas_impl_flag():
    """ResnetFC(impl='pallas') must route through the kernel outside init and
    produce outputs close to the XLA path."""
    import pixelnerf_tpu.ops.resnetfc_pallas as rpmod

    model_x = ResnetFC(d_out=4, n_blocks=3, d_latent=64, d_hidden=128, combine_layer=2)
    model_p = ResnetFC(
        d_out=4, n_blocks=3, d_latent=64, d_hidden=128, combine_layer=2, impl="pallas"
    )
    zx0 = jnp.zeros((6, 64 + 10))
    params = model_x.init(jax.random.PRNGKey(0), zx0)["params"]
    rng = np.random.default_rng(2)
    zx = jnp.asarray(rng.normal(size=(2 * 50, 74)).astype(np.float32))

    # route pallas through interpret mode on CPU
    orig = rpmod.resnetfc_pallas
    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)
    rpmod.resnetfc_pallas = interp
    try:
        out_p = model_p.apply({"params": params}, zx, combine_inner_dims=(2, 50))
    finally:
        rpmod.resnetfc_pallas = orig
    out_x = model_x.apply({"params": params}, zx, combine_inner_dims=(2, 50))
    ref = np.asarray(out_x)
    tol = 0.015 * max(float(np.abs(ref).max()), 1.0)
    np.testing.assert_allclose(np.asarray(out_p), ref, atol=tol)
    assert rp.supports(0.0, False, "average")
    assert not rp.supports(100.0, False, "average")
    assert not rp.supports(0.0, True, "average")
    assert not rp.supports(0.0, False, "max")
