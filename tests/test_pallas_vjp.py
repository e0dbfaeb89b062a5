"""Gradient-parity tests for the differentiable fused ResnetFC kernel
(ops.resnetfc_vjp) against the XLA implementation, in interpret mode on CPU.

In interpret mode the kernel computes in f32 (ops.resnetfc_pallas._ct), so
value AND gradient parity with the f32 XLA path is tight (~1e-4 relative);
on real TPU the kernel runs bf16 with f32 accumulation and the train-step
numerics match the AMP XLA path instead (rtol ~1e-2, exercised by the
bench_train path on hardware).

The reference analog of what this certifies: autograd through
resnetfc.py:173-236 inside composite (reference nerf.py:163-249), the
dominant GPU consumer of train/train.py:375-412.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# whole-module: real torch training / Pallas-interpreter sweeps - the slow tier
pytestmark = pytest.mark.slow

from pixelnerf_tpu.models.resnetfc import ResnetFC
from pixelnerf_tpu.ops import resnetfc_pallas as rp
from pixelnerf_tpu.ops.resnetfc_vjp import resnetfc_pallas_diff


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

    # randomize fc_1 (zero-init) so gradients flow through every block
    def bump(p, path=()):
        if isinstance(p, dict):
            return {k: bump(v, path + (k,)) for k, v in p.items()}
        if "fc_1" in path and path[-1] == "kernel":
            key = jax.random.PRNGKey(sum(map(len, path)) * 7919 + 13)
            return 0.05 * jax.random.normal(key, p.shape)
        return p

    return model, bump(params)


def _xla_out(model, params, z, x, NS, B_obj):
    zx = x if z is None else jnp.concatenate([z, x], axis=-1)
    out = model.apply(
        {"params": params}, zx, combine_inner_dims=(NS, B_obj)
    )
    return out.reshape(1, -1, model.d_out)  # (1, SB*B_obj, d_out)


def _diff_out(params, z, x, *, model, NS, B_obj, sb, d_in, planar=False):
    out = resnetfc_pallas_diff(
        params,
        (z, x),
        NS=NS,
        d_latent=model.d_latent,
        d_in=d_in,
        n_blocks=model.n_blocks,
        combine_layer=model.combine_layer,
        d_out=model.d_out,
        sb=sb,
        block_points=128,
        bwd_block_points=128,
        interpret=True,
        planar_out=planar,
    )
    if planar:
        out = jnp.swapaxes(out, -1, -2)
    return out  # (1, SB*B_obj, d_out)


CASES = [
    # NS, sb, B_obj, d_in, d_latent, d_hidden, n_blocks, combine_layer
    (1, 1, 150, 42, 512, 512, 5, 3),
    (1, 1, 100, 39, 0, 128, 3, 1000),  # no latent, combine past the end
    (1, 2, 80, 42, 256, 128, 5, 3),  # superbatch, single view
    (2, 1, 96, 42, 256, 128, 5, 3),
    (3, 2, 48, 42, 128, 128, 5, 2),  # superbatch x multi-view
    (1, 1, 64, 42, 96, 64, 4, 4),  # combine_layer == n_blocks (NS=1)
]


@pytest.mark.parametrize("NS,sb,B_obj,d_in,d_latent,d_hidden,n_blocks,cl", CASES)
def test_diff_kernel_value_and_grads_match_xla(
    NS, sb, B_obj, d_in, d_latent, d_hidden, n_blocks, cl
):
    model, params = _make(d_in, d_latent, d_hidden, n_blocks, cl)
    rng = np.random.default_rng(0)
    rows = sb * NS * B_obj
    x = jnp.asarray(rng.normal(size=(rows, d_in)).astype(np.float32))
    z = (
        jnp.asarray(rng.normal(size=(rows, d_latent)).astype(np.float32))
        if d_latent > 0
        else None
    )
    cot = jnp.asarray(
        rng.normal(size=(1, sb * B_obj, 4)).astype(np.float32)
    )

    def loss_xla(params, z, x):
        return jnp.sum(_xla_out(model, params, z, x, NS, B_obj) * cot)

    def loss_diff(params, z, x):
        return jnp.sum(
            _diff_out(
                params, z, x, model=model, NS=NS, B_obj=B_obj, sb=sb, d_in=d_in
            )
            * cot
        )

    argnums = (0, 2) if z is None else (0, 1, 2)
    v_ref, g_ref = jax.value_and_grad(loss_xla, argnums=argnums)(params, z, x)
    v_ker, g_ker = jax.value_and_grad(loss_diff, argnums=argnums)(params, z, x)

    np.testing.assert_allclose(v_ker, v_ref, rtol=2e-4)
    flat_ref, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_ker, _ = jax.tree_util.tree_flatten_with_path(g_ker)
    assert len(flat_ref) == len(flat_ker)
    for (path_r, a), (path_k, b) in zip(flat_ref, flat_ker):
        assert path_r == path_k
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(
            b, a, atol=5e-4 * scale, err_msg=f"grad mismatch at {path_r}"
        )


def test_diff_kernel_planar_grads_match_flat():
    """planar_out transposes the primal; cotangents must route identically."""
    model, params = _make(42, 256, 128, 5, 3)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2 * 96, 42)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(2 * 96, 256)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(1, 96, 4)).astype(np.float32))

    def loss(planar):
        def f(params):
            return jnp.sum(
                _diff_out(
                    params, z, x, model=model, NS=2, B_obj=96, sb=1, d_in=42,
                    planar=planar,
                )
                * cot
            )

        return f

    v0, g0 = jax.value_and_grad(loss(False))(params)
    v1, g1 = jax.value_and_grad(loss(True))(params)
    np.testing.assert_allclose(v1, v0, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4,
                                   atol=1e-5)


def test_eval_kernel_superbatch_multiview_packing():
    """sb>1 x NS>1 point-major packing: views of object s must combine with
    object s's other views, not object 0's (regression for the (NS, SB*B)
    reshape, which interleaved objects across views)."""
    model, params = _make(42, 128, 128, 5, 2)
    rng = np.random.default_rng(2)
    NS, sb, B_obj = 3, 2, 40
    rows = sb * NS * B_obj
    zx = jnp.asarray(
        rng.normal(size=(rows, 128 + 42)).astype(np.float32)
    )
    ref = np.asarray(
        model.apply({"params": params}, zx, combine_inner_dims=(NS, B_obj))
    ).reshape(1, sb * B_obj, 4)
    out = np.asarray(
        rp.resnetfc_pallas(
            params,
            zx,
            NS=NS,
            d_latent=128,
            d_in=42,
            n_blocks=5,
            combine_layer=2,
            sb=sb,
            block_points=128,
            interpret=True,
        )
    )
    tol = 0.015 * max(float(np.abs(ref).max()), 1.0)
    np.testing.assert_allclose(out, ref, atol=tol)


def test_resnetfc_module_routes_dense_to_diff_kernel(monkeypatch):
    """ResnetFC(impl='pallas') on dense input is differentiable end to end
    (the custom_vjp entry), and matches the XLA gradient."""
    monkeypatch.setenv("PIXELNERF_PALLAS_INTERPRET", "1")
    model_x, params = _make(42, 128, 128, 5, 3)
    model_p = ResnetFC(
        d_out=4, n_blocks=5, d_latent=128, d_hidden=128, combine_layer=3,
        impl="pallas",
    )
    rng = np.random.default_rng(3)
    zx = jnp.asarray(rng.normal(size=(2 * 64, 128 + 42)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(64, 4)).astype(np.float32))

    def loss(model):
        def f(params, zx):
            out = model.apply(
                {"params": params}, zx, combine_inner_dims=(2, 64)
            )
            return jnp.sum(out.reshape(64, 4) * cot)

        return f

    v_ref, g_ref = jax.value_and_grad(loss(model_x), argnums=(0, 1))(params, zx)
    v_ker, g_ker = jax.value_and_grad(loss(model_p), argnums=(0, 1))(params, zx)
    np.testing.assert_allclose(v_ker, v_ref, rtol=2e-4)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_ker)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b, a, atol=5e-4 * scale)


def test_diff_kernel_under_remat():
    """jax.checkpoint over the custom_vjp call (the trainer's remat policy
    wraps the whole field): gradients unchanged."""
    model, params = _make(42, 128, 128, 5, 3)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(128, 42)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(128, 128)).astype(np.float32))

    def raw(params):
        out = _diff_out(
            params, z, x, model=model, NS=1, B_obj=128, sb=1, d_in=42
        )
        return jnp.sum(out**2)

    g0 = jax.grad(raw)(params)
    g1 = jax.grad(jax.checkpoint(raw))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5,
                                   atol=1e-7)
