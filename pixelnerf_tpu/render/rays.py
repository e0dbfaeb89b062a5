"""Ray samplers: stratified coarse, inverse-CDF importance, depth-centered.

Functional ports of NeRFRenderer.sample_* (reference nerf.py:98-161) with explicit
PRNG threading.  Rays are (B, 8) = [origin(3), direction(3), near(1), far(1)].
All shapes static; everything jits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def sample_coarse(
    rays: Array, n_coarse: int, rng: Array, lindisp: bool = False
) -> Array:
    """Stratified sampling (nerf.py:98-118): one uniform jitter inside each of
    ``n_coarse`` equal bins of [near, far] (or [1/near, 1/far] if lindisp).

    :return: (B, Kc) z values
    """
    B = rays.shape[0]
    near, far = rays[:, -2:-1], rays[:, -1:]
    step = 1.0 / n_coarse
    z_steps = jnp.linspace(0.0, 1.0 - step, n_coarse, dtype=jnp.float32)[None]
    z_steps = z_steps + jax.random.uniform(rng, (B, n_coarse)) * step
    if not lindisp:
        return near * (1.0 - z_steps) + far * z_steps
    return 1.0 / (1.0 / near * (1.0 - z_steps) + 1.0 / far * z_steps)


def sample_fine(
    rays: Array,
    weights: Array,
    n_fine: int,
    n_coarse: int,
    rng: Array,
    lindisp: bool = False,
    stratified: bool = False,
) -> Array:
    """Importance sampling by inverting the coarse weight CDF (nerf.py:120-148).

    :param weights: (B, Kc) coarse compositing weights (gradient is stopped here)
    :param stratified: draw u from one jittered point per 1/n_fine quantile
        instead of iid uniforms — low-discrepancy inverse-CDF sampling that
        covers the pdf's support strictly more evenly at the same count.
        Used by the grid-proposal render path (renderer accel_mode docs);
        the reference's importance sampler is iid (nerf.py:133), so the
        default stays iid for parity.
    :return: (B, n_fine) z values
    """
    B = rays.shape[0]
    weights = jax.lax.stop_gradient(weights) + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # (B, Kc+1)

    rng_u, rng_jitter = jax.random.split(rng)
    if stratified:
        u = (
            jnp.arange(n_fine, dtype=jnp.float32)[None]
            + jax.random.uniform(rng_u, (B, n_fine), dtype=jnp.float32)
        ) / n_fine
    else:
        u = jax.random.uniform(rng_u, (B, n_fine), dtype=jnp.float32)
    # searchsorted(side="right") - 1 == count of cdf bins strictly below u.
    # XLA lowers vmapped searchsorted to a sequential while-loop (~7.6 ms per
    # 8k-ray chunk on a v5e); the dense compare-and-sum is one fused VPU pass
    # over B x n_fine x Kc elements (~8M comparisons, <1 ms) and exactly
    # reproduces the index (cdf is monotone so "count <= u" == bisect_right).
    inds = jnp.sum(
        (cdf[:, None, 1:] <= u[:, :, None]).astype(jnp.float32), axis=-1
    )
    inds = jnp.maximum(inds, 0.0)

    z_steps = (inds + jax.random.uniform(rng_jitter, (B, n_fine))) / n_coarse

    near, far = rays[:, -2:-1], rays[:, -1:]
    if not lindisp:
        return near * (1.0 - z_steps) + far * z_steps
    return 1.0 / (1.0 / near * (1.0 - z_steps) + 1.0 / far * z_steps)


def sample_fine_depth(
    rays: Array, depth: Array, n_fine_depth: int, depth_std: float, rng: Array
) -> Array:
    """Gaussian samples around the expected depth, clamped to [near, far]
    (nerf.py:150-161).

    :param depth: (B,) expected depth from the coarse pass
    :return: (B, n_fine_depth)
    """
    B = rays.shape[0]
    z = jnp.broadcast_to(depth[:, None], (B, n_fine_depth))
    z = z + jax.random.normal(rng, (B, n_fine_depth)) * depth_std
    return jnp.clip(z, rays[:, -2:-1], rays[:, -1:])
