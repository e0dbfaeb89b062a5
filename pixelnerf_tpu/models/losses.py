"""Training criteria — functional ports of reference loss.py.

``get_rgb_loss`` (loss.py:91-103) selects L1/L2 with optional Kendall-'17
uncertainty weighting for the fine head; ``alpha_loss`` is the Neural Volumes
alpha prior (loss.py:4-37), epoch-gated by the caller.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax.numpy as jnp

Array = jnp.ndarray


def l1_loss(pred: Array, target: Array) -> Array:
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred: Array, target: Array) -> Array:
    return jnp.mean((pred - target) ** 2)


def rgb_with_uncertainty(
    pred: Array, target: Array, betas: Array, use_l1: bool = False
) -> Array:
    """Kendall '17 beta-weighted loss (loss.py:51-68)."""
    if use_l1:
        elem = jnp.mean(jnp.abs(pred - target), axis=-1)
    else:
        elem = jnp.mean((pred - target) ** 2, axis=-1)
    return jnp.mean(elem / betas) + jnp.mean(jnp.log(betas))


def rgb_with_background(
    pred: Array, target: Array, lambda_bg: Array, use_l1: bool = False
) -> Array:
    """Background-weighted variant (loss.py:71-88)."""
    if use_l1:
        elem = jnp.mean(jnp.abs(pred - target), axis=-1)
    else:
        elem = jnp.mean((pred - target) ** 2, axis=-1)
    return jnp.mean(elem / (1.0 + lambda_bg)) + jnp.mean(jnp.log(lambda_bg))


def get_rgb_loss(conf, coarse: bool = True) -> Callable[[Array, Array], Array]:
    """Select the rgb criterion from the loss conf subtree (loss.py:91-103).
    Accepts both the upstream ``use_l1`` flag and the fork's ``type = l1|l2``."""
    loss_type = conf.get_string("type", None)
    if loss_type is not None:
        use_l1 = loss_type == "l1"
    else:
        use_l1 = conf.get_bool("use_l1", False)
    if conf.get_bool("use_uncertainty", False) and not coarse:
        return lambda pred, target, betas: rgb_with_uncertainty(
            pred, target, betas, use_l1=use_l1
        )
    return l1_loss if use_l1 else l2_loss


@dataclasses.dataclass
class AlphaLossNV2:
    """Neural Volumes alpha prior (loss.py:4-37); ``epoch`` advanced by the
    trainer via sched_step."""

    lambda_alpha: float
    clamp_alpha: float
    init_epoch: int
    force_opaque: bool = False
    epoch: int = 0

    def sched_step(self, num: int = 1) -> None:
        self.epoch += num

    def __call__(self, alpha_fine: Array) -> Array:
        if self.lambda_alpha <= 0.0 or self.epoch < self.init_epoch:
            return jnp.zeros(())
        a = jnp.clip(alpha_fine, 0.01, 0.99)
        if self.force_opaque:
            # BCE against all-ones target
            loss = -jnp.log(a)
            return self.lambda_alpha * jnp.mean(loss)
        loss = jnp.log(a) + jnp.log(1.0 - a)
        loss = jnp.maximum(loss, -self.clamp_alpha)
        return self.lambda_alpha * jnp.mean(loss)


def get_alpha_loss(conf) -> AlphaLossNV2:
    return AlphaLossNV2(
        lambda_alpha=conf.get_float("lambda_alpha"),
        clamp_alpha=conf.get_float("clamp_alpha"),
        init_epoch=conf.get_int("init_epoch"),
        force_opaque=conf.get_bool("force_opaque", False),
    )
