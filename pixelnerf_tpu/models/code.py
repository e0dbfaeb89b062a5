"""NeRF positional encoding — pure function + conf-driven spec.

Matches the reference PositionalEncoding (code.py:6-56) including the interleaved
sin/cos channel ordering produced by its phase trick, so converted torch ``lin_in``
weights stay aligned: output layout per point is
``[x (if include_input), sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...]``
where each sin/cos group spans all d_in input channels.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class PositionalEncoding:
    num_freqs: int = 6
    d_in: int = 3
    freq_factor: float = math.pi
    include_input: bool = True

    @property
    def d_out(self) -> int:
        d = self.num_freqs * 2 * self.d_in
        if self.include_input:
            d += self.d_in
        return d

    @staticmethod
    def _scoped(fn):
        import jax

        return jax.named_scope("positional_enc")(fn)

    def __call__(self, x: Array) -> Array:
        """:param x: (..., d_in) -> (..., d_out); traced under the
        "positional_enc" scope (reference code.py:40 cut point)"""
        return self._scoped(self._encode)(x)

    def _encode(self, x: Array) -> Array:
        if self.num_freqs == 0:
            return x if self.include_input else x[..., :0]
        freqs = self.freq_factor * (
            2.0 ** jnp.arange(self.num_freqs, dtype=jnp.float32)
        )
        # (2F,) interleave each frequency twice, phases 0 / pi/2 -> sin / cos
        freqs2 = jnp.repeat(freqs, 2)  # [f0, f0, f1, f1, ...]
        phases = jnp.tile(
            jnp.array([0.0, 0.5 * math.pi], dtype=jnp.float32), self.num_freqs
        )
        # x: (..., d_in) -> (..., 2F, d_in)
        embed = x[..., None, :] * freqs2[:, None] + phases[:, None]
        embed = jnp.sin(embed)
        embed = embed.reshape(x.shape[:-1] + (2 * self.num_freqs * self.d_in,))
        if self.include_input:
            embed = jnp.concatenate([x, embed], axis=-1)
        return embed

    @classmethod
    def from_conf(cls, conf, d_in: int = 3) -> "PositionalEncoding":
        # conf subtree `code` (reference code.py:48-56)
        return cls(
            num_freqs=conf.get_int("num_freqs", 6),
            d_in=d_in,
            freq_factor=conf.get_float("freq_factor", math.pi),
            include_input=conf.get_bool("include_input", True),
        )
