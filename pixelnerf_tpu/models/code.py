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
        # Flat formulation: one (d_in, d_out) channel-select matmul + fused
        # elementwise sin, instead of a (..., 2F, d_in) broadcast + reshape —
        # the 3D intermediate with a thin (d_in=3) minor dim needs an XLA
        # relayout before the reshape, while the matmul emits the interleaved
        # layout directly and the sin/select fuse into the consumer.  Layout
        # identical to the reference phase trick (code.py:21-28):
        # [x (if include_input), sin(f0 x), cos(f0 x), sin(f1 x), ...].
        import numpy as np

        d_in, F = self.d_in, self.num_freqs
        n_head = d_in if self.include_input else 0
        d_out = self.d_out
        sel = np.zeros((d_in, d_out), np.float32)
        fcol = np.zeros((d_out,), np.float32)
        pcol = np.zeros((d_out,), np.float32)
        if n_head:
            sel[:, :d_in] = np.eye(d_in, dtype=np.float32)
        for k in range(2 * F):
            f = self.freq_factor * 2.0 ** (k // 2)
            p = 0.0 if k % 2 == 0 else 0.5 * math.pi
            c0 = n_head + k * d_in
            sel[:, c0 : c0 + d_in] = np.eye(d_in, dtype=np.float32)
            fcol[c0 : c0 + d_in] = f
            pcol[c0 : c0 + d_in] = p
        xg = jnp.einsum(
            "...i,io->...o", x, jnp.asarray(sel), precision="highest"
        )
        enc = jnp.sin(xg * jnp.asarray(fcol) + jnp.asarray(pcol))
        if n_head:
            head = jnp.zeros((d_out,), np.float32).at[:d_in].set(1.0)
            enc = jnp.where(head > 0, xg, enc)
        return enc

    @classmethod
    def from_conf(cls, conf, d_in: int = 3) -> "PositionalEncoding":
        # conf subtree `code` (reference code.py:48-56)
        return cls(
            num_freqs=conf.get_int("num_freqs", 6),
            d_in=d_in,
            freq_factor=conf.get_float("freq_factor", math.pi),
            include_input=conf.get_bool("include_input", True),
        )
