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

    def flat_arrays(self, tail: int = 0):
        """Numpy ``(W (d_in+tail, d_out+tail), f, p, m)`` such that the encoding
        of ``[x, t]`` (x the coded channels, t `tail` passthrough channels
        appended AFTER the code block, e.g. raw viewdirs) is

            xg = [x, t] @ W;  enc = where(m, sin(xg * f + p), xg)

        Output layout: ``[x (if include_input), sin(f0 x), cos(f0 x), ...,
        sin(f_{F-1} x), cos(f_{F-1} x), t]`` — the reference phase-trick layout
        (code.py:21-28) with the tail concatenated last (backup2:193-205).
        The fused Pallas field kernel evaluates this form in-register so the
        encoded features never round-trip through HBM."""
        import numpy as np

        d_in, F = self.d_in, self.num_freqs
        n_head = d_in if self.include_input else 0
        d_out = self.d_out + tail
        W = np.zeros((d_in + tail, d_out), np.float32)
        fcol = np.ones((d_out,), np.float32)
        pcol = np.zeros((d_out,), np.float32)
        mcol = np.zeros((d_out,), np.float32)
        if n_head:
            W[:d_in, :d_in] = np.eye(d_in, dtype=np.float32)
        for k in range(2 * F):
            f = self.freq_factor * 2.0 ** (k // 2)
            p = 0.0 if k % 2 == 0 else 0.5 * math.pi
            c0 = n_head + k * d_in
            W[:d_in, c0 : c0 + d_in] = np.eye(d_in, dtype=np.float32)
            fcol[c0 : c0 + d_in] = f
            pcol[c0 : c0 + d_in] = p
            mcol[c0 : c0 + d_in] = 1.0
        if tail:
            W[d_in:, self.d_out :] = np.eye(tail, dtype=np.float32)
        return W, fcol, pcol, mcol

    def _encode(self, x: Array) -> Array:
        if self.num_freqs == 0:
            return x if self.include_input else x[..., :0]
        # Flat formulation: one (d_in, d_out) channel-select matmul + fused
        # elementwise sin, instead of a (..., 2F, d_in) broadcast + reshape —
        # the 3D intermediate with a thin (d_in=3) minor dim needs an XLA
        # relayout before the reshape, while the matmul emits the interleaved
        # layout directly and the sin/select fuse into the consumer.
        import numpy as np

        W, fcol, pcol, mcol = self.flat_arrays()
        xg = jnp.einsum(
            "...i,io->...o", x, jnp.asarray(W), precision="highest"
        )
        enc = jnp.sin(xg * jnp.asarray(fcol) + jnp.asarray(pcol))
        if np.any(mcol == 0.0):
            enc = jnp.where(jnp.asarray(mcol) > 0, enc, xg)
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
