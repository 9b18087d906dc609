"""Positional (Fourier-feature) encoding.

Semantics match the reference embedder (run_nerf_helpers.py:15-63):
output channel order is ``[identity, sin(x*f0), cos(x*f0), sin(x*f1),
cos(x*f1), ...]`` — frequency-major, function-minor, each block ``d`` wide —
with log-spaced frequencies ``2^0 .. 2^(num_freqs-1)`` (or linearly spaced
when ``log_sampling`` is False) and the raw input prepended when
``include_input``.

TPU notes: the encoding is a pure VPU op; in the fused Pallas path
(ops/fused_mlp.py) it is computed in VMEM per tile so the 63/27-wide
embeddings never touch HBM. This module is the jnp reference used for
evaluation paths, tests, and the unfused fallback.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PosEncConfig:
    """Static configuration of a positional encoder.

    ``multires`` is the reference's flag name (number of frequency octaves);
    ``multires=0`` with ``include_input`` yields the identity. The reference's
    ``i_embed == -1`` (identity embedding, run_nerf_helpers.py:49-50) maps to
    ``identity()`` below.
    """

    num_freqs: int
    include_input: bool = True
    log_sampling: bool = True
    input_dims: int = 3

    @property
    def out_dim(self) -> int:
        d = self.input_dims if self.include_input else 0
        return d + 2 * self.num_freqs * self.input_dims

    @classmethod
    def identity(cls, input_dims: int = 3) -> "PosEncConfig":
        return cls(num_freqs=0, include_input=True, input_dims=input_dims)


def freq_bands(cfg: PosEncConfig) -> jnp.ndarray:
    """Frequency multipliers, shape [num_freqs]."""
    if cfg.num_freqs == 0:
        return jnp.zeros((0,), dtype=jnp.float32)
    max_freq = cfg.num_freqs - 1
    if cfg.log_sampling:
        return 2.0 ** jnp.linspace(0.0, max_freq, cfg.num_freqs)
    return jnp.linspace(2.0**0.0, 2.0**max_freq, cfg.num_freqs)


def posenc(x: jnp.ndarray, cfg: PosEncConfig) -> jnp.ndarray:
    """Encode ``x[..., d] -> [..., out_dim]``.

    With the reference defaults this maps points 3->63 (10 octaves) and view
    directions 3->27 (4 octaves).
    """
    if cfg.num_freqs == 0:
        return x if cfg.include_input else x[..., :0]
    bands = freq_bands(cfg).astype(x.dtype)
    # [..., F, d] -> sin/cos stacked as [..., F, 2, d] -> flat [..., F*2*d]
    xb = x[..., None, :] * bands[:, None]
    enc = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=-2)
    enc = enc.reshape(*x.shape[:-1], 2 * cfg.num_freqs * cfg.input_dims)
    if cfg.include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc
