"""Positional encoding (NeRF section 5.1).

Capability parity with the reference embedder
(/root/reference/run_nerf_helpers.py:21-69): gamma(x) concatenates the raw
input with [sin(x * f), cos(x * f)] for f in 2**linspace(0, multires-1,
multires) (log-sampled by default).  Output dim = d + d * 2 * multires
(63 for positions @ multires=10, 27 for view dirs @ multires=4).

TPU-native design: instead of a list of Python lambdas concatenated per
frequency, the encoding is one broadcastable outer product x[..., None] *
freqs followed by a single sin/cos — one fused XLA elementwise kernel, no
Python loop at trace time.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def positional_encoding(
    x: jnp.ndarray,
    num_freqs: int,
    *,
    include_input: bool = True,
    log_sampling: bool = True,
    max_freq_log2: float | None = None,
) -> jnp.ndarray:
    """gamma(x): [..., d] -> [..., d * (include_input + 2*num_freqs)].

    Feature ordering matches the reference (run_nerf_helpers.py:42-45):
    [x, sin(x*f0), cos(x*f0), sin(x*f1), cos(x*f1), ...] — i.e. grouped by
    frequency, sin before cos, with the per-frequency block spanning all d
    input dims contiguously.
    """
    if num_freqs == 0:
        return x if include_input else x[..., :0]
    if max_freq_log2 is None:
        max_freq_log2 = num_freqs - 1
    if log_sampling:
        freqs = 2.0 ** np.linspace(0.0, max_freq_log2, num_freqs)
    else:
        freqs = np.linspace(2.0 ** 0.0, 2.0 ** max_freq_log2, num_freqs)
    freqs = jnp.asarray(freqs, dtype=x.dtype)  # (F,)

    # (..., F, d): broadcast multiply, then one sin and one cos kernel.
    xf = x[..., None, :] * freqs[:, None]
    sin = jnp.sin(xf)
    cos = jnp.cos(xf)
    # Interleave to [sin(f0), cos(f0), sin(f1), cos(f1), ...] along the
    # frequency axis, then flatten (F*2, d) -> (F*2*d) keeping the
    # per-frequency d-blocks contiguous (reference ordering).
    enc = jnp.stack([sin, cos], axis=-2)  # (..., F, 2, d)
    enc = enc.reshape(*x.shape[:-1], -1)  # (..., F*2*d)
    if include_input:
        return jnp.concatenate([x, enc], axis=-1)
    return enc


@dataclasses.dataclass(frozen=True)
class Embedder:
    """Configured positional encoder; mirrors the reference Embedder's
    (run_nerf_helpers.py:21-51) flag surface as a frozen dataclass so it can
    be closed over by jit without retracing."""

    num_freqs: int
    input_dims: int = 3
    include_input: bool = True
    log_sampling: bool = True
    max_freq_log2: float | None = None

    @property
    def out_dim(self) -> int:
        d = self.input_dims
        out = d if self.include_input else 0
        return out + d * 2 * self.num_freqs

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return positional_encoding(
            x,
            self.num_freqs,
            include_input=self.include_input,
            log_sampling=self.log_sampling,
            max_freq_log2=self.max_freq_log2,
        )


def get_embedder(multires: int, i_embed: int = 0) -> Tuple[Embedder, int]:
    """Parity with run_nerf_helpers.py:54-69: i_embed == -1 -> identity."""
    if i_embed == -1:
        ident = Embedder(num_freqs=0, input_dims=3, include_input=True)
        return ident, 3
    emb = Embedder(num_freqs=multires, input_dims=3, max_freq_log2=multires - 1)
    return emb, emb.out_dim
