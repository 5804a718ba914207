"""Inverse Autoregressive Flow (MADE-masked), conditioned on a context
vector.

Capability parity with /root/reference/model/flow/flows.py:279-354 (IAF) and
the MADE building blocks in /root/reference/model/flow/layers.py — note the
reference's IAF is dead code and BROKEN (its MaskedLinear call at
flows.py:317 omits the required device argument, SURVEY.md section 2); this
is a working implementation of the intended design:

    per flow step k (with dimension-flip every other step):
        h   = masked_linear(z) + context          (autoregressive in z)
        h   = ELU(h)
        m   = masked_linear_strict(h)             (no diagonal passthrough)
        s   = masked_linear_strict(h)
        g   = sigmoid(s + forget_bias)
        z   = g * z + (1 - g) * m
        logdet += sum_i log g_i

The gate/mean are autoregressive (output dim i depends only on z_<i), so
the Jacobian is triangular with diagonal g — log|det| = sum log g.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cfnerf_tpu.utils.init import TorchDense, torch_uniform_init


def made_degrees(z_size: int, h_size: int) -> Tuple[np.ndarray, np.ndarray]:
    d_in = np.arange(1, z_size + 1)
    if z_size == 1:
        m_h = np.ones(h_size, dtype=int)
    else:
        m_h = (np.arange(h_size) % (z_size - 1)) + 1
    return d_in, m_h


def input_mask(z_size: int, h_size: int) -> np.ndarray:
    """(z_size, h_size): hidden j sees input i iff m_h[j] >= d_in[i]."""
    d_in, m_h = made_degrees(z_size, h_size)
    return (m_h[None, :] >= d_in[:, None]).astype(np.float32)


def output_mask(z_size: int, h_size: int) -> np.ndarray:
    """(h_size, z_size): output o sees hidden j iff d_out[o] > m_h[j]
    (strict — the 'diagonal_zeros' semantics: no self-dependence)."""
    d_out, m_h = made_degrees(z_size, h_size)
    return (d_out[None, :] > m_h[:, None]).astype(np.float32)


class MaskedDense(nn.Module):
    features: int
    mask: np.ndarray  # (in_features, features)

    @nn.compact
    def __call__(self, x):
        init = torch_uniform_init(x.shape[-1])
        kernel = self.param("kernel", init, (x.shape[-1], self.features))
        bias = self.param("bias", init, (self.features,))
        return x @ (kernel * jnp.asarray(self.mask)) + bias


class IAFStep(nn.Module):
    z_size: int
    h_size: int
    forget_bias: float = 1.0

    @nn.compact
    def __call__(self, z, context):
        """z: (B, K, Z); context: (B, H). Returns (z', log_det (B, K))."""
        h = MaskedDense(self.h_size, input_mask(self.z_size, self.h_size), name="z_feats")(z)
        h = h + context[:, None, :]
        h = jax.nn.elu(h)
        mean = MaskedDense(self.z_size, output_mask(self.z_size, self.h_size), name="mean")(h)
        s = MaskedDense(self.z_size, output_mask(self.z_size, self.h_size), name="std")(h)
        gate = jax.nn.sigmoid(s + self.forget_bias)
        z_new = gate * z + (1.0 - gate) * mean
        log_det = jnp.log(gate + 1e-12).sum(-1)  # (B, K)
        return z_new, log_det


class IAFNeRF(nn.Module):
    """n_flows IAF steps with dimension reversal every other step
    (reference flows.py:342-345), conditioned on the per-point h vector.
    Context is projected to h_size so any conditioning width works."""

    z_size: int
    n_flows: int
    h_size: int = 64

    @nn.compact
    def __call__(self, z0, context, compute_log_det: bool = True):
        ctx = TorchDense(self.h_size, name="ctx_proj")(context)
        z = z0
        ldj = jnp.zeros(z0.shape[:-1], dtype=z0.dtype)
        for k in range(self.n_flows):
            if k % 2 == 1:
                z = z[..., ::-1]
            z, ld = IAFStep(self.z_size, self.h_size, name=f"flow_{k}")(z, ctx)
            if k % 2 == 1:
                z = z[..., ::-1]
            ldj = ldj + ld
        if not compute_log_det:
            ldj = jnp.zeros_like(ldj)
        return z, ldj
