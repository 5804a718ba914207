"""Amortization networks: conditioning vector h -> per-point flow parameters.

Parity target: TriangularSylvesterNeRF, /root/reference/model/models.py:294-416.
Per flow step, linear nets map h to a strictly-upper-triangular matrix
(amor_d, shared between r1 and r2 as full_d and its transpose), two
tanh-bounded diagonals (amor_diag1/2 — the -1 < diag(r1)*diag(r2) condition
for invertibility), and a bias b.

TPU-native differences from the reference:
  * the reference's in-place diagonal writes (models.py:377-378) are replaced
    by mask-based construction (jit-safe, no scatter);
  * parameters are computed once per *point* and consumed with K as a
    broadcast axis — the reference tiles h to (B*K, h) first
    (models.py:255-256), materializing K copies in memory.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from cfnerf_tpu.utils.init import TorchDense


class AmortizedTriangularSylvester(nn.Module):
    """h (B, h_size) -> r1, r2 (B, Z, Z, F) upper-triangular with tanh
    diagonals, and b (B, Z, F)."""

    z_size: int
    n_flows: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        Z, F = self.z_size, self.n_flows
        dense = lambda feats, name: TorchDense(
            feats, name=name, param_dtype=self.param_dtype, dtype=jnp.float32,
        )

        B = h.shape[0]
        heads = (("amor_d", F * Z * Z), ("amor_diag1", F * Z),
                 ("amor_diag2", F * Z), ("amor_b", F * Z))
        if self.is_initializing():
            outs = {name: dense(feats, name)(h) for name, feats in heads}
        else:
            # fan-out fusion (utils.init.fanout_concat): one matmul for
            # the four heads sharing input h; math column-identical
            from cfnerf_tpu.utils.init import fanout_concat

            kcat, bcat = fanout_concat(
                self.variables["params"], [n for n, _ in heads]
            )
            y = jnp.dot(h.astype(jnp.float32), kcat) + bcat
            outs, off = {}, 0
            for name, feats in heads:
                outs[name] = y[:, off:off + feats]
                off += feats

        full_d = outs["amor_d"].reshape(B, Z, Z, F)
        diag1 = jnp.tanh(outs["amor_diag1"]).reshape(B, Z, F)
        diag2 = jnp.tanh(outs["amor_diag2"]).reshape(B, Z, F)
        b = outs["amor_b"].reshape(B, Z, F)

        # Strictly-upper mask (diagonal=1), then place tanh-bounded diagonals.
        triu = jnp.asarray(np.triu(np.ones((Z, Z), np.float32), k=1))[None, :, :, None]
        eye = jnp.asarray(np.eye(Z, dtype=np.float32))[None, :, :, None]
        r1 = full_d * triu + eye * diag1[:, :, None, :]
        r2 = jnp.swapaxes(full_d, 1, 2) * triu + eye * diag2[:, :, None, :]
        return r1, r2, b


class AmortizedGeneralSylvester(nn.Module):
    """h (B, h_size) -> per-flow triangular r1/r2, bias b, and an orthogonal
    matrix Q for the GENERAL Sylvester step (z' = z + Q R1 tanh(R2 Q^T z + b)).

    q_mode selects how Q is amortized — the two type_flows families the
    reference's CLI advertises but never implemented
    (run_nerf_uncertainty_NF.py:614-616; the sylvester-flows taxonomy):
      * 'householder': a reflection vector v per flow, Q = I - 2 vv^T/|v|^2;
      * 'orthogonal':  a full Z x Z matrix per flow, orthogonalized by fixed
        Bjoerck iterations.
    """

    z_size: int
    n_flows: int
    q_mode: str = "householder"  # 'householder' | 'orthogonal'
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray):
        from cfnerf_tpu.flows.sylvester import householder_q, orthogonalize_q

        Z, F = self.z_size, self.n_flows
        dense = lambda feats, name: TorchDense(
            feats, name=name, param_dtype=self.param_dtype, dtype=jnp.float32,
        )
        B = h.shape[0]
        full_d = dense(F * Z * Z, "amor_d")(h).reshape(B, Z, Z, F)
        diag1 = jnp.tanh(dense(F * Z, "amor_diag1")(h)).reshape(B, Z, F)
        diag2 = jnp.tanh(dense(F * Z, "amor_diag2")(h)).reshape(B, Z, F)
        b = dense(F * Z, "amor_b")(h).reshape(B, Z, F)

        triu = jnp.asarray(np.triu(np.ones((Z, Z), np.float32), k=1))[None, :, :, None]
        eye = jnp.asarray(np.eye(Z, dtype=np.float32))[None, :, :, None]
        r1 = full_d * triu + eye * diag1[:, :, None, :]
        r2 = jnp.swapaxes(full_d, 1, 2) * triu + eye * diag2[:, :, None, :]

        if self.q_mode == "householder":
            v = dense(F * Z, "amor_q")(h).reshape(B, Z, F)
            q = jnp.stack([householder_q(v[..., k]) for k in range(F)], -1)
        else:
            m = dense(F * Z * Z, "amor_q")(h).reshape(B, Z, Z, F)
            q = jnp.stack([orthogonalize_q(m[..., k]) for k in range(F)], -1)
        return r1, r2, q, b


class AmortizedPlanar(nn.Module):
    """h (B, h_size) -> u, w (B, Z, F) and b (B, F) for planar flow steps.

    Exposed for the `type_flows=planar` option surface
    (run_nerf_uncertainty_NF.py:614-616); the reference's NeRF_Flows only
    wires the triangular family (models.py:66-67).
    """

    z_size: int
    n_flows: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        Z, F = self.z_size, self.n_flows
        dense = lambda feats, name: TorchDense(
            feats, name=name, param_dtype=self.param_dtype, dtype=jnp.float32,
        )
        B = h.shape[0]
        u = dense(F * Z, "amor_u")(h).reshape(B, Z, F)
        w = dense(F * Z, "amor_w")(h).reshape(B, Z, F)
        b = dense(F, "amor_b")(h)
        return u, w, b
