"""Normalizing-flow transform steps as pure functions.

Parity targets:
  * TriangularSylvester  /root/reference/model/flow/flows.py:168-276
    (z' = z + P^T R1 tanh(R2 P z + b), P = flip permutation on odd steps;
    log|det J| = sum_i log|1 + tanh'(.)_i * diag(R1)_i * diag(R2)_i| + 1e-8)
  * Planar               /root/reference/model/flow/flows.py:15-87
    (z' = z + u_hat tanh(w^T z + b) with u reparameterized for invertibility)

TPU-native design: K Monte-Carlo draws ride a broadcast axis — flow
parameters are per-*point* (batch axis B) while z carries (B, K, Z).  z_size
is 1 (density) or 3 (RGB), so the per-step "matmuls" are tiny contractions
that XLA fuses into VPU elementwise chains; the n_flows loop is unrolled at
trace time (static count) so no scan-carried HBM intermediates exist.
Everything is f32: log-det chains underflow in bf16.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

LOGDET_EPS = 1e-8  # reference: flows.py:255 (diag_j.abs() + 1e-08)


def triangular_sylvester_step(
    z: jnp.ndarray,
    r1: jnp.ndarray,
    r2: jnp.ndarray,
    b: jnp.ndarray,
    *,
    flip: bool,
    compute_log_det: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One triangular Sylvester step.

    Args:
      z:  (B, K, Z) current latent (K = Monte-Carlo broadcast axis).
      r1: (B, Z, Z) upper-triangular, tanh-bounded diagonal.
      r2: (B, Z, Z) upper-triangular, tanh-bounded diagonal.
      b:  (B, Z) bias.
      flip: use the reversal permutation P (odd flow steps).

    Returns (z', log_det (B, K)); log_det is 0.0 when compute_log_det is
    False (the reference's is_test shortpath, flows.py:204-223).

    det(I + P^T R1 D R2 P) = det(I + R1 D R2) and upper * diag * upper is
    upper-triangular, so the determinant is the product of
    1 + diag(R1)_i * D_ii * diag(R2)_i with D = diag(tanh'(R2 P z + b)).

    TPU performance note: Z is 1 (density) or 3 (RGB), so a batched
    (B, Z, Z) x (B, K, Z) contraction would lower to millions of tiny
    dot_generals — catastrophic on the MXU (measured: the einsum
    formulation made the flow stack 90% of the train step).  Instead the
    Z axis is UNROLLED at trace time into (B, K)-shaped elementwise FMA
    chains on the VPU (strict upper-triangularity exploited: j >= i terms
    only).  An explicitly transposed (K, B) layout was measured SLOWER
    (transposes outweigh lane gains), so components stay (B, K).
    """
    Z = z.shape[-1]
    zs = [z[..., i] for i in range(Z)]  # Z arrays of (B, K)
    zs_new, log_det = _step_components(
        zs, r1, r2, b, flip=flip, compute_log_det=compute_log_det
    )
    z_new = jnp.stack(zs_new, axis=-1)  # (B, K, Z)
    if log_det is None:
        return z_new, jnp.zeros(z.shape[:-1], dtype=z.dtype)
    return z_new, log_det


def _step_components(zs, r1, r2, b, *, flip: bool, compute_log_det: bool):
    """One flow step on (B, K)-layout component lists.

    zs: list of Z arrays (B, K); r1, r2: (B, Z, Z); b: (B, Z).
    Returns (zs_new list, log_det (B, K) or None)."""
    Z = len(zs)
    zp = zs[::-1] if flip else zs  # permuted view

    def coef(mat, i, j):
        return mat[:, i, j][:, None]  # (B, 1) broadcasts over K

    ts = []
    for i in range(Z):
        pre = b[:, i][:, None]
        for j in range(i, Z):
            pre = pre + coef(r2, i, j) * zp[j]
        ts.append(jnp.tanh(pre))

    # upd in permuted coordinates; scatter back through the flip
    zs_new = list(zs)
    for i in range(Z):
        upd = coef(r1, i, i) * ts[i]
        for j in range(i + 1, Z):
            upd = upd + coef(r1, i, j) * ts[j]
        out_idx = (Z - 1 - i) if flip else i
        zs_new[out_idx] = zs[out_idx] + upd

    if not compute_log_det:
        return zs_new, None

    log_det = None
    for i in range(Z):
        der = 1.0 - ts[i] ** 2  # tanh'(pre_i)
        dj = der * (coef(r1, i, i) * coef(r2, i, i)) + 1.0
        term = jnp.log(jnp.abs(dj) + LOGDET_EPS)
        log_det = term if log_det is None else log_det + term
    return zs_new, log_det


def triangular_sylvester_stack(
    z0: jnp.ndarray,
    r1: jnp.ndarray,
    r2: jnp.ndarray,
    b: jnp.ndarray,
    *,
    compute_log_det: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply n_flows steps with alternating identity/flip permutation
    (reference: models.py:401-413 — flip on odd k).

    Args:
      z0: (B, K, Z); r1, r2: (B, Z, Z, F); b: (B, Z, F).
    Returns (z_F, sum_log_det (B, K)).
    """
    n_flows = r1.shape[-1]
    Z = z0.shape[-1]
    zs = [z0[..., i] for i in range(Z)]  # unstacked once for the whole chain
    ldj = None
    for k in range(n_flows):  # static unroll — XLA fuses the whole chain
        zs, ld = _step_components(
            zs, r1[..., k], r2[..., k], b[..., k],
            flip=(k % 2 == 1), compute_log_det=compute_log_det,
        )
        if ld is not None:
            ldj = ld if ldj is None else ldj + ld
    z = jnp.stack(zs, axis=-1)  # (B, K, Z)
    if ldj is None:
        return z, jnp.zeros(z0.shape[:-1], dtype=z0.dtype)
    return z, ldj


def general_sylvester_step(
    z: jnp.ndarray,
    r1: jnp.ndarray,
    r2: jnp.ndarray,
    q: jnp.ndarray,
    b: jnp.ndarray,
    *,
    compute_log_det: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One GENERAL Sylvester step z' = z + Q R1 tanh(R2 Q^T z + b).

    Parity target: Sylvester._forward, /root/reference/model/flow/flows.py:89-165
    (dead in the reference — only the triangular specialization is wired;
    implemented here so the orthogonal/householder type_flows options are
    real capabilities instead of silent fallbacks).

    Args:
      z:  (B, K, Z); r1, r2: (B, Z, Z) upper-triangular w/ bounded diagonal;
      q:  (B, Z, Z) orthogonal; b: (B, Z).
    Returns (z', log_det (B, K)).

    det(I + Q R1 D R2 Q^T) = det(I + R1 D R2) for orthogonal Q, so the
    log-det is the same diagonal product as the triangular flow
    (flows.py:141-151).  Z is tiny (1 or 3): the contractions are
    elementwise-width VPU work, fused by XLA.
    """
    zq = jnp.einsum("bkz,bzy->bky", z, q)            # (Q^T z)^T
    pre = jnp.einsum("bky,biy->bki", zq, r2) + b[:, None, :]
    t = jnp.tanh(pre)                                 # (B, K, Z)
    upd_q = jnp.einsum("bki,bji->bkj", t, r1)         # (R1 t)_j
    z_new = z + jnp.einsum("bkj,bzj->bkz", upd_q, q)  # Q (R1 t)

    if not compute_log_det:
        return z_new, jnp.zeros(z.shape[:-1], dtype=z.dtype)

    Z = z.shape[-1]
    idx = jnp.arange(Z)
    diag = (r1[:, idx, idx] * r2[:, idx, idx])[:, None, :]  # (B, 1, Z)
    dj = (1.0 - t ** 2) * diag + 1.0
    log_det = jnp.log(jnp.abs(dj) + LOGDET_EPS).sum(-1)
    return z_new, log_det


def householder_q(v: jnp.ndarray) -> jnp.ndarray:
    """(B, Z) reflection vectors -> (B, Z, Z) EXACTLY orthogonal
    Householder matrices Q = I - 2 v^ v^T (the 'householder' Sylvester
    family from the van den Berg et al. taxonomy the reference's CLI
    advertises).  A near-zero v yields the identity exactly — an
    eps-softened normalization would leave Q measurably non-orthogonal
    there, breaking the general-Sylvester log-det identity."""
    Z = v.shape[-1]
    norm2 = jnp.sum(v ** 2, -1, keepdims=True)
    safe = norm2 > 1e-12
    vn = v / jnp.sqrt(jnp.where(safe, norm2, 1.0))
    h = jnp.eye(Z) - 2.0 * vn[:, :, None] * vn[:, None, :]
    return jnp.where(safe[..., None], h, jnp.eye(Z))


def orthogonalize_q(m: jnp.ndarray) -> jnp.ndarray:
    """(B, Z, Z) unconstrained matrices -> EXACTLY orthogonal Q as a
    product of Z Householder reflections, one per row of m.

    The sylvester-flows construct_orthogonal recipe (fixed Bjoerck
    iterations) was measured to leave |Q^T Q - I| ~ 0.9 on near-rank-
    deficient amortized inputs — and nothing constrains a trained amor_q
    head away from those — which silently invalidates the general-
    Sylvester log-det identity (det(I + Q R1 D R2 Q^T) = det(I + R1 D R2)
    requires orthogonal Q).  A Householder product is orthogonal by
    construction for ANY input: a near-zero row smoothly degrades its
    reflection to the identity (the eps keeps it on the orthogonal
    manifold up to O(eps))."""
    Z = m.shape[-1]
    q = jnp.broadcast_to(jnp.eye(Z), m.shape)
    for i in range(Z):
        q = jnp.einsum("bij,bjk->bik", q, householder_q(m[:, i, :]))
    return q


def planar_step(
    z: jnp.ndarray,
    u: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One planar flow step z' = z + u_hat * tanh(w^T z + b).

    u is reparameterized (u_hat) so that w^T u_hat >= -1, guaranteeing
    invertibility (Rezende & Mohamed appendix; reference flows.py:52-86).

    Args:
      z: (B, K, Z); u, w: (B, Z); b: (B,).
    Returns (z', log_det (B, K)).
    """
    uw = jnp.sum(u * w, axis=-1, keepdims=True)  # (B, 1)
    m_uw = -1.0 + jax.nn.softplus(uw)
    w_norm_sq = jnp.sum(w ** 2, axis=-1, keepdims=True)
    u_hat = u + (m_uw - uw) * w / w_norm_sq  # (B, Z)

    wzb = jnp.einsum("bkz,bz->bk", z, w) + b[:, None]  # (B, K)
    z_new = z + u_hat[:, None, :] * jnp.tanh(wzb)[..., None]

    psi_u = (1.0 - jnp.tanh(wzb) ** 2) * jnp.sum(w * u_hat, -1, keepdims=True)  # (B, K)
    log_det = jnp.log(jnp.abs(1.0 + psi_u) + 1e-10)
    return z_new, log_det
