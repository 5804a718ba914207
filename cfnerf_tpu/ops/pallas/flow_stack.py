"""Fused Triangular-Sylvester flow stack as a Pallas TPU kernel.

The flow stack is CF-NeRF's hottest non-matmul region (SURVEY.md section
5.7: ~33M flow evaluations per chunk): F=4 flow steps over (B, K, Z)
latents with per-point amortized triangular parameters.  The XLA
formulation materializes inter-step intermediates and backward residuals
in HBM; this kernel runs the whole unrolled chain per B-tile in VMEM —
one HBM read of the parameters, one write of the outputs.

Layout: TPU VMEM tiles are (8 sublanes x 128 lanes) over the LAST TWO
dims, so the point axis B (the huge one) must be minor.  All kernel
operands are pre-transposed to (rows, B):
    z0   (Z*K, B)  component-major rows: comp i occupies rows [i*K, (i+1)*K)
    r1/r2 (Z*Z*F, B)  row index (i*Z + j)*F + k
    b    (Z*F, B)     row index i*F + k
Work arrays are (K, B_TILE) — full 128-lane utilization; per-point
coefficients are (1, B_TILE) rows broadcast over K sublanes.  The public
wrapper `fused_flow_stack` takes/returns the natural (B, K, Z) shapes and
does the boundary transposes in XLA (two copies, amortized over the
whole fused chain).

Forward and backward are each ONE kernel (custom VJP).  The backward
recomputes the forward entirely in VMEM (cheap VPU work; the win is never
touching HBM for residuals).

Math (parity with flows.py:189-268 / models.py:387-416, same as
cfnerf_tpu.flows.sylvester):
    per step k, with P = flip permutation on odd k:
        zp    = P z
        pre_i = b_i + sum_{j>=i} r2[i,j] zp_j
        t_i   = tanh(pre_i)
        u_i   = sum_{j>=i} r1[i,j] t_j
        z'    = z + P^T u
        ldj  += sum_i log(|(1 - t_i^2) r1[i,i] r2[i,i] + 1| + 1e-8)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOGDET_EPS = 1e-8


def _perm(i: int, Z: int, flip: bool) -> int:
    return (Z - 1 - i) if flip else i


def _r_row(i: int, j: int, k: int, Z: int, F: int) -> int:
    return (i * Z + j) * F + k


def _b_row(i: int, k: int, F: int) -> int:
    return i * F + k


def _fwd_tile(z0_ref, r1_ref, r2_ref, b_ref, *, n_flows: int, z_size: int,
              k_samples: int, compute_log_det: bool,
              save_intermediates: bool = False):
    """Shared forward math on one tile (transposed layout).

    Returns (zs [(K, B_TILE)] * Z, ldj (K, B_TILE) | None, trace)."""
    Z, F, K = z_size, n_flows, k_samples
    zs = [z0_ref[i * K:(i + 1) * K, :] for i in range(Z)]
    ldj = None
    trace = []

    for k in range(F):
        flip = k % 2 == 1

        def rc(ref, i, j):  # (1, B_TILE) coefficient row
            r = _r_row(i, j, k, Z, F)
            return ref[r:r + 1, :]

        zp = zs[::-1] if flip else zs
        ts = []
        for i in range(Z):
            br = _b_row(i, k, F)
            pre = b_ref[br:br + 1, :]
            for j in range(i, Z):
                pre = pre + rc(r2_ref, i, j) * zp[j]
            ts.append(jnp.tanh(pre))

        if save_intermediates:
            trace.append((list(zs), ts))

        zs_new = list(zs)
        for i in range(Z):
            upd = rc(r1_ref, i, i) * ts[i]
            for j in range(i + 1, Z):
                upd = upd + rc(r1_ref, i, j) * ts[j]
            out_idx = _perm(i, Z, flip)
            zs_new[out_idx] = zs[out_idx] + upd
        zs = zs_new

        if compute_log_det:
            for i in range(Z):
                der = 1.0 - ts[i] ** 2
                dj = der * (rc(r1_ref, i, i) * rc(r2_ref, i, i)) + 1.0
                term = jnp.log(jnp.abs(dj) + LOGDET_EPS)
                ldj = term if ldj is None else ldj + term

    return zs, ldj, trace


def _fwd_kernel(z0_ref, r1_ref, r2_ref, b_ref, z_out_ref, ldj_ref, *,
                n_flows: int, z_size: int, k_samples: int,
                compute_log_det: bool):
    K = k_samples
    zs, ldj, _ = _fwd_tile(
        z0_ref, r1_ref, r2_ref, b_ref, n_flows=n_flows, z_size=z_size,
        k_samples=K, compute_log_det=compute_log_det,
    )
    for i in range(z_size):
        z_out_ref[i * K:(i + 1) * K, :] = zs[i]
    if compute_log_det and ldj is not None:
        ldj_ref[:, :] = ldj
    else:
        ldj_ref[:, :] = jnp.zeros_like(zs[0])


def _bwd_kernel(z0_ref, r1_ref, r2_ref, b_ref, g_z_ref, g_ldj_ref,
                g_z0_ref, g_r1_ref, g_r2_ref, g_b_ref, *,
                n_flows: int, z_size: int, k_samples: int,
                compute_log_det: bool):
    """Recompute forward in VMEM, then reverse-sweep the chain.

    Parameter gradients are (1, B_TILE) rows summed over K, written once
    per row — output refs are never read before being written."""
    Z, F, K = z_size, n_flows, k_samples
    _, _, trace = _fwd_tile(
        z0_ref, r1_ref, r2_ref, b_ref, n_flows=F, z_size=Z, k_samples=K,
        compute_log_det=compute_log_det, save_intermediates=True,
    )

    g_z = [g_z_ref[i * K:(i + 1) * K, :] for i in range(Z)]
    g_ldj = g_ldj_ref[:, :] if compute_log_det else None

    for k in reversed(range(F)):
        flip = k % 2 == 1
        zs_k, ts = trace[k]
        zp = zs_k[::-1] if flip else zs_k

        def rc(ref, i, j):
            r = _r_row(i, j, k, Z, F)
            return ref[r:r + 1, :]

        def acc_r(ref, i, j, val_kb):
            r = _r_row(i, j, k, Z, F)
            ref[r:r + 1, :] = jnp.sum(val_kb, axis=0, keepdims=True)

        # g wrt u_i (the additive update in permuted coords)
        g_u = [g_z[_perm(i, Z, flip)] for i in range(Z)]

        g_t = [jnp.zeros_like(g_z[0]) for _ in range(Z)]
        gr1 = {}  # (i, j) -> (K, B) accumulation before the K-sum
        gr2 = {}

        if compute_log_det and g_ldj is not None:
            for i in range(Z):
                r1ii = rc(r1_ref, i, i)
                r2ii = rc(r2_ref, i, i)
                der = 1.0 - ts[i] ** 2
                dj = der * (r1ii * r2ii) + 1.0
                c = g_ldj * jnp.sign(dj) / (jnp.abs(dj) + LOGDET_EPS)
                g_t[i] = g_t[i] + c * (-2.0 * ts[i]) * (r1ii * r2ii)
                gr1[(i, i)] = c * der * r2ii
                gr2[(i, i)] = c * der * r1ii

        # u_i = sum_{j>=i} r1[i,j] t_j
        for i in range(Z):
            for j in range(i, Z):
                contrib = g_u[i] * ts[j]
                gr1[(i, j)] = gr1.get((i, j), 0.0) + contrib
                g_t[j] = g_t[j] + rc(r1_ref, i, j) * g_u[i]

        # t_i = tanh(pre_i); pre_i = b_i + sum_{j>=i} r2[i,j] zp_j
        g_zp = [jnp.zeros_like(g_z[0]) for _ in range(Z)]
        for i in range(Z):
            g_pre = g_t[i] * (1.0 - ts[i] ** 2)
            br = _b_row(i, k, F)
            g_b_ref[br:br + 1, :] = jnp.sum(g_pre, axis=0, keepdims=True)
            for j in range(i, Z):
                gr2[(i, j)] = gr2.get((i, j), 0.0) + g_pre * zp[j]
                g_zp[j] = g_zp[j] + rc(r2_ref, i, j) * g_pre

        # flush this step's param-grad rows (upper triangle; lower = 0)
        for i in range(Z):
            for j in range(Z):
                if j >= i:
                    acc_r(g_r1_ref, i, j, gr1.get((i, j), jnp.zeros_like(g_z[0])))
                    acc_r(g_r2_ref, i, j, gr2.get((i, j), jnp.zeros_like(g_z[0])))
                else:
                    zrow = jnp.zeros((1, g_z[0].shape[1]), dtype=g_z[0].dtype)
                    r = _r_row(i, j, k, Z, F)
                    g_r1_ref[r:r + 1, :] = zrow
                    g_r2_ref[r:r + 1, :] = zrow

        # zp[j] = zs[perm(j)] -> add into the identity-path grads
        for j in range(Z):
            tgt = _perm(j, Z, flip)
            g_z[tgt] = g_z[tgt] + g_zp[j]

    for i in range(Z):
        g_z0_ref[i * K:(i + 1) * K, :] = g_z[i]


def _tile_size(B: int) -> int:
    for t in (512, 256, 128):
        if B % t == 0:
            return t
    return B


def _to_rows(z0, r1, r2, b):
    """(B,K,Z)/(B,Z,Z,F)/(B,Z,F) -> transposed row-major kernel operands."""
    B, K, Z = z0.shape
    F = r1.shape[-1]
    z0_t = z0.transpose(2, 1, 0).reshape(Z * K, B)
    r1_t = r1.transpose(1, 2, 3, 0).reshape(Z * Z * F, B)
    r2_t = r2.transpose(1, 2, 3, 0).reshape(Z * Z * F, B)
    b_t = b.transpose(1, 2, 0).reshape(Z * F, B)
    return z0_t, r1_t, r2_t, b_t


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_flow_stack(z0, r1, r2, b, compute_log_det=True, interpret=False):
    """Fused flow stack. z0: (B, K, Z) f32; r1, r2: (B, Z, Z, F); b: (B, Z, F).
    Returns (z (B, K, Z), ldj (B, K)).  Set interpret=True on CPU."""
    return _fused_fwd_impl(z0, r1, r2, b, compute_log_det, interpret)


def _fused_fwd_impl(z0, r1, r2, b, compute_log_det, interpret):
    B, K, Z = z0.shape
    F = r1.shape[-1]
    B_TILE = _tile_size(B)
    grid = (B // B_TILE,)
    z0_t, r1_t, r2_t, b_t = _to_rows(z0, r1, r2, b)

    kernel = functools.partial(
        _fwd_kernel, n_flows=F, z_size=Z, k_samples=K,
        compute_log_det=compute_log_det,
    )
    row_spec = lambda rows: pl.BlockSpec(
        (rows, B_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    z_t, ldj_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec(Z * K), row_spec(Z * Z * F), row_spec(Z * Z * F),
                  row_spec(Z * F)],
        out_specs=[row_spec(Z * K), row_spec(K)],
        out_shape=[
            jax.ShapeDtypeStruct((Z * K, B), z0.dtype),
            jax.ShapeDtypeStruct((K, B), z0.dtype),
        ],
        interpret=interpret,
    )(z0_t, r1_t, r2_t, b_t)
    z_out = z_t.reshape(Z, K, B).transpose(2, 1, 0)
    return z_out, ldj_t.T


def _fused_fwd(z0, r1, r2, b, compute_log_det, interpret):
    out = _fused_fwd_impl(z0, r1, r2, b, compute_log_det, interpret)
    return out, (z0, r1, r2, b)


def _fused_bwd(compute_log_det, interpret, res, cotangents):
    z0, r1, r2, b = res
    g_z, g_ldj = cotangents
    B, K, Z = z0.shape
    F = r1.shape[-1]
    B_TILE = _tile_size(B)
    grid = (B // B_TILE,)

    z0_t, r1_t, r2_t, b_t = _to_rows(z0, r1, r2, b)
    g_z_t = g_z.transpose(2, 1, 0).reshape(Z * K, B)
    g_ldj_t = g_ldj.T

    kernel = functools.partial(
        _bwd_kernel, n_flows=F, z_size=Z, k_samples=K,
        compute_log_det=compute_log_det,
    )
    row_spec = lambda rows: pl.BlockSpec(
        (rows, B_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    g_z0_t, g_r1_t, g_r2_t, g_b_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec(Z * K), row_spec(Z * Z * F), row_spec(Z * Z * F),
                  row_spec(Z * F), row_spec(Z * K), row_spec(K)],
        out_specs=[row_spec(Z * K), row_spec(Z * Z * F), row_spec(Z * Z * F),
                   row_spec(Z * F)],
        out_shape=[
            jax.ShapeDtypeStruct((Z * K, B), z0.dtype),
            jax.ShapeDtypeStruct((Z * Z * F, B), r1.dtype),
            jax.ShapeDtypeStruct((Z * Z * F, B), r2.dtype),
            jax.ShapeDtypeStruct((Z * F, B), b.dtype),
        ],
        interpret=interpret,
    )(z0_t, r1_t, r2_t, b_t, g_z_t, g_ldj_t)

    g_z0 = g_z0_t.reshape(Z, K, B).transpose(2, 1, 0)
    g_r1 = g_r1_t.reshape(Z, Z, F, B).transpose(3, 0, 1, 2)
    g_r2 = g_r2_t.reshape(Z, Z, F, B).transpose(3, 0, 1, 2)
    g_b = g_b_t.reshape(Z, F, B).transpose(2, 0, 1)
    return g_z0, g_r1, g_r2, g_b


fused_flow_stack.defvjp(_fused_fwd, _fused_bwd)
