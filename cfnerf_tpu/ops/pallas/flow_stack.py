"""Fused Triangular-Sylvester flow stack as a Pallas TPU kernel.

The flow stack is CF-NeRF's hottest non-matmul region (SURVEY.md section
5.7: ~33M flow evaluations per chunk): F=4 flow steps over (B, K, Z)
latents with per-point amortized triangular parameters.  The XLA
formulation materializes inter-step intermediates and backward residuals
in HBM; this kernel runs the whole unrolled chain per B-tile in VMEM —
one HBM read of the parameters, one write of the outputs.

Forward and backward are each ONE kernel (custom VJP).  The backward
recomputes the forward entirely in VMEM (the recompute is cheap VPU work;
the win is never touching HBM for residuals).

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
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOGDET_EPS = 1e-8


def _perm(i: int, Z: int, flip: bool) -> int:
    return (Z - 1 - i) if flip else i


def _fwd_tile(z0_ref, r1_ref, r2_ref, b_ref, *, n_flows: int, z_size: int,
              compute_log_det: bool, save_intermediates: bool = False):
    """Shared forward math on one tile. Returns (zs, ldj, trace) where
    trace[k] = (zs_at_step_k, ts_at_step_k) when save_intermediates."""
    Z = z_size
    zs = [z0_ref[:, :, i] for i in range(Z)]  # (B_TILE, K) each
    ldj = None
    trace = []

    for k in range(n_flows):
        flip = k % 2 == 1

        def coef(ref, i, j):
            return ref[:, i, j, k][:, None]  # (B_TILE, 1)

        zp = zs[::-1] if flip else zs
        ts = []
        for i in range(Z):
            pre = b_ref[:, i, k][:, None]
            for j in range(i, Z):
                pre = pre + coef(r2_ref, i, j) * zp[j]
            ts.append(jnp.tanh(pre))

        if save_intermediates:
            trace.append((list(zs), ts))

        zs_new = list(zs)
        for i in range(Z):
            upd = coef(r1_ref, i, i) * ts[i]
            for j in range(i + 1, Z):
                upd = upd + coef(r1_ref, i, j) * ts[j]
            out_idx = _perm(i, Z, flip)
            zs_new[out_idx] = zs[out_idx] + upd
        zs = zs_new

        if compute_log_det:
            for i in range(Z):
                der = 1.0 - ts[i] ** 2
                dj = der * (coef(r1_ref, i, i) * coef(r2_ref, i, i)) + 1.0
                term = jnp.log(jnp.abs(dj) + LOGDET_EPS)
                ldj = term if ldj is None else ldj + term

    return zs, ldj, trace


def _fwd_kernel(z0_ref, r1_ref, r2_ref, b_ref, z_out_ref, ldj_ref, *,
                n_flows: int, z_size: int, compute_log_det: bool):
    zs, ldj, _ = _fwd_tile(
        z0_ref, r1_ref, r2_ref, b_ref,
        n_flows=n_flows, z_size=z_size, compute_log_det=compute_log_det,
    )
    for i in range(z_size):
        z_out_ref[:, :, i] = zs[i]
    ldj_ref[:, :] = ldj if ldj is not None else jnp.zeros_like(z0_ref[:, :, 0])


def _bwd_kernel(z0_ref, r1_ref, r2_ref, b_ref, g_z_ref, g_ldj_ref,
                g_z0_ref, g_r1_ref, g_r2_ref, g_b_ref, *,
                n_flows: int, z_size: int, compute_log_det: bool):
    """Recompute forward in VMEM, then reverse-sweep the chain.

    Parameter gradients accumulate in LOCAL (B_TILE,) arrays (a stacked
    write at the end) — output refs are never read before being written.
    """
    Z = z_size
    F = n_flows
    _, _, trace = _fwd_tile(
        z0_ref, r1_ref, r2_ref, b_ref,
        n_flows=n_flows, z_size=z_size, compute_log_det=compute_log_det,
        save_intermediates=True,
    )

    g_z = [g_z_ref[:, :, i] for i in range(Z)]  # grads wrt zs after last step
    g_ldj = g_ldj_ref[:, :] if compute_log_det else None

    B_TILE = g_z[0].shape[0]
    zero_col = jnp.zeros((B_TILE,), dtype=g_z[0].dtype)
    acc_r1 = [[[zero_col for _ in range(F)] for _ in range(Z)] for _ in range(Z)]
    acc_r2 = [[[zero_col for _ in range(F)] for _ in range(Z)] for _ in range(Z)]
    acc_b = [[zero_col for _ in range(F)] for _ in range(Z)]

    for k in reversed(range(n_flows)):
        flip = k % 2 == 1
        zs_k, ts = trace[k]
        zp = zs_k[::-1] if flip else zs_k

        def coef(ref, i, j):
            return ref[:, i, j, k][:, None]

        # g wrt u_i (the additive update in permuted coords):
        g_u = [g_z[_perm(i, Z, flip)] for i in range(Z)]

        g_t = [jnp.zeros_like(g_z[0]) for _ in range(Z)]
        # ldj path
        if compute_log_det and g_ldj is not None:
            for i in range(Z):
                r1ii = coef(r1_ref, i, i)
                r2ii = coef(r2_ref, i, i)
                der = 1.0 - ts[i] ** 2
                dj = der * (r1ii * r2ii) + 1.0
                c = g_ldj * jnp.sign(dj) / (jnp.abs(dj) + LOGDET_EPS)
                g_t[i] = g_t[i] + c * (-2.0 * ts[i]) * (r1ii * r2ii)
                acc_r1[i][i][k] = acc_r1[i][i][k] + jnp.sum(c * der * r2ii, axis=1)
                acc_r2[i][i][k] = acc_r2[i][i][k] + jnp.sum(c * der * r1ii, axis=1)

        # u_i = sum_{j>=i} r1[i,j] t_j
        for i in range(Z):
            for j in range(i, Z):
                acc_r1[i][j][k] = acc_r1[i][j][k] + jnp.sum(g_u[i] * ts[j], axis=1)
                g_t[j] = g_t[j] + coef(r1_ref, i, j) * g_u[i]

        # t_i = tanh(pre_i); pre_i = b_i + sum_{j>=i} r2[i,j] zp_j
        g_zp = [jnp.zeros_like(g_z[0]) for _ in range(Z)]
        for i in range(Z):
            g_pre = g_t[i] * (1.0 - ts[i] ** 2)
            acc_b[i][k] = acc_b[i][k] + jnp.sum(g_pre, axis=1)
            for j in range(i, Z):
                acc_r2[i][j][k] = acc_r2[i][j][k] + jnp.sum(g_pre * zp[j], axis=1)
                g_zp[j] = g_zp[j] + coef(r2_ref, i, j) * g_pre

        # zp[j] = zs[perm(j)] -> add into the identity-path grads
        for j in range(Z):
            tgt = _perm(j, Z, flip)
            g_z[tgt] = g_z[tgt] + g_zp[j]

    for i in range(Z):
        g_z0_ref[:, :, i] = g_z[i]
    # single stacked writes (B_TILE, Z, Z, F) / (B_TILE, Z, F)
    g_r1_ref[:, :, :, :] = jnp.stack(
        [jnp.stack([jnp.stack(acc_r1[i][j], -1) for j in range(Z)], -2)
         for i in range(Z)], -3
    )
    g_r2_ref[:, :, :, :] = jnp.stack(
        [jnp.stack([jnp.stack(acc_r2[i][j], -1) for j in range(Z)], -2)
         for i in range(Z)], -3
    )
    g_b_ref[:, :, :] = jnp.stack(
        [jnp.stack(acc_b[i], -1) for i in range(Z)], -2
    )


def _tile_size(B: int) -> int:
    for t in (1024, 512, 256, 128, 64, 32, 16, 8):
        if B % t == 0:
            return t
    return B


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5)
)
def fused_flow_stack(z0, r1, r2, b, compute_log_det=True, interpret=False):
    """Fused flow stack. z0: (B, K, Z) f32; r1, r2: (B, Z, Z, F); b: (B, Z, F).
    Returns (z (B, K, Z), ldj (B, K)).  Set interpret=True on CPU."""
    return _fused_fwd_impl(z0, r1, r2, b, compute_log_det, interpret)


def _fused_fwd_impl(z0, r1, r2, b, compute_log_det, interpret):
    B, K, Z = z0.shape
    F = r1.shape[-1]
    B_TILE = _tile_size(B)
    grid = (B // B_TILE,)

    kernel = functools.partial(
        _fwd_kernel, n_flows=F, z_size=Z, compute_log_det=compute_log_det
    )
    z_out, ldj = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B_TILE, K, Z), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, Z, Z, F), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, Z, Z, F), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, Z, F), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B_TILE, K, Z), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, K, Z), z0.dtype),
            jax.ShapeDtypeStruct((B, K), z0.dtype),
        ],
        interpret=interpret,
    )(z0, r1, r2, b)
    return z_out, ldj


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

    kernel = functools.partial(
        _bwd_kernel, n_flows=F, z_size=Z, compute_log_det=compute_log_det
    )
    g_z0, g_r1, g_r2, g_b = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B_TILE, K, Z), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, Z, Z, F), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, Z, Z, F), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, Z, F), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, K, Z), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B_TILE, K, Z), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, Z, Z, F), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, Z, Z, F), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, Z, F), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, K, Z), z0.dtype),
            jax.ShapeDtypeStruct((B, Z, Z, F), r1.dtype),
            jax.ShapeDtypeStruct((B, Z, Z, F), r2.dtype),
            jax.ShapeDtypeStruct((B, Z, F), b.dtype),
        ],
        interpret=interpret,
    )(z0, r1, r2, b, g_z, g_ldj)
    return g_z0, g_r1, g_r2, g_b


fused_flow_stack.defvjp(_fused_fwd, _fused_bwd)
