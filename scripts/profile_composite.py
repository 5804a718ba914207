"""Microbenchmark: raw2outputs (compositing) fwd and fwd+bwd on the TPU.

Sizes the opportunity for a fused Pallas compositing kernel before writing
one: measures the XLA formulation at the flagship shape (R=2048, S=128,
K=32) with device-resident repetition loops and value-fetch fences
(CLAUDE.md sharp edges).

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_composite.py
"""
from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from cfnerf_tpu.ops.compositing import raw2outputs

R, S, K = 2048, 128, 32
REPS = 20


def timed(fn, *args):
    out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])  # compile + fence
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.asarray(out).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best / REPS


def main():
    rng = np.random.RandomState(0)
    raw = jnp.asarray(rng.randn(R, S, K, 4), jnp.float32)
    z_vals = jnp.asarray(np.sort(rng.rand(R, S), -1) * 3.5 + 0.5, jnp.float32)
    rays_d = jnp.asarray(rng.randn(R, 3), jnp.float32)

    def fwd_loss(raw, z_vals, rays_d):
        rgb_map, disp, acc, weights, depth = raw2outputs(raw, z_vals, rays_d)
        return rgb_map.mean() + depth.mean() + disp.mean()

    @jax.jit
    def run_fwd(raw, z_vals, rays_d):
        def body(_, carry):
            return fwd_loss(raw + carry * 1e-20, z_vals, rays_d)
        return jax.lax.fori_loop(0, REPS, body, 0.0)

    @jax.jit
    def run_fwdbwd(raw, z_vals, rays_d):
        g = jax.grad(fwd_loss)
        def body(_, carry):
            return g(raw + carry * 1e-20, z_vals, rays_d).mean()
        return jax.lax.fori_loop(0, REPS, body, 0.0)

    t_fwd = timed(run_fwd, raw, z_vals, rays_d)
    t_bwd = timed(run_fwdbwd, raw, z_vals, rays_d)
    bytes_raw = R * S * K * 4 * 4
    print(f"composite fwd   : {t_fwd*1e3:7.3f} ms  "
          f"({bytes_raw/t_fwd/1e9:6.1f} GB/s effective on raw alone)")
    print(f"composite fwd+bwd: {t_bwd*1e3:7.3f} ms  "
          f"({3*bytes_raw/t_bwd/1e9:6.1f} GB/s on 3x raw)")
    print(f"raw tensor: {bytes_raw/1e6:.0f} MB; devices: {jax.devices()}")


if __name__ == "__main__":
    main()
