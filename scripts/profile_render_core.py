"""Fused flow+composite render core vs the current unfused path, on TPU.

Current path = fused_flow_stack (Pallas, both families) -> XLA concat/
reshape -> raw2outputs (XLA).  Flagship shape: R=2048, S=128, K=32, F=4.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_render_core.py
"""
from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from cfnerf_tpu.ops.compositing import LAST_DIST, raw2outputs
from cfnerf_tpu.ops.pallas.flow_stack import fused_flow_stack
from cfnerf_tpu.ops.pallas.render_core import fused_flow_composite

R, S, K, F = 2048, 128, 32, 4
B = R * S
REPS = 10


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    sc = 0.3
    tri = lambda: np.triu(
        (rng.randn(B, F, 3, 3) * sc).astype(np.float32)
    ).transpose(0, 2, 3, 1)
    args = dict(
        z0_a=jnp.asarray(rng.randn(K, 1) * sc, jnp.float32),
        r1_a=jnp.asarray(rng.randn(B, 1, 1, F) * sc, jnp.float32),
        r2_a=jnp.asarray(rng.randn(B, 1, 1, F) * sc, jnp.float32),
        b_a=jnp.asarray(rng.randn(B, 1, F) * sc, jnp.float32),
        z0_r=jnp.asarray(rng.randn(K, 3) * sc, jnp.float32),
        r1_r=jnp.asarray(tri(), jnp.float32),
        r2_r=jnp.asarray(tri(), jnp.float32),
        b_r=jnp.asarray(rng.randn(B, 3, F) * sc, jnp.float32),
    )
    z_vals = jnp.asarray(
        (np.sort(rng.rand(R, S), -1) * 3.5 + 0.5), jnp.float32
    )
    rays_d = jnp.asarray(rng.randn(R, 3), jnp.float32)
    return args, z_vals, rays_d


def _dists(z_vals, rays_d):
    d = jnp.concatenate(
        [z_vals[..., 1:] - z_vals[..., :-1],
         jnp.full_like(z_vals[..., :1], LAST_DIST)], -1,
    )
    return d * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)


def pipeline_unfused(args, z_vals, rays_d, compute_log_det):
    alpha0 = jnp.broadcast_to(args["z0_a"][None], (B, K, 1))
    rgb0 = jnp.broadcast_to(args["z0_r"][None], (B, K, 3))
    z_a, ldj_a = fused_flow_stack(
        alpha0, args["r1_a"], args["r2_a"], args["b_a"], compute_log_det
    )
    z_r, ldj_r = fused_flow_stack(
        rgb0, args["r1_r"], args["r2_r"], args["b_r"], compute_log_det
    )
    raw = jnp.concatenate([z_r, z_a], -1).reshape(R, S, K, 4)
    rgb_map, disp, acc, w, depth = raw2outputs(raw, z_vals, rays_d)
    if compute_log_det:
        ldj_a = ldj_a + (z_a - jax.nn.softplus(z_a)).sum(-1)
        ldj_r = ldj_r + (z_r - 2.0 * jax.nn.softplus(z_r)).sum(-1)
        lsum = ldj_a.mean() + ldj_r.mean()
    else:
        lsum = 0.0
    return rgb_map, depth, acc, lsum


def pipeline_fused(args, z_vals, rays_d, compute_log_det):
    rgb_map, depth, acc, ldj = fused_flow_composite(
        args["z0_a"], args["r1_a"], args["r2_a"], args["b_a"],
        args["z0_r"], args["r1_r"], args["r2_r"], args["b_r"],
        z_vals.ravel(), _dists(z_vals, rays_d).ravel(),
        S, compute_log_det, False,
    )
    lsum = (ldj[0].sum() + ldj[1].sum()) / (B * K) if compute_log_det else 0.0
    return rgb_map, depth, acc, lsum


def scalar_loss(pipeline, compute_log_det):
    def loss(args, z_vals, rays_d):
        rgb, depth, acc, lsum = pipeline(args, z_vals, rays_d, compute_log_det)
        return rgb.mean() + 0.1 * depth.mean() + 0.05 * acc.mean() - 0.01 * lsum
    return loss


def timed(fn, args, z_vals, rays_d, grad):
    f = (lambda a, z, r: jax.grad(fn)(a, z, r)["b_a"].mean()) if grad else fn

    @jax.jit
    def run(args, z_vals, rays_d):
        def body(_, carry):
            a2 = dict(args)
            a2["b_a"] = a2["b_a"] + carry * 1e-20
            return f(a2, z_vals, rays_d) * 1.0
        return jax.lax.fori_loop(0, REPS, body, 0.0)

    _ = float(run(args, z_vals, rays_d))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run(args, z_vals, rays_d))
        best = min(best, time.perf_counter() - t0)
    return best / REPS


def main():
    args, z_vals, rays_d = _inputs()

    # numeric agreement on-device
    a = scalar_loss(pipeline_unfused, True)(args, z_vals, rays_d)
    b = scalar_loss(pipeline_fused, True)(args, z_vals, rays_d)
    print(f"train value: unfused={float(a):.6f} fused={float(b):.6f} "
          f"drift={abs(float(a)-float(b)):.2e}")

    for mode, cld in (("test ", False), ("train", True)):
        for name, pipe in (("unfused", pipeline_unfused),
                           ("fused  ", pipeline_fused)):
            loss = scalar_loss(pipe, cld)
            tf = timed(loss, args, z_vals, rays_d, grad=False)
            if cld:
                tb = timed(loss, args, z_vals, rays_d, grad=True)
                print(f"{mode} {name}: fwd {tf*1e3:6.3f} ms   "
                      f"fwd+bwd {tb*1e3:6.3f} ms")
            else:
                print(f"{mode} {name}: fwd {tf*1e3:6.3f} ms")


if __name__ == "__main__":
    main()
