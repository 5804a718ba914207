"""TPU-numerics probe: fused render core vs the XLA pipeline ON REAL TPU.

The interpret-mode parity suite (tests/test_render_core.py) runs the kernel
through the Pallas interpreter in full f32 — it cannot see Mosaic codegen
effects, in particular MXU input truncation: an f32 x f32 dot at DEFAULT
precision multiplies in bf16 on TPU.  The kernel's segment-reduce /
placement matmuls (_dot in ops/pallas/render_core.py) carry the composite
sums and the backward gradient gather, so truncation there would put ~0.4%
relative noise on every rendered pixel and every gradient — invisible to
the CPU tests, visible as a quality gap at >26 dB PSNR (the r04 sweep's
N48-beats-N128 anomaly).

Prints max-abs / max-rel deltas for all outputs and all input gradients,
fused-vs-XLA, at a supported shape, f32 end to end.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), jax.devices()[0].device_kind)

from test_render_core import _dists, _inputs, unfused, R, S, K, F  # noqa: E402
from cfnerf_tpu.ops.pallas import render_core  # noqa: E402
from cfnerf_tpu.ops.pallas.render_core import fused_flow_composite  # noqa: E402


def run(saturate):
    args, z_vals, rays_d = _inputs(seed=0, saturate=saturate)
    dists = _dists(z_vals, rays_d)
    order = list(args.keys())

    def fused_loss_outs(*flat):
        a = dict(zip(order, flat))
        rgb, depth, acc, ldj = fused_flow_composite(
            a["z0_a"], a["r1_a"], a["r2_a"], a["b_a"],
            a["z0_r"], a["r1_r"], a["r2_r"], a["b_r"],
            z_vals.reshape(-1), dists.reshape(-1), S,
            compute_log_det=True, interpret=False,
        )
        loss = (rgb.sum() + 0.3 * depth.sum() + 0.7 * acc.sum()
                + 0.11 * ldj.sum())
        return loss, (rgb, depth, acc, ldj)

    def xla_loss_outs(*flat):
        a = dict(zip(order, flat))
        rgb, depth, acc, ldj = unfused(a, z_vals, rays_d)
        loss = (rgb.sum() + 0.3 * depth.sum() + 0.7 * acc.sum()
                + 0.11 * ldj.sum())
        return loss, (rgb, depth, acc, ldj)

    flat = [args[k] for k in order]
    (lf, outs_f), gf = jax.jit(jax.value_and_grad(fused_loss_outs,
                                                  argnums=tuple(range(8)),
                                                  has_aux=True))(*flat)
    (lx, outs_x), gx = jax.jit(jax.value_and_grad(xla_loss_outs,
                                                  argnums=tuple(range(8)),
                                                  has_aux=True))(*flat)

    names = ["rgb", "depth", "acc", "ldj"]
    print(f"--- saturate={saturate} ---")
    for n, a, b in zip(names, outs_f, outs_x):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = np.abs(b).max() + 1e-12
        print(f"out {n:6s} max|d|={np.abs(a-b).max():.3e} "
              f"rel={np.abs(a-b).max()/scale:.3e} (scale {scale:.2e})")
    for n, a, b in zip(order, gf, gx):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = np.abs(b).max() + 1e-12
        print(f"grad {n:5s} max|d|={np.abs(a-b).max():.3e} "
              f"rel={np.abs(a-b).max()/scale:.3e} (scale {scale:.2e})")


def time_fused(n_iter=30):
    """Wall time of the fused fwd+bwd at the probe shape (relative A/B
    between precision modes only — single-dispatch, tunnel-dominated, so
    compare the two numbers to each other, not to bench.py)."""
    args, z_vals, rays_d = _inputs(seed=0, saturate=False)
    dists = _dists(z_vals, rays_d)
    order = list(args.keys())

    def loss(*flat):
        a = dict(zip(order, flat))
        rgb, depth, acc, ldj = fused_flow_composite(
            a["z0_a"], a["r1_a"], a["r2_a"], a["b_a"],
            a["z0_r"], a["r1_r"], a["r2_r"], a["b_r"],
            z_vals.reshape(-1), dists.reshape(-1), S,
            compute_log_det=True, interpret=False,
        )
        return rgb.sum() + 0.3 * depth.sum() + 0.7 * acc.sum() + 0.11 * ldj.sum()

    flat = [args[k] for k in order]
    f = jax.jit(jax.value_and_grad(loss, argnums=tuple(range(8))))
    float(f(*flat)[0])  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n_iter):
        v, _ = f(*flat)
    float(v)  # value fetch as the timing fence
    dt = (time.perf_counter() - t0) / n_iter
    print(f"fused fwd+bwd: {dt * 1e3:.3f} ms/iter (n={n_iter})")


if __name__ == "__main__":
    for prec in (jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST):
        render_core.DOT_PRECISION = prec
        jax.clear_caches()
        print(f"\n########## DOT_PRECISION = {prec} ##########")
        run(saturate=False)
        run(saturate=True)
        time_fused()
