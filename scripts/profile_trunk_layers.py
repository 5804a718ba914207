"""Per-layer trunk microbench: which matmul shapes pay for the 60-vs-71%
encode MFU gap?  Each layer shape is timed alone (fwd, bf16, B=262,144
rows) with carry-threaded inputs so XLA cannot hoist.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_trunk_layers.py
"""
from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

B = 262144
REPS = 30
PEAK = 197e12


def bench(fan_in, fan_out, split=None, relu=True, in_dtype=jnp.bfloat16):
    rng = np.random.RandomState(0)
    if split:
        xs = [jnp.asarray(rng.randn(B, s) * 0.1, in_dtype) for s in split]
        ws = [jnp.asarray(rng.randn(s, fan_out) * 0.05, jnp.bfloat16) for s in split]
    else:
        xs = [jnp.asarray(rng.randn(B, fan_in) * 0.1, in_dtype)]
        ws = [jnp.asarray(rng.randn(fan_in, fan_out) * 0.05, jnp.bfloat16)]
    b = jnp.asarray(rng.randn(fan_out) * 0.01, jnp.bfloat16)

    @jax.jit
    def run(xs, ws, b):
        def body(_, c):
            y = b
            for x, w in zip(xs, ws):
                y = y + jnp.dot(x + c * jnp.bfloat16(1e-8), w)
            if relu:
                y = jnp.maximum(y, 0)
            return y.astype(jnp.float32).mean()
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

    _ = float(run(xs, ws, b))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run(xs, ws, b))
        best = min(best, time.perf_counter() - t0)
    t = best / REPS
    flops = 2.0 * B * fan_in * fan_out
    print(f"  {str(split or fan_in):>12} -> {fan_out:4d}: {t*1e3:7.3f} ms  "
          f"{flops/t/PEAK*100:5.1f}% MFU")


def main():
    print(f"single bf16 matmul layers at B={B} rows (fwd, v5e):")
    bench(63, 512)                       # first layer (embed input)
    bench(64, 512)                       # padded variant for contrast
    bench(512, 512)                      # plain trunk layer
    bench(575, 512, split=(63, 512))     # skip layer (split matmul)
    bench(512, 576)                      # fused feature+h_alpha head
    bench(539, 256, split=(512, 27))     # views layer (split matmul)
    bench(256, 64)                       # h_rgb head
    print("  f32 input variants (cast cost):")
    bench(63, 512, in_dtype=jnp.float32)
    bench(512, 512, in_dtype=jnp.float32)


if __name__ == "__main__":
    main()
