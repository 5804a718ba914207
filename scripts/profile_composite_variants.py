"""XLA reformulation candidates for the compositing hot spot, measured.

Variants of the transmittance scan at (R=2048, S=128, K=32):
  A. baseline        cumprod over axis -2 of (R, S, K)   [current raw2outputs]
  B. logspace        exp(cumsum(log(1 - alpha + eps)))   same axis
  C. transposed      cumprod over the MINOR axis of (R, K, S) + transposes
  D. logspace+trans  cumsum over the minor axis
  E. assoc_scan      jax.lax.associative_scan(mul) over axis 1

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_composite_variants.py
"""
from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

R, S, K = 2048, 128, 32
REPS = 20
EPS = 1e-10


def make_outputs(weights, rgb, z_vals):
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-3)
    depth = jnp.sum(weights * z_vals[..., None], axis=-2)
    acc = jnp.sum(weights, axis=-2)
    return rgb_map.mean() + depth.mean() + acc.mean()


def v_baseline(raw, z_vals, dists):
    rgb = jax.nn.sigmoid(raw[..., :3])
    alpha = 1.0 - jnp.exp(-jax.nn.softplus(raw[..., 3]) * dists[..., None])
    x = 1.0 - alpha + EPS
    trans = jnp.cumprod(x, axis=-2)
    trans = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=-2)
    return make_outputs(alpha * trans, rgb, z_vals)


def v_logspace(raw, z_vals, dists):
    rgb = jax.nn.sigmoid(raw[..., :3])
    alpha = 1.0 - jnp.exp(-jax.nn.softplus(raw[..., 3]) * dists[..., None])
    x = 1.0 - alpha + EPS
    lt = jnp.cumsum(jnp.log(x), axis=-2)
    trans = jnp.exp(lt)
    trans = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=-2)
    return make_outputs(alpha * trans, rgb, z_vals)


def v_transposed(raw, z_vals, dists):
    rgb = jax.nn.sigmoid(raw[..., :3])
    alpha = 1.0 - jnp.exp(-jax.nn.softplus(raw[..., 3]) * dists[..., None])
    x = 1.0 - alpha + EPS
    xt = jnp.swapaxes(x, -1, -2)  # (R, K, S) scan along minor axis
    trans = jnp.cumprod(xt, axis=-1)
    trans = jnp.swapaxes(trans, -1, -2)
    trans = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=-2)
    return make_outputs(alpha * trans, rgb, z_vals)


def v_logspace_t(raw, z_vals, dists):
    rgb = jax.nn.sigmoid(raw[..., :3])
    alpha = 1.0 - jnp.exp(-jax.nn.softplus(raw[..., 3]) * dists[..., None])
    x = 1.0 - alpha + EPS
    xt = jnp.swapaxes(jnp.log(x), -1, -2)
    trans = jnp.exp(jnp.swapaxes(jnp.cumsum(xt, axis=-1), -1, -2))
    trans = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=-2)
    return make_outputs(alpha * trans, rgb, z_vals)


def v_assoc(raw, z_vals, dists):
    rgb = jax.nn.sigmoid(raw[..., :3])
    alpha = 1.0 - jnp.exp(-jax.nn.softplus(raw[..., 3]) * dists[..., None])
    x = 1.0 - alpha + EPS
    trans = jax.lax.associative_scan(jnp.multiply, x, axis=1)
    trans = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=-2)
    return make_outputs(alpha * trans, rgb, z_vals)


def timed(fn, raw, z_vals, dists, grad):
    f = jax.grad(fn) if grad else fn
    red = (lambda o: o.mean()) if grad else (lambda o: o)

    @jax.jit
    def run(raw, z_vals, dists):
        def body(_, carry):
            return red(f(raw + carry * 1e-20, z_vals, dists))
        return jax.lax.fori_loop(0, REPS, body, 0.0)

    _ = float(run(raw, z_vals, dists))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run(raw, z_vals, dists))
        best = min(best, time.perf_counter() - t0)
    return best / REPS


def main():
    rng = np.random.RandomState(0)
    raw = jnp.asarray(rng.randn(R, S, K, 4), jnp.float32)
    z_vals = jnp.asarray(np.sort(rng.rand(R, S), -1) * 3.5 + 0.5, jnp.float32)
    dists = jnp.concatenate(
        [z_vals[..., 1:] - z_vals[..., :-1], jnp.full((R, 1), 10.0)], -1
    )
    variants = [
        ("baseline ", v_baseline),
        ("logspace ", v_logspace),
        ("transposed", v_transposed),
        ("logspace_t", v_logspace_t),
        ("assoc_scan", v_assoc),
    ]
    base = None
    for name, fn in variants:
        tf = timed(fn, raw, z_vals, dists, grad=False)
        tb = timed(fn, raw, z_vals, dists, grad=True)
        # numeric agreement with baseline
        val = float(fn(raw[:64], z_vals[:64], dists[:64]))
        if base is None:
            base = val
        print(f"{name}: fwd {tf*1e3:6.3f} ms   fwd+bwd {tb*1e3:6.3f} ms   "
              f"val-drift {abs(val-base):.2e}")


if __name__ == "__main__":
    main()
