"""Segment timing of the flagship train step (post-fusion breakdown).

Times, at R=2048 rays (B=262,144 points), each with device-resident
repetition and value fences:
  embed       positional encoding fwd (never differentiated)
  encode      trunk+heads fwd and fwd+bwd (param grads)
  model       forward_composited fwd / fwd+bwd (encode + amortize +
              fused flow/composite kernel + entropy)
  step        the full train step (adds KDE loss + Adam)

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_step.py
"""
from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from cfnerf_tpu.models.nerf_flows import NeRFFlows
from cfnerf_tpu.ops.embed import Embedder
from cfnerf_tpu.render.renderer import RenderConfig
from cfnerf_tpu.train.step import TrainConfig, make_train_loop

R, S, K = 2048, 128, 32
B = R * S
REPS = 10


def timed(run, *args):
    _ = float(run(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / REPS * 1e3  # ms


def loop_of(f, x0):
    @jax.jit
    def run(*args):
        def body(_, c):
            return f(*args, c)
        return jax.lax.fori_loop(0, REPS, body, x0)
    return run


def main():
    rng = np.random.RandomState(0)
    model = NeRFFlows(
        net_depth=8, net_width=512, input_ch=63, input_ch_views=27,
        skips=(4,), h_alpha_size=64, h_rgb_size=64, n_flows=4,
        k_samples=K, use_viewdirs=True, type_flows="triangular",
        compute_dtype=jnp.bfloat16,
        flow_impl="pallas" if jax.default_backend() == "tpu" else "xla",
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 90), jnp.float32), is_test=True
    )["params"]

    pts = jnp.asarray(rng.randn(B, 3), jnp.float32)
    emb_fn = Embedder(num_freqs=10, max_freq_log2=9)
    embd_fn = Embedder(num_freqs=4, max_freq_log2=3)

    x = jnp.concatenate(
        [emb_fn(pts), jnp.broadcast_to(embd_fn(pts[:R])[:, None, :],
                                       (R, S, 27)).reshape(B, 27)], -1)
    z_pts = jnp.asarray(np.sort(rng.rand(R, S), -1).ravel() * 3.5 + 0.5,
                        jnp.float32)
    d_pts = jnp.asarray(rng.rand(B) * 0.05 + 0.01, jnp.float32)

    # --- embed fwd ---
    run = loop_of(lambda p, c: emb_fn(p + c * 1e-20).mean(), 0.0)
    print(f"embed fwd          : {timed(run, pts):7.3f} ms")

    # --- encode ---
    def enc(params, x):
        ha, hr = model.apply({"params": params}, x, method=NeRFFlows.encode)
        return ha.mean() + hr.mean()

    run = loop_of(lambda p, xx, c: enc(p, xx + c * 1e-20), 0.0)
    print(f"encode fwd         : {timed(run, params, x):7.3f} ms")
    g = jax.grad(enc)

    def gsum(gt):
        # fence through EVERY leaf: a single leaf can be a zero-gradient
        # param (alpha_mean does not affect encode) and XLA DCEs the loop
        return sum(l.sum() for l in jax.tree_util.tree_leaves(gt))

    run = loop_of(lambda p, xx, c: gsum(g(p, xx + c * 1e-20)), 0.0)
    print(f"encode fwd+bwd     : {timed(run, params, x):7.3f} ms")

    # --- full model forward_composited ---
    def fwd(params, x, key):
        rgb, depth, acc, ent = model.apply(
            {"params": params}, x, z_pts, d_pts, S,
            is_test=False, rng=key, method=NeRFFlows.forward_composited,
        )
        return rgb.mean() + depth.mean() + 0.01 * ent

    key = jax.random.PRNGKey(1)
    run = loop_of(lambda p, xx, c: fwd(p, xx + c * 1e-20, key), 0.0)
    print(f"model fwd          : {timed(run, params, x):7.3f} ms")
    gm = jax.grad(fwd)
    run = loop_of(lambda p, xx, c: gsum(gm(p, xx + c * 1e-20, key)), 0.0)
    print(f"model fwd+bwd      : {timed(run, params, x):7.3f} ms")

    # --- full train step (scan trainer, n_inner=REPS) ---
    rc = RenderConfig(n_samples=S, perturb=True, use_viewdirs=True, fused="on"
                      if jax.default_backend() == "tpu" else "off")
    tc = TrainConfig(H=512, W=512, focal=500.0, ndc=False, near=0.5, far=4.0,
                     k_samples=K, beta1=0.01)
    train_loop, tx = make_train_loop(model, rc, tc, mesh=None, n_inner=REPS)
    opt_state = tx.init(params)
    ro = jnp.asarray(rng.randn(REPS, R, 3), jnp.float32)
    rd = jnp.asarray(
        np.concatenate([rng.randn(REPS, R, 2) * 0.05, -np.ones((REPS, R, 1))], -1),
        jnp.float32)
    batches = {"rays_o": ro, "rays_d": rd,
               "target": jnp.asarray(rng.rand(REPS, R, 3), jnp.float32)}

    def run_step(params, opt_state):
        p, o, m = train_loop(params, opt_state, batches, jax.random.PRNGKey(2))
        return m["loss"][-1]

    run = jax.jit(run_step)
    print(f"train step (full)  : {timed(run, params, opt_state):7.3f} ms")


if __name__ == "__main__":
    main()
