"""Benchmark: CF-NeRF training throughput in rays/sec/chip.

Runs the flagship configuration from the reference launch script
(/root/reference/train_NF.sh: D=8, W=512, N_samples=128 with the 96+32
schedule, K=32 Monte-Carlo draws, 4 triangular Sylvester flows,
h_alpha=h_rgb=64) as the single jitted train step, scanning the ray batch
size for the best sustained throughput on one chip, then prints ONE JSON
line.  vs_baseline is measured against the 1M rays/sec/chip north-star
from BASELINE.json (the reference publishes no benchmark numbers —
BASELINE.md).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def make_batch(R, rng):
    import jax.numpy as jnp

    return {
        "rays_o": jnp.asarray(rng.randn(R, 3), jnp.float32),
        "rays_d": jnp.asarray(
            np.concatenate([rng.randn(R, 2) * 0.05, -np.ones((R, 1))], -1),
            jnp.float32,
        ),
        "target": jnp.asarray(rng.rand(R, 3), jnp.float32),
    }


def bench_train(batch_size: int, *, steps: int = 20, warmup: int = 3,
                compute_dtype: str = "bfloat16", remat: bool = True,
                k_samples: int = 32, n_samples: int = 128) -> float:
    import jax
    import jax.numpy as jnp

    from cfnerf_tpu.models.nerf_flows import NeRFFlows
    from cfnerf_tpu.render.renderer import RenderConfig
    from cfnerf_tpu.train.step import TrainConfig, make_train_step

    model = NeRFFlows(
        net_depth=8, net_width=512, input_ch=63, input_ch_views=27,
        skips=(4,), h_alpha_size=64, h_rgb_size=64, n_flows=4,
        k_samples=k_samples, use_viewdirs=True, type_flows="triangular",
        compute_dtype=jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32,
    )
    rc = RenderConfig(n_samples=n_samples, perturb=True, use_viewdirs=True)
    tc = TrainConfig(
        H=512, W=512, focal=500.0, ndc=False, near=0.5, far=4.0,
        k_samples=k_samples, beta1=0.01, remat=remat,
    )
    train_step, tx = make_train_step(model, rc, tc, mesh=None)

    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 90), jnp.float32), is_test=True
    )["params"]
    opt_state = tx.init(params)

    rng_np = np.random.RandomState(0)
    batch = make_batch(batch_size, rng_np)
    key = jax.random.PRNGKey(1)

    # compile + warmup
    import jax.random as jrandom
    for i in range(warmup):
        key, k = jrandom.split(key)
        params, opt_state, metrics = train_step(params, opt_state, batch, k)
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    for i in range(steps):
        key, k = jrandom.split(key)
        params, opt_state, metrics = train_step(params, opt_state, batch, k)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0
    return batch_size * steps / dt


def main():
    results = {}
    best = 0.0
    best_cfg = None
    for batch_size in (512, 1024, 2048, 4096, 8192):
        try:
            rps = bench_train(batch_size)
            results[batch_size] = rps
            print(f"# batch={batch_size}: {rps:,.0f} rays/s", file=sys.stderr)
            if rps > best:
                best, best_cfg = rps, batch_size
            if rps < best * 0.7:  # throughput falling off — stop scanning
                break
        except Exception as e:  # OOM at this batch size
            print(f"# batch={batch_size}: failed ({type(e).__name__})", file=sys.stderr)
            break

    baseline = 1_000_000.0  # north-star rays/sec/chip (BASELINE.json)
    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": round(best, 1),
        "unit": "rays/s",
        "vs_baseline": round(best / baseline, 4),
        "config": f"D8 W512 N128 K32 flows4 bf16 remat batch={best_cfg}",
    }))


if __name__ == "__main__":
    main()
