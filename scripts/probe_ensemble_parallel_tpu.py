"""Real-TPU probe: ensemble-parallel (vmapped member axis) on ONE chip.

Question 1 — does the vmapped train step compile with the fused Pallas
render core (ops/pallas/render_core.py) on TPU?  pallas_call's vmap
batching rule adds a leading grid dimension; this has never been exercised
on real Mosaic before this probe.

Question 2 — what does member-stacking cost on one chip?  Ensemble members
are extra FLOPs, so per-member rate should be ~serial_rate / M if vmap adds
no overhead (the multi-chip speedup comes from the mesh, which the driver's
dryrun validates; this probe pins the single-chip baseline the scaling
claim divides by).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_ensemble_parallel_tpu.py
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import _build, _ray_batch
from cfnerf_tpu.parallel.ensemble import (
    make_ensemble_train_loop,
    member_keys,
    stack_members,
)
from cfnerf_tpu.train.step import make_train_loop

BATCH = 16384  # per member
N_INNER = 10
ROUNDS = 3


def _batches(batch_size, n_inner, seed=0):
    rng = np.random.RandomState(seed)
    ro, rd = _ray_batch(batch_size * n_inner, rng)
    return {
        "rays_o": ro.reshape(n_inner, batch_size, 3),
        "rays_d": rd.reshape(n_inner, batch_size, 3),
        "target": jnp.asarray(
            rng.rand(n_inner, batch_size, 3), jnp.float32
        ),
    }


def main():
    print("backend:", jax.default_backend(), jax.devices())
    # student point: W384 N48 K32 (CLAUDE.md r05) — the recommended recipe
    model, rc, tc, params = _build(remat=False, n_samples=48,
                                   k_samples=32, net_width=384, net_depth=8)

    # --- serial arm ---
    loop, tx = make_train_loop(model, rc, tc, mesh=None, n_inner=N_INNER)
    opt = tx.init(params)
    b = _batches(BATCH, N_INNER)
    key = jax.random.PRNGKey(1)
    p, o, m = loop(params, opt, b, key)
    _ = float(m["loss"][-1])
    serial = []
    for _i in range(ROUNDS):
        t0 = time.perf_counter()
        p, o, m = loop(p, o, b, key)
        _ = float(m["loss"][-1])
        serial.append(BATCH * N_INNER / (time.perf_counter() - t0))
    print(f"serial 1-member: {max(serial):,.0f} rays/s "
          f"(spread {100*(max(serial)-min(serial))/np.mean(serial):.1f}%)")

    # --- ensemble arm, M=2, same per-member batch ---
    M = 2
    plist = [params, jax.device_get(model.init(
        jax.random.PRNGKey(9), jnp.zeros((2, 90), jnp.float32), is_test=True
    )["params"])]
    eloop, etx = make_ensemble_train_loop(model, rc, tc, None, n_inner=N_INNER)
    pe = jax.tree_util.tree_map(jnp.asarray, stack_members(plist))
    oe = jax.vmap(etx.init)(pe)
    be = {k: jnp.stack([v] * M, axis=1) for k, v in b.items()}  # (n_inner, M, R, 3)
    keys = member_keys([jax.random.PRNGKey(10 + i) for i in range(M)])
    t_c = time.perf_counter()
    pe, oe, me = eloop(pe, oe, be, keys)
    _ = float(me["loss"][-1].sum())
    print(f"ensemble compile+first dispatch: {time.perf_counter()-t_c:.1f}s; "
          f"member losses {np.asarray(me['loss'][-1]).round(3).tolist()}")
    ens = []
    for _i in range(ROUNDS):
        t0 = time.perf_counter()
        pe, oe, me = eloop(pe, oe, be, keys)
        _ = float(me["loss"][-1].sum())
        ens.append(M * BATCH * N_INNER / (time.perf_counter() - t0))
    per_member = max(ens) / M
    print(f"ensemble M={M}: {max(ens):,.0f} total rays/s, "
          f"{per_member:,.0f}/member "
          f"({100*per_member/ (max(serial)/1):.1f}% of serial... "
          f"ideal = {100/M:.0f}% x2)")
    out = {
        "serial_rays_per_sec": max(serial),
        "ensemble_total_rays_per_sec": max(ens),
        "ensemble_per_member_rays_per_sec": per_member,
        "vmap_efficiency_pct": 100 * max(ens) / max(serial),
        "config": dict(W=384, N=48, K=32, batch_per_member=BATCH,
                       n_inner=N_INNER, M=M, fused="on"),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
