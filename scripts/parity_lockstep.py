"""Deterministic LOCKSTEP parity vs the live torch reference (VERDICT r02
task 2 — the mechanistic half of PARITY_r05).

PARITY_r04 showed a consistent-sign end-metric gap (PSNR -0.74 dB, NLL
+0.6 nat, AUSE +0.015 over 3 seeds) that the blob protocol cannot resolve
against BASELINE's 0.1 dB band (seed std ~1.2 dB).  This script removes
EVERY stochastic degree of freedom and asks the sharp question: are the two
training pipelines mechanistically identical?

  * SAME INIT: torch NeRF_Flows init (manual_seed) ported to flax via
    tests/reference_harness.port_nerf_flows (the golden-test weight port).
  * SAME BATCHES: parity_experiment.precompute_batches (identical
    precompute + shuffle + slicing, reference :859-919 semantics).
  * SAME MONTE-CARLO DRAWS: one fixed eps buffer pair, drawn by torch under
    a pinned seed; the torch side re-seeds before every forward (its only
    per-step RNG consumption at perturb=0, raw_noise_std=0 — verified
    against run_nerf_uncertainty_NF.py:518-535,432-434), ours injects the
    same buffers through the model's eps seam.
  * SAME Z SCHEDULE: perturb=0 -> deterministic linspace both sides
    (reference :510-517).
  * SAME OPTIMIZER MATH: torch.optim.Adam vs optax.adam, both
    (lr, 0.9, 0.999, eps=1e-8).

With all inputs pinned, per-step losses must track to f32 accumulation
noise; any systematic implementation difference (loss term, grad path,
update rule) shows as immediate or consistent-sign drift.  Chaotic
amplification of float noise is expected to grow the delta EVENTUALLY —
the diagnostic is the horizon and the sign pattern, reported per step.

    PYTHONPATH=/root/repo python scripts/parity_lockstep.py \
        --steps 400 --out PARITY_r05_lockstep.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import parity_experiment as PX  # noqa: E402  (shared scene/batch machinery)

EPS_SEED = 7  # torch seed pinning the shared eps buffers (and re-seeded
              # before every reference forward so each step reuses them)


def run_lockstep(steps: int, seed: int, scene: str, log_every: int):
    import torch

    from reference_harness import install_reference, port_nerf_flows, ref_args

    ref_helpers, ref_models, _, ref_main = install_reference()

    # ---- scene + matched batches (parity_experiment machinery) ----
    if scene == "blob":
        from synthetic_scenes import blob_scene

        poses, images, geom = blob_scene()
        PX.H = PX.W = geom["H"]
        PX.FOCAL, PX.NEAR, PX.FAR = geom["focal"], geom["near"], geom["far"]
        n = len(poses)
        i_train = np.arange(n - 1)
    else:
        poses, images, i_train, _ = PX.make_scene()
    batches = PX.precompute_batches(poses, images, i_train, steps, seed=seed)

    K = PX.K
    torch.manual_seed(seed)
    args = ref_args(
        netdepth=PX.DEPTH, netwidth=PX.WIDTH, K_samples=K, skips=PX.SKIPS,
        h_alpha_size=PX.H_SIZE, h_rgb_size=PX.H_SIZE, n_flows=PX.N_FLOWS,
    )
    ref_model = ref_models.NeRF_Flows(args)

    # the shared eps buffers: exactly what the reference's train forward
    # draws first under EPS_SEED (alpha then rgb, golden-test replay order)
    torch.manual_seed(EPS_SEED)
    eps_a = torch.empty([K, 1]).normal_()
    eps_r = torch.empty([K, 3]).normal_()
    eps_a_np = eps_a.numpy().copy()
    eps_r_np = eps_r.numpy().copy()

    embed_fn, _ = ref_helpers.get_embedder(10, 0)
    embeddirs_fn, _ = ref_helpers.get_embedder(4, 0)
    query = lambda inputs, viewdirs, fn, is_val, is_test: ref_main.run_network(
        inputs, viewdirs, fn, is_val, is_test, embed_fn, embeddirs_fn, 65536
    )
    opt_ref = torch.optim.Adam(ref_model.parameters(), lr=PX.LR,
                               betas=(0.9, 0.999), eps=1e-8)

    # ---- ours: same params (ported), production render path, eps seam ----
    import jax
    import jax.numpy as jnp
    import optax

    from cfnerf_tpu.models.nerf_flows import NeRFFlows
    from cfnerf_tpu.render.renderer import RenderConfig, make_render_rays
    from cfnerf_tpu.train.loss import kde_nll

    model = NeRFFlows(
        net_depth=PX.DEPTH, net_width=PX.WIDTH, input_ch=63, input_ch_views=27,
        skips=tuple(PX.SKIPS), h_alpha_size=PX.H_SIZE, h_rgb_size=PX.H_SIZE,
        n_flows=PX.N_FLOWS, k_samples=K, use_viewdirs=True,
        type_flows="triangular",
    )
    params = port_nerf_flows(ref_model, PX.DEPTH)
    eps_j = (jnp.asarray(eps_a_np), jnp.asarray(eps_r_np))

    def model_apply(p, x, *, is_test, rng):
        # inject the pinned eps (closure constants -> single compile)
        return model.apply({"params": p}, x, is_test=is_test, rng=rng,
                           eps=eps_j)

    rc = RenderConfig(n_samples=PX.N_SAMPLES, perturb=False, use_viewdirs=True)
    rr = make_render_rays(model_apply, rc)
    tx = optax.adam(PX.LR, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = tx.init(params)
    fixed_key = jax.random.PRNGKey(0)  # consumed only by dead RNG branches

    near_j = jnp.full((PX.BATCH, 1), PX.NEAR)
    far_j = jnp.full((PX.BATCH, 1), PX.FAR)

    @jax.jit
    def our_step(params, opt_state, ro, rd, target):
        vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)

        def loss_fn(p):
            out = rr(p, ro, rd, vd, near_j, far_j, fixed_key, is_test=False)
            nll = kde_nll(out["rgb_map"], target, K)
            loss = nll + PX.BETA1 * out["loss_entropy"]
            mse = jnp.mean((out["rgb_map"].mean(-1) - target) ** 2)
            return loss, (nll, mse)

        (loss, (nll, mse)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, nll, mse

    # ---- lockstep loop ----
    import math

    import torch as T

    trace = []
    t0 = time.time()
    for step, (ro, rd, target) in enumerate(batches):
        # --- reference step (perturb=0, eps re-pinned) ---
        rd_t = T.from_numpy(rd)
        viewdirs = rd_t / T.norm(rd_t, dim=-1, keepdim=True)
        ray_batch = T.cat(
            [T.from_numpy(ro), rd_t,
             T.full((PX.BATCH, 1), PX.NEAR), T.full((PX.BATCH, 1), PX.FAR),
             viewdirs], -1)
        T.manual_seed(EPS_SEED)  # the forward's first (and only) RNG draws
        ret = ref_main.render_rays(
            ray_batch, ref_model, query, PX.N_SAMPLES, is_train=True,
            uniformsample=False, K_samples=K, perturb=0.0,
        )
        rgbs = ret["rgb_map"]
        target_t = T.from_numpy(target)
        eps_c, n = 1e-05, K  # the exact loss block :1031-1050
        rgb_std = T.std(rgbs, -1) * n / (n - 1)
        H_sqrt = rgb_std.detach() * T.pow(T.tensor(0.8 / n), T.tensor(-1 / 7)) + eps_c
        H_sqrt = H_sqrt[..., None]
        k1 = T.exp(-((rgbs - target_t[..., None]) ** 2) / (2 * H_sqrt * H_sqrt))
        k2 = T.pow(T.tensor(2 * math.pi), T.tensor(-1.5)) / H_sqrt
        loss_nll_ref = -T.log((k1 * k2).mean(-1) + eps_c).mean()
        loss_ref = loss_nll_ref + PX.BETA1 * ret["loss_entropy"].mean()
        opt_ref.zero_grad()
        loss_ref.backward()
        opt_ref.step()
        mse_ref = float(((rgbs.mean(-1) - target_t) ** 2).mean())

        if step == 0:
            # cross-side forward probe at the shared init: the golden
            # parity bound is ~1e-6; anything larger means the HARNESS
            # (not the frameworks) diverged — fail loudly
            vd0 = jnp.asarray(rd)
            vd0 = vd0 / jnp.linalg.norm(vd0, axis=-1, keepdims=True)
            out0 = rr(params, jnp.asarray(ro), jnp.asarray(rd), vd0,
                      near_j, far_j, fixed_key, is_test=False)
            rgb0_delta = float(np.abs(np.asarray(out0["rgb_map"])
                                      - rgbs.detach().numpy()).max())
            print(f"step-0 cross-side rgb max delta: {rgb0_delta:.3e}")
            if rgb0_delta > 1e-4:
                raise RuntimeError(
                    f"lockstep harness diverged at the shared init "
                    f"(rgb max delta {rgb0_delta:.3e} > 1e-4): the weight "
                    f"port, eps seam, or batch plumbing is broken — fix the "
                    f"harness before interpreting any trajectory"
                )

        # --- our step (same batch, same eps, same z) ---
        params, opt_state, loss_o, nll_o, mse_o = our_step(
            params, opt_state, jnp.asarray(ro), jnp.asarray(rd),
            jnp.asarray(target))
        loss_o, nll_o, mse_o = float(loss_o), float(nll_o), float(mse_o)

        rec = {
            "step": step,
            "loss_ref": float(loss_ref), "loss_ours": loss_o,
            "nll_ref": float(loss_nll_ref), "nll_ours": nll_o,
            "psnr_ref": -10 * np.log10(mse_ref),
            "psnr_ours": -10 * np.log10(mse_o),
        }
        rec["loss_delta"] = rec["loss_ours"] - rec["loss_ref"]
        rec["loss_rel"] = abs(rec["loss_delta"]) / max(abs(rec["loss_ref"]), 1e-8)
        trace.append(rec)
        if step % log_every == 0 or step == steps - 1:
            print(f"step {step:4d}  loss ref {rec['loss_ref']:+.6f} "
                  f"ours {rec['loss_ours']:+.6f}  rel {rec['loss_rel']:.2e}  "
                  f"psnr {rec['psnr_ref']:.2f}/{rec['psnr_ours']:.2f}",
                  flush=True)
    wall = time.time() - t0

    rels = np.array([r["loss_rel"] for r in trace])
    deltas = np.array([r["loss_delta"] for r in trace])
    horizon = {}
    for thr in (1e-4, 1e-3, 1e-2):
        idx = np.where(rels > thr)[0]
        horizon[f"first_step_rel_gt_{thr:g}"] = int(idx[0]) if len(idx) else None
    # sign consistency of the delta: a systematic difference drifts one way;
    # float-chaos is sign-balanced
    sign_frac_pos = float((deltas > 0).mean())
    return {
        "seed": seed,
        "wall_s": round(wall, 1),
        "horizon": horizon,
        "max_rel": float(rels.max()),
        "median_rel": float(np.median(rels)),
        "final_rel": float(rels[-1]),
        "delta_sign_frac_positive": sign_frac_pos,
        "psnr_final": {"ref": trace[-1]["psnr_ref"],
                       "ours": trace[-1]["psnr_ours"]},
        "trace_every": [r for r in trace
                        if r["step"] % log_every == 0 or r["step"] == len(trace) - 1],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--scene", choices=["spheres", "blob"], default="blob")
    ap.add_argument("--log_every", type=int, default=20)
    ap.add_argument("--out", default="PARITY_r05_lockstep.json")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)

    runs = []
    result = {
        "experiment": (
            "LOCKSTEP determinism parity (PARITY_r05, mechanistic half): "
            "same torch init (weight-ported), same ray batches, same pinned "
            "eps buffers, perturb=0 deterministic z schedule, matched Adam "
            "— per-step loss deltas between the live torch reference and "
            "cfnerf_tpu's production render path.  A systematic "
            "implementation difference shows as immediate or consistent-"
            "sign drift; f32 chaos shows as sign-balanced growth from "
            "~1e-6 relative."
        ),
        "config": dict(H=PX.H, W=PX.W, depth=PX.DEPTH, width=PX.WIDTH,
                       n_samples=PX.N_SAMPLES, k=PX.K, n_flows=PX.N_FLOWS,
                       h_size=PX.H_SIZE, lr=PX.LR, beta1=PX.BETA1,
                       batch=PX.BATCH, steps=args.steps, scene=args.scene),
        "runs": runs,
    }
    for seed in range(args.seeds):
        print(f"=== lockstep seed {seed} ===", flush=True)
        runs.append(run_lockstep(args.steps, seed, args.scene, args.log_every))
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
            f.write("\n")
    print(json.dumps([{k: r[k] for k in ("horizon", "max_rel", "median_rel",
                                         "delta_sign_frac_positive")}
                      for r in runs], indent=1))


if __name__ == "__main__":
    main()
