"""Convergence + parity experiment vs the live PyTorch reference.

Trains cfnerf_tpu AND the actual reference (torch-cpu, imported from
/root/reference) on the SAME synthetic scene with MATCHED ray batches
(identical precompute + shuffle + slicing), same tiny config, same loss
weights; records both loss trajectories and held-out PSNR, then reports the
repo's PSNR / NLL / AUSE on the held-out views.  Output: PARITY_r02.json
(VERDICT.md round-1 task 3 — numbers, not machinery).

Run on CPU so both sides share a platform:
    PYTHONPATH=/root/repo python scripts/parity_experiment.py \
        --out PARITY_r02.json --steps 600

Config: D=4 / W=64 / N=128 (the reference's z-schedule is hardcoded to
128) / K=8 / 2 triangular flows / h=16 / lr (see LR) / beta1=0.01 / 256
rays/step.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

# ---- experiment config (shared by both frameworks) ----
H = W = 32
FOCAL = 32.0
N_TRAIN, N_VAL = 6, 2
DEPTH, WIDTH = 4, 64
SKIPS = [2]
N_SAMPLES, K = 128, 8
N_FLOWS, H_SIZE = 2, 16
# the reference default 5e-4 is tuned for its 100k-step schedule
# (run_nerf_uncertainty_NF.py:596); this short-schedule experiment scales
# the lr up for BOTH frameworks equally so learning is visible in ~1k steps
LR, BETA1 = 5e-3, 0.01
BATCH = 256
NEAR, FAR = 2.0, 8.0


def make_scene():
    """Ring of cameras looking at the analytic two-sphere scene."""
    from demo_synthetic import ray_trace_scene  # scripts/demo_synthetic.py

    sys.path.insert(0, os.path.dirname(__file__))
    from cfnerf_tpu.ops.rays import get_rays_np

    poses, images = [], []
    n = N_TRAIN + N_VAL
    for i in range(n):
        th = 2 * np.pi * i / n
        origin = np.array([4.5 * np.sin(th), 0.8, 4.5 * np.cos(th)])
        fwd = origin / np.linalg.norm(origin)  # backward axis (looks at 0)
        right = np.cross([0.0, 1.0, 0.0], fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        c2w = np.stack([right, up, fwd, origin], 1).astype(np.float32)
        ro, rd = get_rays_np(H, W, FOCAL, c2w)
        img = ray_trace_scene(ro.reshape(-1, 3), rd.reshape(-1, 3))
        poses.append(c2w)
        images.append(img.reshape(H, W, 3).astype(np.float32))
    idx = np.arange(n)
    return np.stack(poses), np.stack(images), idx[:N_TRAIN], idx[N_TRAIN:]


def precompute_batches(poses, images, i_train, n_steps, seed=0):
    """Matched ray batches: [(ro, rd, rgb)] per step, identical for both
    frameworks (same precompute + shuffle as the reference :859-919)."""
    from cfnerf_tpu.ops.rays import get_rays_np

    rays = []
    for i in i_train:
        ro, rd = get_rays_np(H, W, FOCAL, poses[i])
        rays.append(np.concatenate(
            [ro.reshape(-1, 3), rd.reshape(-1, 3), images[i].reshape(-1, 3)], -1
        ))
    flat = np.concatenate(rays, 0).astype(np.float32)
    rng = np.random.RandomState(seed)
    rng.shuffle(flat)
    batches = []
    ptr = 0
    for _ in range(n_steps):
        if ptr + BATCH > len(flat):
            rng.shuffle(flat)
            ptr = 0
        b = flat[ptr : ptr + BATCH]
        ptr += BATCH
        batches.append((b[:, :3], b[:, 3:6], b[:, 6:9]))
    return batches


# --------------------------------------------------------------------- #
# Reference trainer (torch-cpu, actual /root/reference code)
# --------------------------------------------------------------------- #

def train_reference(batches, poses, images, i_val, steps, log_every, seed=0):
    import torch

    from reference_harness import install_reference, ref_args

    ref_helpers, ref_models, _, ref_main = install_reference()

    args = ref_args(
        netdepth=DEPTH, netwidth=WIDTH, K_samples=K, skips=SKIPS,
        h_alpha_size=H_SIZE, h_rgb_size=H_SIZE, n_flows=N_FLOWS,
    )
    torch.manual_seed(seed)
    model = ref_models.NeRF_Flows(args)
    embed_fn, _ = ref_helpers.get_embedder(10, 0)
    embeddirs_fn, _ = ref_helpers.get_embedder(4, 0)
    query = lambda inputs, viewdirs, fn, is_val, is_test: ref_main.run_network(
        inputs, viewdirs, fn, is_val, is_test, embed_fn, embeddirs_fn, 65536
    )
    opt = torch.optim.Adam(model.parameters(), lr=LR, betas=(0.9, 0.999))

    losses, psnrs = [], []
    for step, (ro, rd, target) in enumerate(batches[:steps]):
        rd_t = torch.from_numpy(rd)
        viewdirs = rd_t / torch.norm(rd_t, dim=-1, keepdim=True)
        ray_batch = torch.cat(
            [torch.from_numpy(ro), rd_t,
             torch.full((BATCH, 1), NEAR), torch.full((BATCH, 1), FAR),
             viewdirs], -1,
        )
        ret = ref_main.render_rays(
            ray_batch, model, query, N_SAMPLES, is_train=True,
            uniformsample=False, K_samples=K, perturb=1.0,
        )
        rgbs = ret["rgb_map"]  # (R, 3, K)
        target_t = torch.from_numpy(target)
        # the exact loss block :1031-1050
        eps, n = 1e-05, K
        rgb_std = torch.std(rgbs, -1) * n / (n - 1)
        H_sqrt = rgb_std.detach() * torch.pow(torch.tensor(0.8 / n), torch.tensor(-1 / 7)) + eps
        H_sqrt = H_sqrt[..., None]
        k1 = torch.exp(-((rgbs - target_t[..., None]) ** 2) / (2 * H_sqrt * H_sqrt))
        k2 = torch.pow(torch.tensor(2 * math.pi), torch.tensor(-1.5)) / H_sqrt
        loss_nll = -torch.log((k1 * k2).mean(-1) + eps).mean()
        loss = loss_nll + BETA1 * ret["loss_entropy"].mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        if step % log_every == 0 or step == steps - 1:
            mse = float(((rgbs.mean(-1) - target_t) ** 2).mean())
            losses.append({"step": step, "loss": float(loss),
                           "nll": float(loss_nll), "psnr": -10 * np.log10(mse)})
            print(f"[ref ] step {step:4d} loss {float(loss):+.4f} "
                  f"psnr {losses[-1]['psnr']:.2f}")

    # held-out eval (test mode: fixed eps, no jitter) — K-sample images fed
    # through the SAME metric path as ours (VERDICT r01 task 2: the
    # reference-side NLL/AUSE anchor must share one implementation)
    from cfnerf_tpu.ops.rays import get_rays_np

    with torch.no_grad():
        rgb_ks, gts = [], []
        for vi in i_val:
            ro, rd = get_rays_np(H, W, FOCAL, poses[vi])
            ro = ro.reshape(-1, 3).astype(np.float32)
            rd = rd.reshape(-1, 3).astype(np.float32)
            rd_t = torch.from_numpy(rd)
            viewdirs = rd_t / torch.norm(rd_t, dim=-1, keepdim=True)
            rb = torch.cat([torch.from_numpy(ro), rd_t,
                            torch.full((len(ro), 1), NEAR),
                            torch.full((len(ro), 1), FAR), viewdirs], -1)
            outs = []
            for c in range(0, len(ro), 1024):
                ret = ref_main.render_rays(
                    rb[c : c + 1024], model, query, N_SAMPLES, is_train=False,
                    uniformsample=False, K_samples=K, perturb=0.0,
                )
                outs.append(ret["rgb_map"])
            rgb_ks.append(torch.cat(outs, 0).numpy().reshape(H, W, 3, K))
            gts.append(images[vi])
    psnr, nll, au = shared_val_metrics(rgb_ks, gts)
    return losses, psnr, nll, au


def shared_val_metrics(rgb_ks, gts):
    """One metric path for BOTH frameworks: held-out PSNR (of the K-mean
    image), per-pixel KDE NLL (cli.eval.kde_nll_per_pixel — the reference's
    own bandwidth rule, run_nerf_uncertainty_NF.py:1031-1042), and AUSE of
    the std-over-K variance vs squared error (run_nerf_helpers.py:382-438).
    rgb_ks: list of (H, W, 3, K) arrays; gts: list of (H, W, 3)."""
    from cfnerf_tpu.cli.eval import kde_nll_per_pixel
    from cfnerf_tpu.ops.metrics import ause, std_over_k

    psnrs, nlls, auses = [], [], []
    for rgb_k, gt in zip(rgb_ks, gts):
        k = rgb_k.shape[-1]
        mse = float(((rgb_k.mean(-1) - gt) ** 2).mean())
        psnrs.append(-10 * np.log10(mse))
        nlls.append(float(kde_nll_per_pixel(rgb_k, gt, k).mean()))
        err = ((rgb_k.mean(-1) - gt) ** 2).mean(-1).reshape(-1)
        var = (std_over_k(rgb_k) ** 2).mean(-1).reshape(-1)
        auses.append(ause(var, err))
    return float(np.mean(psnrs)), float(np.mean(nlls)), float(np.mean(auses))


# --------------------------------------------------------------------- #
# cfnerf_tpu trainer (CPU, same batches)
# --------------------------------------------------------------------- #

def train_ours(batches, poses, images, i_val, steps, log_every, seed=0,
               matched_init=False):
    import jax
    import jax.numpy as jnp

    from cfnerf_tpu.models.nerf_flows import NeRFFlows
    from cfnerf_tpu.render.renderer import RenderConfig, make_render_rays, render_image
    from cfnerf_tpu.train.step import TrainConfig, make_train_step

    model = NeRFFlows(
        net_depth=DEPTH, net_width=WIDTH, input_ch=63, input_ch_views=27,
        skips=tuple(SKIPS), h_alpha_size=H_SIZE, h_rgb_size=H_SIZE,
        n_flows=N_FLOWS, k_samples=K, use_viewdirs=True,
        type_flows="triangular",
    )
    rc = RenderConfig(n_samples=N_SAMPLES, perturb=True, use_viewdirs=True)
    tc = TrainConfig(H=H, W=W, focal=FOCAL, ndc=False, near=NEAR, far=FAR,
                     k_samples=K, lrate=LR, beta1=BETA1)
    step_fn, tx = make_train_step(model, rc, tc)
    if matched_init:
        # SAME weights as the reference arm: replicate train_reference's
        # construction order exactly (args -> manual_seed -> model) and
        # port via the golden-test weight port (removes init variance —
        # the dominant seed-noise term in PARITY_r04, ref PSNR std 1.2 dB)
        import torch

        from reference_harness import install_reference, port_nerf_flows, ref_args

        _, ref_models, _, _ = install_reference()
        ref_args_ = ref_args(
            netdepth=DEPTH, netwidth=WIDTH, K_samples=K, skips=SKIPS,
            h_alpha_size=H_SIZE, h_rgb_size=H_SIZE, n_flows=N_FLOWS,
        )
        torch.manual_seed(seed)
        params = port_nerf_flows(ref_models.NeRF_Flows(ref_args_), DEPTH)
    else:
        params = model.init(
            jax.random.PRNGKey(1000 + seed), jnp.zeros((2, 90)), is_test=True
        )["params"]
    opt_state = tx.init(params)
    rng = jax.random.PRNGKey(2000 + seed)

    losses = []
    for step, (ro, rd, target) in enumerate(batches[:steps]):
        rng, k1 = jax.random.split(rng)
        batch = {"rays_o": jnp.asarray(ro), "rays_d": jnp.asarray(rd),
                 "target": jnp.asarray(target)}
        params, opt_state, metrics = step_fn(params, opt_state, batch, k1)
        if step % log_every == 0 or step == steps - 1:
            losses.append({"step": step, "loss": float(metrics["loss"]),
                           "nll": float(metrics["loss_nll"]),
                           "psnr": float(metrics["psnr"])})
            print(f"[ours] step {step:4d} loss {losses[-1]['loss']:+.4f} "
                  f"psnr {losses[-1]['psnr']:.2f}")

    def model_apply(p, x, *, is_test, rng):
        return model.apply({"params": p}, x, is_test=is_test, rng=rng)

    rr = make_render_rays(model_apply, rc)
    rgb_ks, gts = [], []
    for vi in i_val:
        out = render_image(rr, params, jnp.asarray(poses[vi]), H=H, W=W,
                           focal=FOCAL, ndc=False, use_viewdirs=True,
                           near=NEAR, far=FAR, tile=1024)
        rgb_ks.append(np.asarray(out["rgb_map"]))
        gts.append(images[vi])
    psnr, nll, au = shared_val_metrics(rgb_ks, gts)
    return losses, psnr, nll, au


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--lr", type=float, default=None,
                    help="override the shared lr (default: module LR)")
    ap.add_argument("--ref_seed", type=int, default=0)
    ap.add_argument("--seeds", type=int, default=1,
                    help="number of seeds PER SIDE (ref_seed..ref_seed+n-1);"
                         " each seed re-seeds init, train RNG, and the "
                         "matched batch shuffle for BOTH frameworks, so the"
                         " summary carries seed-to-seed error bars "
                         "(VERDICT r01 task 2)")
    ap.add_argument("--scene", choices=["spheres", "blob"], default="spheres",
                    help="spheres: bistable surface scene (trajectory "
                         "parity); blob: robustly-learnable volumetric "
                         "scene (learning parity)")
    ap.add_argument("--skip_ours", action="store_true")
    ap.add_argument("--matched_init", action="store_true",
                    help="initialize OUR model from the reference's torch "
                         "init at the same seed (golden-test weight port) — "
                         "removes init variance so seed spread reflects only "
                         "per-step RNG (eps draws, stratified jitter); the "
                         "PARITY_r05 protocol")
    ap.add_argument("--log_every", type=int, default=25)
    ap.add_argument("--out", type=str, default="PARITY_r02.json")
    args = ap.parse_args()

    # force the CPU platform so both frameworks share it
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

    global LR, H, W, FOCAL, NEAR, FAR
    if args.lr is not None:
        LR = args.lr

    if args.scene == "blob":
        from synthetic_scenes import blob_scene

        global N_TRAIN, N_VAL
        poses, images, geom = blob_scene()
        H = W = geom["H"]
        FOCAL, NEAR, FAR = geom["focal"], geom["near"], geom["far"]
        n = len(poses)
        N_TRAIN, N_VAL = n - 1, 1
        i_train, i_val = np.arange(n - 1), np.arange(n - 1, n)
    else:
        poses, images, i_train, i_val = make_scene()

    seeds = list(range(args.ref_seed, args.ref_seed + args.seeds))
    per_seed = []
    result = {
        "experiment": f"synthetic {args.scene} scene, matched ray batches"
                      + (", MATCHED INIT (torch init weight-ported to ours)"
                         if args.matched_init else "")
                      + f", {args.seeds} seed(s) per side, CPU; PSNR/NLL/AUSE "
                      "computed through ONE shared metric path "
                      "(shared_val_metrics) for both frameworks",
        "config": dict(H=H, W=W, n_train=N_TRAIN, n_val=N_VAL, depth=DEPTH,
                       width=WIDTH, n_samples=N_SAMPLES, k_samples=K,
                       n_flows=N_FLOWS, h_size=H_SIZE, lr=LR, beta1=BETA1,
                       batch=BATCH, steps=args.steps, seeds=seeds,
                       scene=args.scene, matched_init=args.matched_init),
        "per_seed": per_seed,
    }

    def flush():
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)

    for seed in seeds:
        batches = precompute_batches(poses, images, i_train, args.steps,
                                     seed=seed)
        entry = {"seed": seed}
        if not args.skip_ours:
            t0 = time.time()
            traj, psnr, nll, au = train_ours(
                batches, poses, images, i_val, args.steps, args.log_every,
                seed=seed, matched_init=args.matched_init,
            )
            entry["ours"] = {"val_psnr": psnr, "val_nll": nll,
                             "val_ause": au, "trajectory": traj,
                             "wall_s": round(time.time() - t0, 1)}
            per_seed.append(entry)
            flush()
        t0 = time.time()
        traj, psnr, nll, au = train_reference(
            batches, poses, images, i_val, args.steps, args.log_every,
            seed=seed,
        )
        entry["reference"] = {"val_psnr": psnr, "val_nll": nll,
                              "val_ause": au, "trajectory": traj,
                              "wall_s": round(time.time() - t0, 1)}
        if entry not in per_seed:
            per_seed.append(entry)
        flush()
        print(f"[seed {seed}] done: "
              + json.dumps({k: {m: round(v, 3) for m, v in entry[k].items()
                                if m.startswith('val_')}
                            for k in ("ours", "reference") if k in entry}))

    def stats(side, metric):
        vals = [e[side][f"val_{metric}"] for e in per_seed if side in e]
        return (float(np.mean(vals)), float(np.std(vals)), vals) if vals else (None, None, [])

    summary = {}
    for metric in ("psnr", "nll", "ause"):
        om, os_, ov = stats("ours", metric)
        rm, rs, rv = stats("reference", metric)
        summary[metric] = {
            "ours_mean": om, "ours_std": os_, "ours_values": ov,
            "ref_mean": rm, "ref_std": rs, "ref_values": rv,
            "delta_mean": None if om is None or rm is None else round(om - rm, 4),
        }
    if summary["psnr"]["delta_mean"] is not None:
        # BASELINE.md targets: PSNR within 0.1 dB (or ahead), NLL parity
        # (or better; parity band = pooled seed spread, floored at 0.1 nat),
        # judged on seed means
        d_psnr = summary["psnr"]["delta_mean"]
        d_nll = summary["nll"]["delta_mean"]
        pooled = max(0.1, float(np.hypot(summary["nll"]["ours_std"] or 0.0,
                                         summary["nll"]["ref_std"] or 0.0)))
        summary["baseline_call"] = {
            "psnr_pass": bool(d_psnr >= -0.1),
            "psnr_criterion": "ours_mean >= ref_mean - 0.1 dB",
            "nll_pass": bool(d_nll <= pooled),
            "nll_criterion": f"ours_mean <= ref_mean + pooled seed spread ({pooled:.3f} nats)",
            "ause_delta": summary["ause"]["delta_mean"],
        }
    result["summary"] = summary
    flush()
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
