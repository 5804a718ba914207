"""End-to-end demo: train CF-NeRF on a procedurally rendered 3D scene and
report PSNR + uncertainty quality on held-out views.

Fabricates a blender-format dataset of an analytically ray-traced scene
(two lambertian spheres on white background), trains the flagship model
(scaled for the demo), then runs the paper-grade eval.  Works on TPU or
the virtual CPU mesh.

    PYTHONPATH=. python scripts/demo_synthetic.py --outdir /tmp/cfnerf_demo
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def ray_trace_scene(rays_o, rays_d):
    """Analytic render: two diffuse spheres + white background."""
    spheres = [
        (np.array([0.0, 0.0, 0.0]), 1.0, np.array([0.9, 0.25, 0.2])),
        (np.array([0.9, 0.6, 0.7]), 0.45, np.array([0.2, 0.4, 0.9])),
    ]
    light = np.array([2.0, 3.0, 1.5])
    light = light / np.linalg.norm(light)

    color = np.ones((*rays_o.shape[:-1], 3), np.float32)
    depth = np.full(rays_o.shape[:-1], np.inf, np.float32)
    d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    for center, radius, albedo in spheres:
        oc = rays_o - center
        b = np.sum(oc * d, -1)
        c = np.sum(oc * oc, -1) - radius ** 2
        disc = b * b - c
        hit = disc > 0
        t = -b - np.sqrt(np.maximum(disc, 0))
        hit &= t > 1e-3
        closer = hit & (t < depth)
        p = rays_o + d * t[..., None]
        n = (p - center) / radius
        lam = np.clip(np.sum(n * light, -1), 0.1, 1.0)
        shaded = albedo[None] * lam[..., None]
        color = np.where(closer[..., None], shaded, color)
        depth = np.where(closer, t, depth)
    return color.astype(np.float32)


def ray_trace_clutter(rays_o, rays_d):
    """Analytic CLUTTERED scene (VERDICT r03 task 6 — the defense against
    single-scene frontier tuning): eight spheres of mixed sizes with real
    mutual occlusion, procedural surface texture (checker ground sphere,
    stripe/dot/marble sphere albedos), and cast shadows from a directional
    light.  Deterministic, vectorized numpy, white background — same
    contract as ray_trace_scene."""
    # (center, radius, texture id) — texture ids: 0 checker, 1 stripes,
    # 2 dots, 3 marble, 4+ flat albedo variants
    prims = [
        (np.array([0.0, -31.0, 0.0]), 30.0, 0),    # ground: giant checker sphere
        (np.array([0.0, 0.0, 0.0]), 1.0, 3),       # central marble
        (np.array([1.5, -0.55, 0.9]), 0.45, 1),    # striped, leaning on ground
        (np.array([-1.3, -0.4, 0.8]), 0.6, 2),     # dotted
        (np.array([0.8, 0.75, -0.9]), 0.5, 4),     # flat blue, partly hidden
        (np.array([-0.9, 0.9, -0.6]), 0.35, 5),    # flat amber, high
        (np.array([0.15, -0.75, 1.6]), 0.25, 6),   # small green, foreground
        (np.array([-0.4, 0.1, 1.25]), 0.3, 1),     # striped occluder in front
    ]
    light = np.array([2.0, 3.5, 1.2])
    light = light / np.linalg.norm(light)

    def albedo_at(p, n, tex):
        if tex == 0:  # checker on the ground: smooth (anti-aliasable) tiles
            cx = np.sin(np.pi * p[..., 0] * 1.5) * np.sin(np.pi * p[..., 2] * 1.5)
            t = 0.5 + 0.5 * np.tanh(cx * 8.0)
            a = np.stack([0.85 - 0.55 * t, 0.8 - 0.35 * t, 0.75 - 0.15 * t], -1)
        elif tex == 1:  # stripes
            s = 0.5 + 0.5 * np.tanh(np.sin((p[..., 0] + 2 * p[..., 1]) * 9.0) * 6.0)
            a = np.stack([0.9 * s + 0.15 * (1 - s), 0.3 * np.ones_like(s),
                          0.2 * s + 0.8 * (1 - s)], -1)
        elif tex == 2:  # dots via 3D sinusoidal cells
            c = (np.sin(p[..., 0] * 11) * np.sin(p[..., 1] * 11)
                 * np.sin(p[..., 2] * 11))
            t = 0.5 + 0.5 * np.tanh(c * 10.0)
            a = np.stack([0.2 + 0.6 * t, 0.55 * np.ones_like(t),
                          0.25 + 0.35 * (1 - t)], -1)
        elif tex == 3:  # marble-ish: normal-modulated phase noise
            m = np.sin(4.0 * p[..., 0] + 3.0 * np.sin(3.0 * p[..., 1])
                       + 2.0 * np.sin(5.0 * p[..., 2]))
            t = 0.5 + 0.5 * m
            a = np.stack([0.85 * t + 0.35 * (1 - t), 0.3 + 0.45 * t,
                          0.25 + 0.2 * t], -1)
        elif tex == 4:
            a = np.broadcast_to(np.array([0.2, 0.4, 0.9]), p.shape).copy()
        elif tex == 5:
            a = np.broadcast_to(np.array([0.95, 0.65, 0.15]), p.shape).copy()
        else:
            a = np.broadcast_to(np.array([0.2, 0.75, 0.35]), p.shape).copy()
        return a.astype(np.float32)

    d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    color = np.ones((*rays_o.shape[:-1], 3), np.float32)
    depth = np.full(rays_o.shape[:-1], np.inf, np.float32)
    hit_p = np.zeros_like(color)
    hit_n = np.zeros_like(color)
    hit_tex = np.full(rays_o.shape[:-1], -1, np.int32)
    for center, radius, tex in prims:
        oc = rays_o - center
        b = np.sum(oc * d, -1)
        c = np.sum(oc * oc, -1) - radius ** 2
        disc = b * b - c
        hit = disc > 0
        t = -b - np.sqrt(np.maximum(disc, 0))
        hit &= t > 1e-3
        closer = hit & (t < depth)
        p = rays_o + d * t[..., None]
        n = (p - center) / radius
        hit_p = np.where(closer[..., None], p, hit_p)
        hit_n = np.where(closer[..., None], n, hit_n)
        hit_tex = np.where(closer, tex, hit_tex)
        depth = np.where(closer, t, depth)

    surf = hit_tex >= 0
    lam = np.clip(np.sum(hit_n * light, -1), 0.12, 1.0)
    # cast shadows: march a shadow ray from each surface point toward the
    # light and attenuate if any sphere blocks it
    shadow = np.ones(rays_o.shape[:-1], np.float32)
    sp = hit_p + hit_n * 1e-3
    for center, radius, _ in prims:
        oc = sp - center
        b = np.sum(oc * light, -1)
        c = np.sum(oc * oc, -1) - radius ** 2
        disc = b * b - c
        t = -b - np.sqrt(np.maximum(disc, 0))
        blocked = (disc > 0) & (t > 1e-3)
        shadow = np.where(surf & blocked, 0.35, shadow)
    for tex in range(7):
        m = hit_tex == tex
        if not m.any():
            continue
        a = albedo_at(hit_p, hit_n, tex)
        shaded = a * (lam * shadow)[..., None]
        color = np.where(m[..., None], shaded, color)
    return np.clip(color, 0.0, 1.0).astype(np.float32)


def make_dataset(root, H=64, W=64, n_train=20, n_val=4, radius=4.0, ss=1,
                 scene="spheres"):
    """ss > 1: supersample the analytic render ss x ss per pixel and
    box-filter down — anti-aliased ground truth.  The aliased hard
    silhouettes of the ss=1 render put a ~22 dB ceiling on ANY smooth
    radiance field (EVAL_r02 observation); supersampling removes that
    floor so eval PSNR measures the model, not the rasterizer."""
    import imageio.v2 as imageio

    from cfnerf_tpu.data.blender import pose_spherical
    from cfnerf_tpu.ops.rays import get_rays_np

    camera_angle_x = 0.8
    focal = 0.5 * W / np.tan(0.5 * camera_angle_x)
    tracer = {"spheres": ray_trace_scene, "clutter": ray_trace_clutter}[scene]
    gen_params = {"H": H, "W": W, "n_train": n_train, "n_val": n_val,
                  "radius": radius, "ss": ss, "scene": scene}
    done_marker = os.path.join(root, ".complete")
    if os.path.exists(done_marker):
        # deterministic content — reuse across sweep runs, but only if it
        # was generated with the SAME params (the dir tag doesn't encode
        # n_val/radius; a silent mismatch would eval on the wrong split)
        with open(done_marker) as f:
            raw = f.read().strip()
        try:
            if json.loads(raw) == gen_params:
                return root
        except json.JSONDecodeError:
            pass  # legacy "ok" marker — regenerate (cheap + deterministic)
    os.makedirs(root, exist_ok=True)
    splits = {"train": n_train, "val": n_val, "test": n_val}
    rng = np.random.RandomState(0)
    for split, n in splits.items():
        frames = []
        os.makedirs(os.path.join(root, split), exist_ok=True)
        for i in range(n):
            theta = 360.0 * i / n + (0 if split == "train" else 360.0 / (2 * n))
            phi = -25.0 - 15.0 * rng.rand() if split == "train" else -30.0
            c2w = pose_spherical(theta - 180.0, phi, radius)
            ro, rd = get_rays_np(H * ss, W * ss, focal * ss, c2w[:3, :4])
            img = tracer(ro.reshape(-1, 3), rd.reshape(-1, 3)).reshape(
                H * ss, W * ss, 3)
            if ss > 1:
                img = img.reshape(H, ss, W, ss, 3).mean((1, 3))
            rgba = np.concatenate(
                [img, np.ones((*img.shape[:-1], 1), np.float32)], -1
            )
            imageio.imwrite(
                os.path.join(root, split, f"r_{i}.png"),
                (rgba * 255).astype(np.uint8),
            )
            frames.append(
                {"file_path": f"./{split}/r_{i}", "transform_matrix": c2w.tolist()}
            )
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": camera_angle_x, "frames": frames}, f)
    with open(done_marker, "w") as f:
        json.dump(gen_params, f)
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/cfnerf_demo")
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--cpu", action="store_true", help="force the CPU mesh")
    ap.add_argument("--res", type=int, default=64, help="image H=W")
    ap.add_argument("--n_train", type=int, default=20)
    ap.add_argument("--n_val", type=int, default=4)
    ap.add_argument("--supersample", type=int, default=1,
                    help="anti-alias the analytic GT (ss x ss box filter)")
    ap.add_argument("--netwidth", type=int, default=256)
    ap.add_argument("--netdepth", type=int, default=8,
                    help="trunk depth (student-trunk studies)")
    ap.add_argument("--N_samples", type=int, default=64)
    ap.add_argument("--K_samples", type=int, default=16)
    ap.add_argument("--N_rand", type=int, default=1024)
    ap.add_argument("--expname", default="demo")
    ap.add_argument("--k_schedule", default="",
                    help="passthrough to the trainer's --k_schedule")
    ap.add_argument("--N_importance", type=int, default=0,
                    help="hierarchical fine-pass samples (coarse+fine nets)")
    ap.add_argument("--eval_K", type=int, default=0,
                    help="K for the held-out eval (0 = same as --K_samples);"
                         " K is not a parameter axis, so a K16-trained "
                         "model evaluates at K32 unchanged")
    ap.add_argument("--eval_N_samples", type=int, default=0,
                    help="N_samples for the held-out eval (0 = same as "
                         "--N_samples); the z-schedule is not a parameter "
                         "axis either, so a low-N-trained model can eval "
                         "at a denser schedule")
    ap.add_argument("--eval_N_importance", type=int, default=0,
                    help="eval-only importance placement: passthrough to "
                         "--N_importance_eval (same net, no fine model)")
    ap.add_argument("--eval_occ", type=int, default=0,
                    help="occupancy-grid accelerated eval: passthrough to "
                         "--occ_eval (grid-placed samples per ray)")
    ap.add_argument("--eval_occ_impl", default="auto",
                    help="passthrough to --occ_impl (auto|grid|proposal)")
    ap.add_argument("--eval_occ_res", type=int, default=128)
    ap.add_argument("--eval_occ_candidates", type=int, default=128)
    ap.add_argument("--eval_occ_floor", type=float, default=0.3)
    ap.add_argument("--occ_train", type=int, default=0,
                    help="passthrough: proposal-placed training N")
    ap.add_argument("--occ_train_from", type=int, default=0,
                    help="passthrough: dense warmup steps before placed "
                         "sampling starts")
    ap.add_argument("--occ_train_until", type=int, default=0,
                    help="passthrough: end placed training at this step "
                         "and cool down dense (NLL/calibration lever)")
    ap.add_argument("--occ_floor_anneal", type=int, default=0,
                    help="passthrough: anneal the placement floor from "
                         "--occ_floor_start to --occ_train_floor over this "
                         "many steps after the occ boundary")
    ap.add_argument("--occ_floor_start", type=float, default=1.0,
                    help="passthrough: anneal start floor (1.0 ~= uniform)")
    ap.add_argument("--occ_train_floor", type=float, default=0.3,
                    help="uniform placement mass during occ training "
                         "(--occ_floor on the train side; free-space "
                         "coverage is a quality lever)")
    ap.add_argument("--occ_train_candidates", type=int, default=0,
                    help="passthrough: --occ_candidates for the occ-train "
                         "placement CDF (0 = config default 128; 64 "
                         "measured +7%% step rate — quality screen r13)")
    ap.add_argument("--skip_train", action="store_true",
                    help="reuse the checkpoint already in --outdir/logs "
                         "(eval-only A/Bs on one trained model)")
    ap.add_argument("--n_inner", type=int, default=10)
    ap.add_argument("--fused_render", default="auto",
                    help="passthrough ('auto'|'on'|'off'|'interpret') — "
                         "'off' forces the XLA render path for kernel A/Bs")
    ap.add_argument("--seed", type=int, default=0,
                    help="passthrough RNG seed (seed-variance studies)")
    ap.add_argument("--scene", default="spheres",
                    choices=("spheres", "clutter"),
                    help="analytic scene: 'spheres' (two-sphere, the "
                         "r02-r15 tuning scene) or 'clutter' (8 textured "
                         "spheres, occlusion + cast shadows — the off-scene "
                         "check on frontier defaults, VERDICT r03 task 6)")
    args_demo = ap.parse_args()

    if args_demo.cpu:
        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
            " --xla_force_host_platform_device_count=8"
        import jax
        jax.config.update("jax_platforms", "cpu")

    from cfnerf_tpu.cli.eval import evaluate
    from cfnerf_tpu.train.loop import train
    from cfnerf_tpu.utils.config import parse_args

    scene_tag = (f"scene_{args_demo.res}_{args_demo.n_train}_"
                 f"{args_demo.supersample}")
    if args_demo.scene != "spheres":
        scene_tag = f"{args_demo.scene}_{scene_tag}"
    datadir = make_dataset(
        os.path.join(args_demo.outdir, scene_tag),
        H=args_demo.res, W=args_demo.res,
        n_train=args_demo.n_train, n_val=args_demo.n_val,
        ss=args_demo.supersample, scene=args_demo.scene,
    )
    basedir = os.path.join(args_demo.outdir, "logs")
    flags = [
        "--expname", args_demo.expname, "--dataname", args_demo.scene,
        "--basedir", basedir,
        "--datadir", datadir, "--dataset_type", "blender", "--testskip", "1",
        "--N_rand", str(args_demo.N_rand),
        "--N_samples", str(args_demo.N_samples),
        "--K_samples", str(args_demo.K_samples),
        "--n_flows", "4", "--h_alpha_size", "64", "--h_rgb_size", "64",
        "--netdepth", str(args_demo.netdepth),
        "--netwidth", str(args_demo.netwidth),
        "--type_flows", "triangular", "--beta1", "0.01",
        "--use_viewdirs", "--white_bkgd", "--no_ndc",
        "--lrate", "5e-4", "--n_inner", str(args_demo.n_inner),
        "--n_iters", str(args_demo.iters),
        "--i_print", "200", "--i_weights", str(args_demo.iters),
        "--i_img", "0", "--chunk", "4096",
        "--compute_dtype", "bfloat16",
        "--N_importance", str(args_demo.N_importance),
        "--fused_render", args_demo.fused_render,
        "--seed", str(args_demo.seed),
    ]
    if args_demo.k_schedule:
        flags += ["--k_schedule", args_demo.k_schedule]
    if args_demo.occ_train:
        flags += ["--occ_train", str(args_demo.occ_train),
                  "--occ_train_from", str(args_demo.occ_train_from),
                  "--occ_floor", str(args_demo.occ_train_floor)]
        if args_demo.occ_train_candidates:
            flags += ["--occ_candidates", str(args_demo.occ_train_candidates)]
        if args_demo.occ_train_until:
            flags += ["--occ_train_until", str(args_demo.occ_train_until)]
        if args_demo.occ_floor_anneal:
            flags += ["--occ_floor_anneal", str(args_demo.occ_floor_anneal),
                      "--occ_floor_start", str(args_demo.occ_floor_start)]
    import time as _time
    train_wall = 0.0
    if not args_demo.skip_train:
        t0 = _time.time()
        train(parse_args(flags + ["--is_train"]))
        train_wall = _time.time() - t0
    eval_flags = list(flags)
    if args_demo.eval_K:
        i = eval_flags.index("--K_samples")
        eval_flags[i + 1] = str(args_demo.eval_K)
    if args_demo.eval_N_samples:
        i = eval_flags.index("--N_samples")
        eval_flags[i + 1] = str(args_demo.eval_N_samples)
    if args_demo.eval_N_importance:
        eval_flags += ["--N_importance_eval", str(args_demo.eval_N_importance)]
    if args_demo.eval_occ:
        eval_flags += [
            "--occ_eval", str(args_demo.eval_occ),
            "--occ_impl", args_demo.eval_occ_impl,
            "--occ_res", str(args_demo.eval_occ_res),
            "--occ_eval_candidates", str(args_demo.eval_occ_candidates),
            "--occ_floor", str(args_demo.eval_occ_floor),
        ]
    summary = evaluate(parse_args(eval_flags))
    summary["train_wall_s"] = round(train_wall, 1)
    # seed rides in the summary so aggregators can pair arms by SEED, not
    # launch order (ADVICE r03: a reordered/mixed log silently mis-paired)
    summary["seed"] = args_demo.seed
    print("DEMO SUMMARY:", json.dumps(
        {k: v for k, v in summary.items() if k != "views"}))


if __name__ == "__main__":
    main()
