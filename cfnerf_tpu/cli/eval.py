"""Paper-grade evaluation: held-out-view PSNR / SSIM / NLL / AUSE with
uncertainty maps, figures, and point-cloud export.

The reference has no working evaluation entry (test_NF.sh is a no-op in the
snapshot and --render_only crashes — SURVEY.md section 2); its eval-as-test
machinery is the TensorBoard image path (run_nerf_uncertainty_NF.py:1112-1187)
plus the AUSE helper (run_nerf_helpers.py:382-438).  This module implements
the intended evaluation: for each held-out view, render K samples, compute
  * PSNR / SSIM of the mean image,
  * per-pixel predictive NLL under the K-sample KDE (same Parzen bandwidth
    as the training loss),
  * AUSE from the per-pixel std,
and write uncertainty figures, sparsification plots, and an uncertainty
point cloud.

Usage:
    python -m cfnerf_tpu.cli.eval --config configs/africa_ds.txt \
        --expname africa ... (same flags as training)
"""
from __future__ import annotations

import json
import math
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from cfnerf_tpu.models.factory import create_nerf
from cfnerf_tpu.ops.metrics import sparsification_plot, ssim, std_over_k, to8b
from cfnerf_tpu.render.renderer import make_render_rays, render_image
from cfnerf_tpu.train import checkpoint as ckpt
from cfnerf_tpu.train.loop import load_dataset
from cfnerf_tpu.utils.config import parse_args
from cfnerf_tpu.utils.pointcloud import depth_uncertainty_pointcloud
from cfnerf_tpu.utils.visualization import (
    save_sparsification_figure,
    save_uncertainty_figure,
)


def kde_nll_per_pixel(rgb_k: np.ndarray, gt: np.ndarray, k: int) -> np.ndarray:
    """Per-pixel Parzen NLL, same bandwidth rule as the training loss
    (run_nerf_uncertainty_NF.py:1031-1042 — torch.std, ddof=1; this is the
    BANDWIDTH convention, distinct from std_over_k's map convention)."""
    eps = 1e-5
    std = rgb_k.std(-1, ddof=1) * k / (k - 1)
    h = std * (0.8 / k) ** (-1.0 / 7.0) + eps
    h = h[..., None]
    kernel = np.exp(-((rgb_k - gt[..., None]) ** 2) / (2 * h * h))
    norm = (2 * math.pi) ** (-1.5) / h
    p = (kernel * norm).mean(-1) + eps
    return -np.log(p)  # (H, W, 3)


def evaluate(args) -> Dict[str, float]:
    scene = load_dataset(args)
    H, W, focal = scene["H"], scene["W"], scene["focal"]

    model, model_fine, render_config, params, start = create_nerf(args)
    print(f"evaluating checkpoint step {start}")

    # multi-chip serving: shard each render tile's ray axis over the data
    # mesh (render_image mesh path) — eval throughput scales with chips
    from cfnerf_tpu.parallel.mesh import create_mesh
    mesh = create_mesh(args.mesh_devices if args.mesh_devices > 0 else None)

    occ_n = int(getattr(args, "occ_eval", 0) or 0)
    if occ_n > 0 and (model_fine is not None or args.N_importance_eval > 0):
        import sys

        print("WARNING: --occ_eval ignored — incompatible with a fine "
              "network / --N_importance_eval (hierarchical placement "
              "already owns the z axis)", file=sys.stderr)
        occ_n = 0
    if occ_n > 0:
        import dataclasses

        trained_n = render_config.n_samples
        render_config = dataclasses.replace(render_config, n_samples=occ_n)
        print(f"occupancy-grid eval: N={occ_n} grid-placed samples/ray "
              f"(trained at N={trained_n}; grid {args.occ_res}^3, "
              f"{args.occ_candidates} candidates, floor {args.occ_floor})")

    if args.N_importance_eval > 0 and model_fine is None:
        # eval-only importance placement: coarse pass at the trained
        # N_samples, inverse-CDF resample N_importance_eval extra depths,
        # second query through the SAME network/params (renderer shared-net
        # hierarchical path).  Disables the fused kernel for this eval (the
        # hierarchical pass needs the coarse `weights`).
        import dataclasses

        render_config = dataclasses.replace(
            render_config, n_importance=args.N_importance_eval
        )
        print(f"eval-only importance placement: +{args.N_importance_eval} "
              f"samples on top of N={render_config.n_samples}")
    elif args.N_importance_eval > 0:
        import sys

        print("WARNING: --N_importance_eval ignored — this run already has "
              "a fine network (--N_importance > 0)", file=sys.stderr)

    def model_apply(p, x, *, is_test, rng):
        return model.apply({"params": p}, x, is_test=is_test, rng=rng)

    fine_apply = None
    if model_fine is not None:
        def fine_apply(p, x, *, is_test, rng):
            return model_fine.apply({"params": p}, x, is_test=is_test, rng=rng)

    from cfnerf_tpu.models.nerf_flows import make_fused_apply

    render_rays_fn = make_render_rays(
        model_apply, render_config, fine_apply,
        make_fused_apply(model, render_config.fused),
    )

    if occ_n > 0:
        from cfnerf_tpu.ops.occupancy import wrap_renderer_for_serving

        render_rays_fn = wrap_renderer_for_serving(
            render_rays_fn, args, scene, model, params, render_config
        )

    rundir = ckpt.run_dir(args.basedir, args.dataname, args.type_flows, args.expname)
    outdir = os.path.join(rundir, f"eval_{start:06d}")
    os.makedirs(outdir, exist_ok=True)

    rf = args.render_factor
    He, We, fe = (H, W, focal) if rf == 0 else (H // rf, W // rf, focal / rf)

    K = args.K_samples
    per_view = []
    all_var, all_err = [], []
    for view in scene["i_val"]:
        out = render_image(
            render_rays_fn, params, jnp.asarray(scene["poses"][view]),
            H=He, W=We, focal=fe,
            ndc=(args.dataset_type == "llff" and not args.no_ndc),
            use_viewdirs=args.use_viewdirs,
            near=scene["near"], far=scene["far"], tile=args.chunk,
            mesh=mesh,
        )
        rgb_k = np.asarray(out["rgb_map"])   # (H, W, 3, K)
        disp_k = np.asarray(out["disp_map"])
        depth_k = np.asarray(out["depth_map"])
        gt = scene["images"][view]
        if rf != 0:
            import cv2
            gt = cv2.resize(gt, (We, He), interpolation=cv2.INTER_AREA)

        rgb_mean = rgb_k.mean(-1)
        rgb_std = std_over_k(rgb_k)
        mse = float(((rgb_mean - gt) ** 2).mean())
        psnr = -10.0 * np.log10(mse)
        ssim_v = float(ssim(jnp.asarray(rgb_mean), jnp.asarray(gt)))
        nll_map = kde_nll_per_pixel(rgb_k, gt, K)
        nll = float(nll_map.mean())

        err_vec = ((rgb_mean - gt) ** 2).mean(-1).reshape(-1)
        var_vec = (rgb_std ** 2).mean(-1).reshape(-1)
        oracle, by_var = sparsification_plot(var_vec, err_vec)
        ause = float(np.mean(by_var - oracle))
        all_var.append(var_vec)
        all_err.append(err_vec)

        per_view.append(
            dict(view=int(view), psnr=psnr, ssim=ssim_v, nll=nll, ause=ause, mse=mse)
        )
        print(f"view {view}: PSNR {psnr:.2f}  SSIM {ssim_v:.4f}  NLL {nll:.4f}  AUSE {ause:.4f}")

        import imageio.v2 as imageio
        imageio.imwrite(os.path.join(outdir, f"{view:03d}_pred.png"), to8b(rgb_mean))
        imageio.imwrite(
            os.path.join(outdir, f"{view:03d}_std.png"),
            to8b(rgb_std / (rgb_std.max() + 1e-8)),
        )
        save_uncertainty_figure(
            os.path.join(outdir, f"{view:03d}_panel.png"),
            gt=gt, rgb_mean=rgb_mean, rgb_std=rgb_std,
            disp=disp_k.mean(-1), title=f"view {view}",
        )
        save_sparsification_figure(
            os.path.join(outdir, f"{view:03d}_ause.png"), oracle, by_var
        )
        depth_uncertainty_pointcloud(
            os.path.join(outdir, f"{view:03d}_uncertainty.ply"),
            depth_k.mean(-1), rgb_std.mean(-1),
            scene["poses"][view][:3, :4], fe,
        )

    oracle, by_var = sparsification_plot(
        np.concatenate(all_var), np.concatenate(all_err)
    )
    summary = {
        "step": start,
        "psnr": float(np.mean([v["psnr"] for v in per_view])),
        "ssim": float(np.mean([v["ssim"] for v in per_view])),
        "nll": float(np.mean([v["nll"] for v in per_view])),
        "ause": float(np.mean(by_var - oracle)),
        "views": per_view,
    }
    with open(os.path.join(outdir, "metrics.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: v for k, v in summary.items() if k != "views"}))
    return summary


def main(argv=None):
    args = parse_args(argv)
    evaluate(args)


if __name__ == "__main__":
    main()
