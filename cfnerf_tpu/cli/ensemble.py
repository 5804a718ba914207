"""Ensemble training / evaluation.

The reference exposes ensembles only as checkpoint-name indices
(--index_ensembles / --index_step, run_nerf_uncertainty_NF.py:713-716,
:1086) with the member loop left to external launch scripts.  This module
makes the workflow first-class:

  train:  python -m cfnerf_tpu.cli.ensemble train --n_members 3 <flags...>
          trains members 1..N sequentially (distinct seeds + ckpt indices)
  eval:   python -m cfnerf_tpu.cli.ensemble eval --n_members 3 <flags...>
          renders each member's K draws per held-out view and aggregates:
          the predictive distribution is the MIXTURE over members
          (mean over M*K samples, std over M*K samples).
"""
from __future__ import annotations

import copy
import json
import os
import sys
from typing import List

import numpy as np

from cfnerf_tpu.utils.config import config_parser


def _member_args(args, member: int):
    a = copy.deepcopy(args)
    a.index_ensembles = member
    a.seed = args.seed + 1000 * member
    return a


def train_ensemble(args, n_members: int) -> None:
    from cfnerf_tpu.train.loop import train

    for m in range(1, n_members + 1):
        print(f"=== training ensemble member {m}/{n_members} ===")
        train(_member_args(args, m))


def eval_ensemble(args, n_members: int) -> dict:
    import jax.numpy as jnp

    from cfnerf_tpu.cli.eval import kde_nll_per_pixel
    from cfnerf_tpu.models.factory import create_nerf
    from cfnerf_tpu.ops.metrics import sparsification_plot, ssim, std_over_k, to8b
    from cfnerf_tpu.render.renderer import make_render_rays, render_image
    from cfnerf_tpu.train import checkpoint as ckpt
    from cfnerf_tpu.train.loop import load_dataset

    scene = load_dataset(args)
    H, W, focal = scene["H"], scene["W"], scene["focal"]
    rf = args.render_factor
    He, We, fe = (H, W, focal) if rf == 0 else (H // rf, W // rf, focal / rf)

    from cfnerf_tpu.parallel.mesh import create_mesh
    mesh = create_mesh(args.mesh_devices if args.mesh_devices > 0 else None)

    # per-member renders
    member_renders: List[dict] = []
    member_steps: List[int] = []
    start = 0
    for m in range(1, n_members + 1):
        margs = _member_args(args, m)
        model, model_fine, render_config, params, start = create_nerf(margs)
        if start == 0:
            # a member without a checkpoint would mix FRESH RANDOM params
            # into the ensemble and silently poison every aggregate metric
            raise FileNotFoundError(
                f"ensemble member {m:02d}: no checkpoint found under the "
                f"run dir for expname={margs.expname!r} — train all "
                f"members first (cli.ensemble train)"
            )

        def model_apply(p, x, *, is_test, rng, _model=model):
            return _model.apply({"params": p}, x, is_test=is_test, rng=rng)

        fine_apply = None
        if model_fine is not None:
            def fine_apply(p, x, *, is_test, rng, _model=model_fine):
                return _model.apply({"params": p}, x, is_test=is_test, rng=rng)

        from cfnerf_tpu.models.nerf_flows import make_fused_apply

        rr = make_render_rays(
            model_apply, render_config, fine_apply,
            make_fused_apply(model, render_config.fused),
        )
        renders = {}
        for view in scene["i_val"]:
            out = render_image(
                rr, params, jnp.asarray(scene["poses"][view]),
                H=He, W=We, focal=fe,
                ndc=(args.dataset_type == "llff" and not args.no_ndc),
                use_viewdirs=args.use_viewdirs,
                near=scene["near"], far=scene["far"], tile=args.chunk,
                mesh=mesh,
            )
            renders[view] = np.asarray(out["rgb_map"])  # (H, W, 3, K)
        member_renders.append(renders)
        member_steps.append(start)
        print(f"member {m}: rendered {len(renders)} views @ step {start}")

    if len(set(member_steps)) > 1:
        print(f"WARNING: ensemble members restored at different steps "
              f"{member_steps}; the output dir is tagged with the last one")

    # aggregate: mixture over members -> (H, W, 3, M*K)
    rundir = ckpt.run_dir(args.basedir, args.dataname, args.type_flows, args.expname)
    outdir = os.path.join(rundir, f"eval_ensemble{n_members}_{start:06d}")
    os.makedirs(outdir, exist_ok=True)

    import imageio.v2 as imageio

    per_view = []
    for view in scene["i_val"]:
        rgb_k = np.concatenate([mr[view] for mr in member_renders], axis=-1)
        MK = rgb_k.shape[-1]
        gt = scene["images"][view]
        if rf != 0:
            import cv2
            gt = cv2.resize(gt, (We, He), interpolation=cv2.INTER_AREA)
        rgb_mean = rgb_k.mean(-1)
        rgb_std = std_over_k(rgb_k)
        mse = float(((rgb_mean - gt) ** 2).mean())
        psnr = -10.0 * np.log10(mse)
        ssim_v = float(ssim(jnp.asarray(rgb_mean), jnp.asarray(gt)))
        nll = float(kde_nll_per_pixel(rgb_k, gt, MK).mean())
        err = ((rgb_mean - gt) ** 2).mean(-1).reshape(-1)
        var = (rgb_std ** 2).mean(-1).reshape(-1)
        oracle, by_var = sparsification_plot(var, err)
        ause = float(np.mean(by_var - oracle))
        per_view.append(dict(view=int(view), psnr=psnr, ssim=ssim_v, nll=nll, ause=ause))
        imageio.imwrite(os.path.join(outdir, f"{view:03d}_pred.png"), to8b(rgb_mean))
        imageio.imwrite(
            os.path.join(outdir, f"{view:03d}_std.png"),
            to8b(rgb_std / (rgb_std.max() + 1e-8)),
        )

    summary = {
        "n_members": n_members,
        "psnr": float(np.mean([v["psnr"] for v in per_view])),
        "ssim": float(np.mean([v["ssim"] for v in per_view])),
        "nll": float(np.mean([v["nll"] for v in per_view])),
        "ause": float(np.mean([v["ause"] for v in per_view])),
        "views": per_view,
    }
    with open(os.path.join(outdir, "metrics.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: v for k, v in summary.items() if k != "views"}))
    return summary


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] not in ("train", "eval"):
        print("usage: python -m cfnerf_tpu.cli.ensemble {train|eval} "
              "--n_members N <training flags...>")
        sys.exit(2)
    mode = argv.pop(0)
    parser = config_parser()
    parser.add_argument("--n_members", type=int, default=3)
    args = parser.parse_args(argv)
    if mode == "train":
        train_ensemble(args, args.n_members)
    else:
        eval_ensemble(args, args.n_members)


if __name__ == "__main__":
    main()
