"""EVAL_r13: ensemble at the train-side frontier, via the PARALLEL trainer.

Combines the two headline capabilities measured separately so far:
  * the matched-quality train frontier recipe (W384 student trunk, N48
    dense warmup -> occ_train=12 placed sampling, K-schedule — EVAL_r09),
  * first-class ensembling (M*K mixture — EVAL_r04_ensemble),
and trains all M=3 members SIMULTANEOUSLY through
cli.ensemble train --parallel (parallel/ensemble.py) on one chip — the
first end-to-end production run of the vmapped member axis on real TPU,
including the occ stage (3 proposals distilled at the boundary, placement
+ co-training vmapped).

Protocol matches EVAL_r04_ensemble (member seeds 1000/2000/3000, same
128px anti-aliased two-sphere scene, per-member eval via cli.eval
--index_ensembles m, mixture via cli.ensemble eval) so the mixture-vs-
member deltas are comparable across operating points.  Reference surface:
ensemble checkpoint indexing, /root/reference/run_nerf_uncertainty_NF.py:713-716,:1086.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ensemble_frontier_experiment.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.demo_synthetic import make_dataset  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUTDIR = os.environ.get("R13_OUTDIR", "/tmp/cfnerf_r13")
ITERS = int(os.environ.get("R13_ITERS", "20000"))
RES = int(os.environ.get("R13_RES", "128"))
N_TRAIN = int(os.environ.get("R13_NTRAIN", "50"))
N_RAND = os.environ.get("R13_NRAND", "4096")
SMOKE = os.environ.get("R13_SMOKE", "") == "1"  # tiny CPU-mesh dry pass
M = 3


def _flags(datadir, basedir, iters):
    # the EVAL_r09 occ12 frontier recipe at the EVAL_r05 student point;
    # boundaries scale with iters (0.3*iters == the 6000-step dense warmup
    # at the standard 20k schedule)
    small = ["--netwidth", "32", "--netdepth", "2", "--n_flows", "2",
             "--h_alpha_size", "8", "--h_rgb_size", "8",
             "--N_samples", "16", "--K_samples", "8"]
    full = ["--netwidth", "384", "--netdepth", "8", "--n_flows", "4",
            "--h_alpha_size", "64", "--h_rgb_size", "64",
            "--N_samples", "48", "--K_samples", "32"]
    return [
        "--expname", "ens_frontier", "--dataname", "spheres",
        "--basedir", basedir,
        "--datadir", datadir, "--dataset_type", "blender", "--testskip", "1",
        "--N_rand", str(N_RAND),
        *(small if SMOKE else full),
        "--type_flows", "triangular", "--beta1", "0.01",
        "--use_viewdirs", "--white_bkgd", "--no_ndc",
        "--lrate", "5e-4", "--n_inner", "10",
        "--n_iters", str(iters),
        "--i_print", "500", "--i_weights", str(iters),
        "--i_img", "0", "--chunk", "4096",
        "--compute_dtype", "bfloat16",
        "--k_schedule", (f"4:0,8:{int(0.4 * iters)}" if SMOKE else
                         f"8:0,16:{int(0.2 * iters)},32:{int(0.4 * iters)}"),
        "--occ_train", "12", "--occ_train_from", str(int(0.3 * iters)),
        "--occ_floor", "0.3",
        "--seed", "0",
    ]


def main():
    if SMOKE:
        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
            " --xla_force_host_platform_device_count=8"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from cfnerf_tpu.cli.ensemble import eval_ensemble, train_ensemble_parallel
    from cfnerf_tpu.cli.eval import evaluate
    from cfnerf_tpu.utils.config import config_parser

    datadir = make_dataset(
        os.path.join(OUTDIR, f"scene_{RES}_{N_TRAIN}_4"), H=RES, W=RES,
        n_train=N_TRAIN, n_val=4, ss=4,
    )
    basedir = os.path.join(OUTDIR, "logs")
    flags = _flags(datadir, basedir, ITERS)

    parser = config_parser()
    parser.add_argument("--n_members", type=int, default=M)
    args = parser.parse_args(flags + ["--is_train"])

    t0 = time.time()
    train_ensemble_parallel(args, M)
    train_wall = time.time() - t0
    print(f"parallel ensemble train wall: {train_wall:.1f}s "
          f"({M} members x {ITERS} iters x 4096 rays)")

    members = {}
    for m in range(1, M + 1):
        margs = parser.parse_args(flags + ["--index_ensembles", str(m)])
        margs.seed = args.seed + 1000 * m
        s = evaluate(margs)
        members[f"m{m}_seed{1000 * m}"] = {
            k: round(float(s[k]), 4) for k in ("psnr", "ssim", "nll", "ause")
        }
        print(f"member {m}: {members[f'm{m}_seed{1000 * m}']}")

    eargs = parser.parse_args(flags)
    mix = eval_ensemble(eargs, M)
    mixture = {k: round(float(mix[k]), 4) for k in ("psnr", "ssim", "nll", "ause")}

    import numpy as np

    best = {k: (max if k in ("psnr", "ssim") else min)(
        v[k] for v in members.values()) for k in mixture}
    mean = {k: float(np.mean([v[k] for v in members.values()])) for k in mixture}
    out = {
        "experiment": (
            "Ensemble at the train-side frontier (EVAL_r13): M=3 members "
            "at the occ12 frontier recipe (W384/N48 dense warmup 6k -> "
            "occ_train=12, K-schedule 8/16/32, 20k iters, 4096 rays/step/"
            "member) trained SIMULTANEOUSLY in one jit via cli.ensemble "
            "train --parallel (vmapped member axis, parallel/ensemble.py) "
            "on ONE v5e chip — first production TPU run of the parallel "
            "trainer, occ stage included (3 proposals distilled at the "
            "boundary, placement+co-training vmapped).  Per-member eval "
            "via cli.eval --index_ensembles m; mixture = M*K=96 draws via "
            "cli.ensemble eval.  Protocol matches EVAL_r04_ensemble for "
            "cross-operating-point comparison; member quality comparable "
            "to the EVAL_r09 occ12 arm (same recipe, seeds differ: "
            "1000/2000/3000 here)."
        ),
        "hardware": "1x TPU v5e, fused render core + vmapped member axis",
        "iters": ITERS,
        "train_wall_s_total": round(train_wall, 1),
        "train_wall_s_per_member_equiv": round(train_wall / M, 1),
        "members": members,
        "mixture_M3": mixture,
        "deltas_vs_best_member": {
            k: round(mixture[k] - best[k], 4) for k in mixture},
        "deltas_vs_mean_member": {
            k: round(mixture[k] - mean[k], 4) for k in mixture},
    }
    # smoke passes must not overwrite the committed artifact
    path = (os.path.join(OUTDIR, "EVAL_r13_smoke.json") if SMOKE
            else os.path.join(REPO, "EVAL_r13.json"))
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print("wrote", path)
    print(json.dumps({k: out[k] for k in
                      ("train_wall_s_total", "mixture_M3",
                       "deltas_vs_best_member")}))


if __name__ == "__main__":
    main()
