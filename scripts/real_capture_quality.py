"""Real-capture quality artifact: train + eval on the checked-in miniature
LLFF+COLMAP capture (tests/fixtures/minicapture) through the exact real-data
path a user runs on fern/africa — mogrify-style minify cache -> NDC rays ->
COLMAP sparse-depth supervision -> spiral-capable checkpoints -> held-out
K-sample evaluation (PSNR / SSIM / KDE-NLL / AUSE).

The genuine LF/LLFF datasets are absent from this environment (zero egress;
the reference's own blobs are stripped — /root/reference/.MISSING_LARGE_BLOBS),
so this fixture is the real-data stand-in: same on-disk layout, same flag
surface (configs/minicapture_ds.txt vs configs/fern.txt), same code path as
/root/reference/load_llff.py:278-361 + DS-NeRF depth supervision.  With
network access, scripts/fetch_datasets.sh pulls the real scenes and the same
command runs unchanged against configs/africa_ds.txt.

Usage (real TPU, ~3 min):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/real_capture_quality.py \
        [--workdir /tmp/minicapture_realq] [--n_iters 6000] [--seed 0]

Writes <workdir>/summary.json; EVAL_r05_real.json in the repo root is the
recorded artifact.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/minicapture_realq")
    ap.add_argument("--n_iters", type=int, default=6000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--netwidth", type=int, default=512)
    ap.add_argument("--N_samples", type=int, default=48)
    ap.add_argument(
        "--k_schedule", default="8:0,16:1200,32:2400",
        help="the EVAL_r04 operating-point schedule (quality-positive)",
    )
    ap.add_argument("--occ_train", type=int, default=0,
                    help="proposal-placed training N on the NDC real-capture "
                         "path (0 = dense; EVAL_r07 recipe)")
    ap.add_argument("--occ_train_from", type=int, default=0)
    ap.add_argument("--occ_train_until", type=int, default=0)
    ap.add_argument("--occ_floor_anneal", type=int, default=0)
    ap.add_argument("--occ_floor_start", type=float, default=1.0)
    ap.add_argument("--occ_train_floor", type=float, default=0.3)
    ap.add_argument("--out", default="",
                    help="also copy summary.json to this path")
    opts = ap.parse_args()

    from cfnerf_tpu.cli.eval import evaluate
    from cfnerf_tpu.train.loop import train
    from cfnerf_tpu.utils.config import parse_args

    datadir = os.path.join(opts.workdir, "data")
    basedir = os.path.join(opts.workdir, "logs")
    if os.path.exists(datadir):
        shutil.rmtree(datadir)
    os.makedirs(opts.workdir, exist_ok=True)
    # copy: training materializes the minify cache (images_2/) and
    # colmap_depth.npy inside the capture dir, exactly like on real data
    shutil.copytree(os.path.join(REPO, "tests", "fixtures", "minicapture"), datadir)

    flags = [
        "--config", os.path.join(REPO, "configs", "minicapture_ds.txt"),
        "--datadir", datadir, "--basedir", basedir, "--expname", "realq",
        # the EVAL_r04 operating point on the flagship architecture:
        # D8/W512, 4 triangular flows, N48, K-schedule -> K32
        "--netdepth", "8", "--netwidth", str(opts.netwidth),
        "--n_flows", "4", "--h_alpha_size", "64", "--h_rgb_size", "64",
        "--N_samples", str(opts.N_samples), "--K_samples", "32",
        "--k_schedule", opts.k_schedule,
        "--N_rand", "1024", "--lrate", "5e-4",
        "--n_iters", str(opts.n_iters), "--seed", str(opts.seed),
        "--i_print", "500", "--i_weights", str(opts.n_iters),
        "--i_img", "0", "--chunk", "8192",
    ]
    if opts.occ_train:
        flags += ["--occ_train", str(opts.occ_train),
                  "--occ_train_from", str(opts.occ_train_from),
                  "--occ_floor", str(opts.occ_train_floor)]
        if opts.occ_train_until:
            flags += ["--occ_train_until", str(opts.occ_train_until)]
        if opts.occ_floor_anneal:
            flags += ["--occ_floor_anneal", str(opts.occ_floor_anneal),
                      "--occ_floor_start", str(opts.occ_floor_start)]

    t0 = time.time()
    train(parse_args(flags + ["--is_train"]))
    train_wall = time.time() - t0

    args_eval = parse_args(flags)
    args_eval.is_train = False
    summary = evaluate(args_eval)
    summary["train_wall_s"] = round(train_wall, 1)
    summary["flags"] = " ".join(flags)

    out = os.path.join(opts.workdir, "summary.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"wrote {out}")
    if opts.out:
        shutil.copyfile(out, opts.out)
        print(f"copied to {opts.out}")


if __name__ == "__main__":
    main()
