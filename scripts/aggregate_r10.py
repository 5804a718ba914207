"""Assemble EVAL_r10.json — the reference-schedule (100k-iteration) run
(VERDICT r02 task 3): the first converged-quality number this framework has
produced, on the minicapture fixture through the full real-data path
(minify -> NDC -> COLMAP sparse depth -> occ-stage training -> spiral
render + uncertainty maps + PLY).

Matches the reference's headline schedule: n_iters 100,000
(/root/reference/run_nerf_uncertainty_NF.py:923, train_NF.sh) on the
EVAL_r07 occ recipe (dense warmup 6k at N48 with the 8->16->32 K-schedule,
then proposal-placed N=16 steps, floor 0.3).

    PYTHONPATH=/root/repo python scripts/aggregate_r10.py \
        --summary /tmp/realq_100k_summary.json \
        --renderdir <renderonly dir> --out EVAL_r10.json
"""
from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--summary", default="/tmp/realq_100k_summary.json")
    ap.add_argument("--renderdir", default="")
    ap.add_argument("--fetch_note", default=(
        "scripts/fetch_datasets.sh attempted this round (VERDICT r02 task 4): "
        "gdown absent and DNS resolution fails outright "
        "(urllib to drive.google.com -> URLError 'Name or service not known') "
        "— zero-egress environment confirmed; the genuine LF/LLFF scenes "
        "remain unavailable, the checked-in minicapture fixture is the "
        "real-data stand-in."))
    ap.add_argument("--out", default="EVAL_r10.json")
    args = ap.parse_args()

    with open(args.summary) as f:
        summary = json.load(f)

    artifact = {
        "experiment": (
            "Reference-schedule converged-quality run (EVAL_r10): 100,000 "
            "iterations — the reference's own headline schedule "
            "(run_nerf_uncertainty_NF.py:923, train_NF.sh) — on the "
            "minicapture LLFF+COLMAP fixture through the full real-data "
            "path (factor-2 minify cache -> NDC rays -> COLMAP sparse-depth "
            "supervision -> dense warmup 6k then proposal-placed occ_train "
            "16 @ floor 0.3 -> held-out K-sample eval -> occ-served spiral "
            "render with mp4 + per-view uncertainty maps + PLY point "
            "clouds).  One real TPU v5e chip, seed 0, D8/W512 flagship "
            "capacity, N48, K-schedule 8:0,16:4000,32:8000 -> K32."
        ),
        "command": (
            "PYTHONPATH=/root/repo python scripts/real_capture_quality.py "
            "--workdir /tmp/realq_100k --n_iters 100000 --seed 0 "
            "--occ_train 16 --occ_train_from 6000 "
            "--k_schedule 8:0,16:4000,32:8000"
        ),
        "result": summary,
        "vs_6k_run_EVAL_r05_real": {
            "psnr_6k": 26.9159, "psnr_100k": summary.get("psnr"),
            "ssim_6k": 0.8293, "ssim_100k": summary.get("ssim"),
            "nll_6k": 1.1361, "nll_100k": summary.get("nll"),
            "ause_6k": 0.0545, "ause_100k": summary.get("ause"),
            "note": (
                "Converged reconstruction keeps improving (+0.75 dB PSNR, "
                "+0.042 SSIM, AUSE better) but HELD-OUT KDE-NLL collapses "
                "(1.14 -> 6.93 nat): at 100k on a 1-val-view fixture the "
                "K-spread shrinks with training-view overfit faster than "
                "held-out error, i.e. converged-schedule overconfidence. "
                "The r08 calibration lever (dense cooldown, "
                "--occ_train_until 90000) is measured as a paired arm "
                "(see cooldown_arm)."
            ),
        },
        "datasets_fetch_attempt": args.fetch_note,
    }
    cool = "/tmp/realq_100k_cool_summary.json"
    if os.path.exists(cool):
        with open(cool) as f:
            cs = json.load(f)
        artifact["cooldown_arm"] = {
            "note": (
                "Cooldown improves held-out NLL 6.93 -> 5.61 (-1.3 nat) at "
                "a -0.43 dB PSNR give-back — the r08 lever's signature at "
                "the reference schedule; the remaining NLL gap vs the 6k "
                "run (1.14) is converged-schedule overfit on the 1-val-view "
                "fixture, not the occ stage.  Wall times are NOT comparable "
                "across the two arms: the plain arm trained alongside three "
                "CPU jobs (lockstep + matched-init parity + pytest) on the "
                "1-core host, the cooldown arm alongside one."
            ),
            "command": artifact["command"].replace(
                "/tmp/realq_100k", "/tmp/realq_100k_cool"
            ) + " --occ_train_until 90000",
            "result": {k: cs[k] for k in
                       ("step", "psnr", "ssim", "nll", "ause", "train_wall_s")
                       if k in cs},
        }

    if args.renderdir and os.path.isdir(args.renderdir):
        files = sorted(os.listdir(args.renderdir))
        mp4s = [f for f in files if f.endswith(".mp4")]
        artifact["spiral_render"] = {
            "dir": args.renderdir,
            "n_frames": len([f for f in files if f.endswith(".png")]),
            "videos": mp4s,
            "mp4_bytes": {
                f: os.path.getsize(os.path.join(args.renderdir, f))
                for f in mp4s
            },
        }

    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
