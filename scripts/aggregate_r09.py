"""Aggregate the r09 occ-train depth-count evidence into EVAL_r09.json.

Pairs the 3-seed occ_train=8 runs (EVAL_r09_sweep.json, key
occ8_screen_20000) against the EVAL_r07 dense and occ(N=16) arms
(identical config/seeds/scene), so the artifact answers one question:
does halving the placed samples per ray (N=16 -> N=8, the last
train-side lever toward the 1M rays/s north-star — 878k rays/s probed
at r08 end) hold quality, or does the floor-0.3 placement starve at 8
depths?  occ12_s0 is carried as a single-seed midpoint ablation when
present.

    PYTHONPATH=/root/repo python scripts/aggregate_r09.py \
        [--occ8_rps 877972] [--occ12_rps 615300]
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
METRICS = ("psnr", "ssim", "nll", "ause")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--occ8_rps", type=float, default=877972.0,
                    help="measured occ_n=8 step throughput (bench_train)")
    ap.add_argument("--occ12_rps", type=float, default=615300.0)
    args = ap.parse_args()

    sweep = json.load(open(os.path.join(REPO, "EVAL_r09_sweep.json")))
    r07 = json.load(open(os.path.join(REPO, "EVAL_r07.json")))
    runs = sweep["occ8_screen_20000"]

    occ8 = {s: runs[f"occ8_s{s}"]["eval"] for s in ("0", "1", "2")}

    paired = {}
    for s in ("0", "1", "2"):
        d = r07["paired_by_seed"][s]["dense"]
        o = r07["paired_by_seed"][s]["occ"]
        e = occ8[s]
        paired[s] = {
            "dense": d,
            "occ16": {k: o[k] for k in METRICS},
            "occ8": {k: round(float(e[k]), 4) for k in METRICS},
            "occ8_delta_psnr_vs_dense": round(e["psnr"] - d["psnr"], 4),
            "occ8_delta_psnr_vs_occ16": round(e["psnr"] - o["psnr"], 4),
            "occ8_delta_nll_vs_dense": round(e["nll"] - d["nll"], 4),
        }

    def pool(vals):
        a = np.asarray(vals, dtype=np.float64)
        return {"mean": round(float(a.mean()), 4),
                "std": round(float(a.std(ddof=1)), 4)}

    pools = {}
    for arm, get in (
        ("dense", lambda s: r07["paired_by_seed"][s]["dense"]),
        ("occ16", lambda s: r07["paired_by_seed"][s]["occ"]),
        ("occ8", lambda s: occ8[s]),
    ):
        pools[arm] = {m: pool([get(s)[m] for s in ("0", "1", "2")])
                      for m in METRICS}

    out = {
        "experiment": (
            "Placed-sample count at the occ training stage (EVAL_r09): the "
            "EVAL_r07 occ recipe (6k dense warmup at N48 with the "
            "8->16->32 K-schedule, then proposal-placed steps at floor "
            "0.3) with occ_train=8 instead of 16 — half the render-core "
            "and composite work per placed step.  PAIRED 3 seeds against "
            "the EVAL_r07 dense and occ16 arms (identical W384 D8 N48 K32 "
            "config, 20k iters, 128px anti-aliased scene, 4096 rays/step, "
            "one v5e chip); all evals dense N48 through cli.eval."
        ),
        "paired_by_seed": paired,
        "pools_n3": pools,
    }

    if "occ12_s0" in runs and "eval" in runs["occ12_s0"]:
        e12 = runs["occ12_s0"]["eval"]
        out["ablation_occ12_seed0"] = {
            "eval": {k: round(float(e12[k]), 4) for k in METRICS},
            "vs": {
                "dense_s0": r07["paired_by_seed"]["0"]["dense"]["psnr"],
                "occ16_s0": r07["paired_by_seed"]["0"]["occ"]["psnr"],
                "occ8_s0": round(float(occ8["0"]["psnr"]), 4),
            },
            "step_rays_per_sec": args.occ12_rps,
        }

    den_r = r07["throughput_v5e"]["dense_step_rays_per_sec"]
    occ16_r = r07["throughput_v5e"]["occ_step_rays_per_sec"]
    t = 6000 / den_r + 14000 / args.occ8_rps
    out["throughput_v5e"] = {
        "dense_step_rays_per_sec": den_r,
        "occ16_step_rays_per_sec": occ16_r,
        "occ8_step_rays_per_sec": args.occ8_rps,
        "occ8_vs_north_star": round(args.occ8_rps / 1e6, 4),
        "schedule_avg_rays_per_sec": round(20000 / t),
        "schedule_speedup_vs_dense": round((20000 / t) / den_r, 2),
        "note": (
            "occ8 step rate from bench_train (32k-ray batches, n_inner "
            "scan, includes placement + proposal co-train tax); schedule "
            "average covers the 6k dense warmup at the dense rate."
        ),
    }

    out["read"] = "FILLED_AFTER_RESULTS"
    with open(os.path.join(REPO, "EVAL_r09.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["pools_n3"], indent=1))
    print("schedule_avg", out["throughput_v5e"]["schedule_avg_rays_per_sec"])


if __name__ == "__main__":
    main()
