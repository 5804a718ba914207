"""Aggregate the r09 occ-train depth-count evidence into EVAL_r09.json.

Pairs the occ_train=8 and occ_train=12 seed runs (EVAL_r09_sweep.json,
key occ8_screen_20000) against the EVAL_r07 dense and occ(N=16) arms
(identical config/seeds/scene), so the artifact answers one question: how
far can the placed samples per ray be cut (N=16 -> 12 -> 8, the train-side
lever toward the 1M rays/s north-star) before the floor-0.3 placement
starves?

Seeds are derived from the keys actually present in the sweep file; any
arm with fewer than 3 completed seeds is reported as a partial ablation
rather than a pooled verdict (ADVICE r02: no hard-coded seed lists).

    PYTHONPATH=/root/repo python scripts/aggregate_r09.py \
        [--occ8_rps 877972] [--occ12_rps 615300] [--read "..."]
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
METRICS = ("psnr", "ssim", "nll", "ause")


def arm_seeds(runs: dict, prefix: str) -> dict:
    """Map seed-string -> eval dict for completed runs named <prefix>_s<k>."""
    out = {}
    for name, entry in runs.items():
        if name.startswith(prefix + "_s") and "eval" in entry:
            out[name[len(prefix) + 2:]] = entry["eval"]
    return out


def pool(vals) -> dict:
    a = np.asarray(vals, dtype=np.float64)
    return {"mean": round(float(a.mean()), 4),
            "std": round(float(a.std(ddof=1)), 4) if a.size > 1 else None}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--occ8_rps", type=float, default=877972.0,
                    help="measured occ_n=8 step throughput (bench_train)")
    ap.add_argument("--occ12_rps", type=float, default=615300.0)
    ap.add_argument("--read", default="",
                    help="one-paragraph verdict written into the artifact; "
                         "omitted from the JSON when empty (never a "
                         "placeholder)")
    args = ap.parse_args()

    sweep = json.load(open(os.path.join(REPO, "EVAL_r09_sweep.json")))
    r07 = json.load(open(os.path.join(REPO, "EVAL_r07.json")))
    runs = sweep["occ8_screen_20000"]

    arms = {"occ8": arm_seeds(runs, "occ8"), "occ12": arm_seeds(runs, "occ12")}
    r07_seeds = sorted(r07["paired_by_seed"])

    paired = {}
    for s in r07_seeds:
        d = r07["paired_by_seed"][s]["dense"]
        o = r07["paired_by_seed"][s]["occ"]
        row = {
            "dense": {k: d[k] for k in METRICS},
            "occ16": {k: o[k] for k in METRICS},
        }
        for arm, evs in arms.items():
            if s in evs:
                e = evs[s]
                row[arm] = {k: round(float(e[k]), 4) for k in METRICS}
                row[f"{arm}_delta_psnr_vs_dense"] = round(e["psnr"] - d["psnr"], 4)
                row[f"{arm}_delta_psnr_vs_occ16"] = round(e["psnr"] - o["psnr"], 4)
                row[f"{arm}_delta_nll_vs_dense"] = round(e["nll"] - d["nll"], 4)
        paired[s] = row

    pools, partial = {}, {}
    baseline_arms = {
        "dense": {s: r07["paired_by_seed"][s]["dense"] for s in r07_seeds},
        "occ16": {s: r07["paired_by_seed"][s]["occ"] for s in r07_seeds},
    }
    for arm, evs in {**baseline_arms, **arms}.items():
        done = sorted(set(evs) & set(r07_seeds))
        stats = {m: pool([evs[s][m] for s in done]) for m in METRICS}
        if len(done) >= 3:
            pools[arm] = dict(stats, n_seeds=len(done))
        elif done:
            partial[arm] = dict(stats, n_seeds=len(done), seeds=done,
                                note="fewer than 3 paired seeds — "
                                     "ablation only, not a pooled verdict")
    if not arms["occ8"] and not arms["occ12"]:
        raise SystemExit("no completed occ8/occ12 runs in EVAL_r09_sweep.json")

    out = {
        "experiment": (
            "Placed-sample count at the occ training stage (EVAL_r09): the "
            "EVAL_r07 occ recipe (6k dense warmup at N48 with the "
            "8->16->32 K-schedule, then proposal-placed steps at floor "
            "0.3) with occ_train in {8, 12} instead of 16.  PAIRED seeds "
            "against the EVAL_r07 dense and occ16 arms (identical W384 D8 "
            "N48 K32 config, 20k iters, 128px anti-aliased scene, 4096 "
            "rays/step, one v5e chip); all evals dense N48 through "
            "cli.eval."
        ),
        "paired_by_seed": paired,
        "pools": pools,
        **({"partial_arms": partial} if partial else {}),
    }

    den_r = r07["throughput_v5e"]["dense_step_rays_per_sec"]
    occ16_r = r07["throughput_v5e"]["occ_step_rays_per_sec"]

    def sched_avg(occ_rps):
        # MODELED blend, not a wall measurement: 6k dense-warmup steps at
        # the measured dense device rate + 14k placed steps at the measured
        # occ device rate (both from bench_train's 32k-ray n_inner scan).
        t = 6000 / den_r + 14000 / occ_rps
        return round(20000 / t)

    out["throughput_v5e"] = {
        "dense_step_rays_per_sec": den_r,
        "occ16_step_rays_per_sec": occ16_r,
        "occ12_step_rays_per_sec": args.occ12_rps,
        "occ8_step_rays_per_sec": args.occ8_rps,
        "occ8_vs_north_star": round(args.occ8_rps / 1e6, 4),
        "occ12_vs_north_star": round(args.occ12_rps / 1e6, 4),
        "schedule_avg_rays_per_sec_modeled": {
            "occ16": sched_avg(occ16_r),
            "occ12": sched_avg(args.occ12_rps),
            "occ8": sched_avg(args.occ8_rps),
        },
        "note": (
            "Step rates are bench_train device measurements (32k-ray "
            "batches, n_inner scan, placement + proposal co-train tax "
            "included).  schedule_avg_rays_per_sec_modeled is a MODELED "
            "blend of those device rates over the 6k-dense + 14k-placed "
            "schedule, not a measured 4096-rays/step training wall rate."
        ),
    }

    if args.read:
        out["read"] = args.read

    with open(os.path.join(REPO, "EVAL_r09.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({"pools": pools, **({"partial": partial} if partial else {})}, indent=1))
    print("schedule_avg_modeled",
          out["throughput_v5e"]["schedule_avg_rays_per_sec_modeled"])


if __name__ == "__main__":
    main()
