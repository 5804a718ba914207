"""Aggregate the wall-matched frontier study into EVAL_r15.json.

Pairs each wall-matched arm (occ8 @ ~26k iters, cand64 @ ~21k iters —
scripts/wallmatched_experiment.py) against the SAME seed's occ12@20k
frontier run (EVAL_r09) and its own iteration-matched 20k result
(EVAL_r09 occ8 / EVAL_r14 cand64), so the artifact answers: does the
faster step rate win once it is allowed to spend its speed on more steps?

    PYTHONPATH=/root/repo python scripts/aggregate_r15.py [--read "..."]
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
METRICS = ("psnr", "ssim", "nll", "ause")


def pool(vals_by_metric):
    out = {}
    for m in METRICS:
        a = np.asarray([v[m] for v in vals_by_metric], np.float64)
        out[m] = {"mean": round(float(a.mean()), 4),
                  "std": round(float(a.std(ddof=0)), 4)}
    out["n_seeds"] = len(vals_by_metric)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", default=os.path.join(REPO, "EVAL_r15_sweep.json"))
    ap.add_argument("--out", default=os.path.join(REPO, "EVAL_r15.json"))
    ap.add_argument("--read", default="",
                    help="one-paragraph verdict; omitted when empty")
    args = ap.parse_args()

    runs = json.load(open(args.sweep))["wallmatched"]
    r09 = json.load(open(os.path.join(REPO, "EVAL_r09.json")))
    r14 = json.load(open(os.path.join(REPO, "EVAL_r14.json")))

    paired = {}
    for s in sorted(r09["paired_by_seed"]):
        row = {"occ12_20k": {m: r09["paired_by_seed"][s]["occ12"][m]
                             for m in METRICS}}
        # iteration-matched references for each arm
        row["occ8_20k"] = {m: r09["paired_by_seed"][s]["occ8"][m]
                           for m in METRICS}
        row["cand64_20k"] = {m: r14["paired_by_seed"][s]["occ12_cand64"][m]
                             for m in METRICS}
        for arm in ("occ8_wall", "cand64_wall"):
            key = f"{arm}_s{s}"
            if key in runs and "eval" in runs[key]:
                e = runs[key]["eval"]
                if "seed" in e and int(e["seed"]) != int(s):
                    raise SystemExit(f"{key}: summary seed {e['seed']} != {s}")
                row[arm] = {m: round(float(e[m]), 4) for m in METRICS}
                row[f"{arm}_iters"] = runs[key]["iters"]
                row[f"{arm}_delta_psnr_vs_occ12_20k"] = round(
                    row[arm]["psnr"] - row["occ12_20k"]["psnr"], 4)
                row[f"{arm}_delta_nll_vs_occ12_20k"] = round(
                    row[arm]["nll"] - row["occ12_20k"]["nll"], 4)
        paired[s] = row

    seeds = sorted(paired)
    pooled = {}
    for arm in ("occ12_20k", "occ8_20k", "cand64_20k",
                "occ8_wall", "cand64_wall"):
        done = [paired[s][arm] for s in seeds if arm in paired[s]]
        if len(done) == len(seeds):
            pooled[arm] = pool(done)

    # Verdict from explicit numeric criteria (VERDICT r04 task 4): an arm
    # is REJECTED at matched wall if pooled ΔPSNR vs occ12_20k < -0.25 dB
    # AND it is worse at a majority of seeds; it REPLACES the frontier if
    # pooled ΔPSNR >= -0.1 dB and pooled NLL is no worse; anything else is
    # AMBIGUOUS (add seeds before calling it).
    verdict_parts = []
    for arm in ("occ8_wall", "cand64_wall"):
        if arm not in pooled:
            continue
        dp = [paired[s][f"{arm}_delta_psnr_vs_occ12_20k"]
              for s in seeds if arm in paired[s]]
        d_pool = round(pooled[arm]["psnr"]["mean"]
                       - pooled["occ12_20k"]["psnr"]["mean"], 4)
        d_nll = round(pooled[arm]["nll"]["mean"]
                      - pooled["occ12_20k"]["nll"]["mean"], 4)
        n_worse = sum(1 for d in dp if d < 0)
        if d_pool < -0.25 and n_worse * 2 > len(dp):
            call = "REJECTED"
        elif d_pool >= -0.1 and d_nll <= 0.0:
            call = "NEW FRONTIER"
        else:
            call = "AMBIGUOUS (add seeds)"
        verdict_parts.append(
            f"{arm}: {call} — pooled ΔPSNR {d_pool:+.2f} dB vs occ12_20k "
            f"(worse at {n_worse}/{len(dp)} seeds), ΔNLL {d_nll:+.2f} nat, "
            f"over {len(dp)} paired seeds.")
    verdict = "  ".join(verdict_parts)

    out = {
        "experiment": (
            "Wall-matched train-frontier study (EVAL_r15, VERDICT r03 "
            "task 2): the occ8 (878k rays/s) and cand64 (678k) arms were "
            "rejected at MATCHED ITERS (EVAL_r09/r14); here each trains "
            "the EXTRA steps its measured device rate buys in occ12@20k's "
            "device-time budget (occ stage 14000 -> 19976 / 15056 steps; "
            "warmup + K-schedule boundaries held at absolute steps), 3 "
            "paired seeds, same scene/recipe/eval as EVAL_r09."
        ),
        "hardware": "1x TPU v5e, fused render core",
        "dataset_fetch_attempt": (
            "scripts/fetch_datasets.sh re-attempted this round "
            "(2026-08-20): gdown absent; direct urllib to "
            "drive.google.com AND cseweb.ucsd.edu fails with URLError "
            "'Name or service not known' — zero-egress confirmed again; "
            "genuine LF/LLFF data remains environmental (EVAL_r10/r14 "
            "prior records)."
        ),
        "iters": {arm: next((runs[k]["iters"] for k in runs
                             if k.startswith(arm)), None)
                  for arm in ("occ8_wall", "cand64_wall")},
        "rate_basis": {
            "occ12_rays_per_sec": 615300, "occ8_rays_per_sec": 877972,
            "cand128_rays_per_sec": 630313, "cand64_rays_per_sec": 677877,
        },
        "paired_by_seed": paired,
        "pooled": pooled,
        "verdict": verdict,
    }
    if args.read:
        out["read"] = args.read
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print("wrote", args.out)
    print(json.dumps(pooled, indent=1))


if __name__ == "__main__":
    main()
