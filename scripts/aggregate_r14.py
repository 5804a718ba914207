"""Assemble EVAL_r14.json — placement-CDF resolution at the train frontier:
does occ_train=12 keep its matched quality with 64 placement candidates
instead of 128?  The candidate grid is the proposal-evaluation resolution
of the inverse CDF (ops/occupancy.py place_from_sigma); halving it
microbenched +7% step rate (678k vs 630k rays/s at the 32k-ray batch,
same-process A/B) because the placement prefix-matmul and proposal MLP
shrink with C.

Pairs 3 fresh cand64 seeds (scripts/demo_synthetic.py --occ_train 12
--occ_train_candidates 64, identical W384 D8 N48 K32 / 20k iters / 128px
anti-aliased scene / 4096 rays/step protocol) against the EVAL_r09 occ12
(cand128) arm, seed by seed; all evals dense N48 via cli.eval.

If /tmp/r14_serving.json exists (written by hand from
scripts/probe_occ_candidates_serving.py + the --skip_train --eval_occ
re-evals of the cand64_s0 checkpoint), its contents are embedded as the
"serving_candidates" section — the eval-side half of the same
placement-CDF-resolution question.

    PYTHONPATH=/root/repo python scripts/aggregate_r14.py [logfile]
"""
from __future__ import annotations

import json
import sys

import numpy as np

METRICS = ("psnr", "ssim", "nll", "ause")


def pool(vals):
    return {
        m: {"mean": round(float(np.mean([v[m] for v in vals])), 4),
            "std": round(float(np.std([v[m] for v in vals])), 4)}
        for m in METRICS
    } | {"n_seeds": len(vals)}


def main() -> None:
    log = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r13_cand64.log"
    summaries = []
    with open(log) as f:
        for line in f:
            if line.startswith("DEMO SUMMARY:"):
                summaries.append(json.loads(line.split(":", 1)[1]))
    if len(summaries) != 3:
        raise SystemExit(
            f"{log}: found {len(summaries)} DEMO SUMMARY lines, need exactly "
            f"3 (seeds 0/1/2 in launch order) — wait for the screen or check "
            f"for a crashed run"
        )

    with open("EVAL_r09.json") as f:
        r09 = json.load(f)

    # pair by the seed recorded IN each summary when present (ADVICE r03:
    # launch-order pairing silently mis-pairs a reordered/mixed log);
    # older logs without a seed field keep the launch-order assumption
    if all("seed" in s for s in summaries):
        seeds = sorted(int(s["seed"]) for s in summaries)
        if seeds != [0, 1, 2]:
            raise SystemExit(f"{log}: DEMO SUMMARY seeds are {seeds}, "
                             "need exactly [0, 1, 2]")
        summaries.sort(key=lambda s: int(s["seed"]))

    paired = {}
    for i, s in enumerate(("0", "1", "2")):
        cand64 = {m: round(float(summaries[i][m]), 4) for m in METRICS}
        occ12 = {m: r09["paired_by_seed"][s]["occ12"][m] for m in METRICS}
        dense = {m: r09["paired_by_seed"][s]["dense"][m] for m in METRICS}
        paired[s] = {
            "dense": dense,
            "occ12_cand128": occ12,
            "occ12_cand64": cand64,
            "cand64_delta_psnr_vs_cand128": round(
                cand64["psnr"] - occ12["psnr"], 4),
            "cand64_delta_nll_vs_cand128": round(
                cand64["nll"] - occ12["nll"], 4),
            "cand64_train_wall_s": summaries[i].get("train_wall_s"),
        }

    pooled = {
        "occ12_cand128": pool(
            [paired[s]["occ12_cand128"] for s in paired]),
        "occ12_cand64": pool([paired[s]["occ12_cand64"] for s in paired]),
        "dense": pool([paired[s]["dense"] for s in paired]),
    }

    out = {
        "experiment": (
            "Placement-candidate resolution at the occ12 train frontier "
            "(EVAL_r14): --occ_candidates 64 vs the default 128 during "
            "proposal-placed training (occ_train=12, 6k dense warmup, "
            "floor 0.3, W384 D8 N48 K32, K-schedule 8/16/32, 20k iters, "
            "4096 rays/step, 128px anti-aliased scene). cand64 "
            "microbenched 677.9k vs 630.3k rays/s (+7.5%) at the 32k-ray "
            "batch (same-process A/B, bench.bench_train); this screen asks "
            "whether the coarser inverse-CDF grid costs quality. Paired "
            "against the EVAL_r09 occ12 (cand128) arm at identical seeds; "
            "all evals dense N48 via cli.eval."
        ),
        "hardware": "1x TPU v5e, fused render core",
        "dataset_fetch_attempt": (
            "scripts/fetch_datasets.sh re-attempted this session (2026-08-19): "
            "gdown absent and direct urllib to drive.google.com fails with "
            "DNS 'Name or service not known' — zero-egress environment "
            "confirmed again; genuine LF/LLFF data remains environmental "
            "(EVAL_r10 has the prior record)."
        ),
        "step_rate_rays_per_sec": {"cand128": 630313, "cand64": 677877,
                                   "batch": 32768},
        "paired_by_seed": paired,
        "pooled": pooled,
    }
    try:
        with open("/tmp/r14_serving.json") as f:
            out["serving_candidates"] = json.load(f)
    except FileNotFoundError:
        pass
    except json.JSONDecodeError as e:
        # a malformed side-file must not abort the aggregation after the
        # expensive runs (ADVICE r03)
        print(f"WARNING: /tmp/r14_serving.json unparseable ({e}); "
              "skipping serving_candidates embed", file=sys.stderr)
    with open("EVAL_r14.json", "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print("wrote EVAL_r14.json")
    print(json.dumps({"pooled": pooled}, indent=1))


if __name__ == "__main__":
    main()
