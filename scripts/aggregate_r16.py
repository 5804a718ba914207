"""Aggregate the off-scene frontier validation into EVAL_r16.json.

Pairs the occ12 frontier recipe against its occ16 and dense arms on the
minicapture REAL-CAPTURE path (scripts/offscene_frontier_experiment.py —
factor-2 minify -> NDC rays -> COLMAP sparse-depth supervision, the same
code path as configs/fern.txt / africa_ds.txt), answering VERDICT r03
task 3: does the occ12-matches-occ16 ordering tuned on the synthetic
two-sphere scene (EVAL_r09) transfer to the reference's real-data path,
and what does the recipe do at the reference's own 100k headline schedule
(/root/reference/run_nerf_uncertainty_NF.py:923 + train_NF.sh)?

    PYTHONPATH=/root/repo python scripts/aggregate_r16.py [--read "..."]
"""
from __future__ import annotations

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
METRICS = ("psnr", "ssim", "nll", "ause")
ARMS_20K = ("dense_20k", "occ16_20k", "occ12_20k")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", default=os.path.join(REPO, "EVAL_r16_sweep.json"))
    ap.add_argument("--out", default=os.path.join(REPO, "EVAL_r16.json"))
    ap.add_argument("--read", default="",
                    help="one-paragraph verdict; omitted when empty")
    args = ap.parse_args()

    runs = json.load(open(args.sweep))["offscene"]

    table = {}
    for name, entry in runs.items():
        e = entry.get("eval")
        if not e or "psnr" not in e:
            continue
        table[name] = {m: round(float(e[m]), 4) for m in METRICS if m in e}
        table[name]["train_wall_s"] = e.get("train_wall_s")
        table[name]["iters"] = entry.get("n_iters")

    missing = [a for a in ARMS_20K if a not in table]
    if missing:
        raise SystemExit(f"sweep incomplete: missing 20k arms {missing} "
                         f"(have {sorted(table)})")

    deltas = {}
    if "occ12_20k" in table:
        for ref in ("dense_20k", "occ16_20k"):
            if ref in table:
                deltas[f"occ12_vs_{ref.split('_')[0]}"] = {
                    m: round(table["occ12_20k"][m] - table[ref][m], 4)
                    for m in METRICS if m in table[ref]}
    if "occ12_100k" in table and "occ12_20k" in table:
        deltas["occ12_100k_vs_20k"] = {
            m: round(table["occ12_100k"][m] - table["occ12_20k"][m], 4)
            for m in METRICS}

    # Verdict from explicit numeric criteria (VERDICT r04 task 4): the
    # recipe "transfers" if occ12 is within 0.1 dB of BOTH dense and occ16
    # at 20k; the 100k NLL-overfit flag fires on a >1 nat held-out NLL rise.
    d_dense = deltas["occ12_vs_dense"]["psnr"]
    d_occ16 = deltas["occ12_vs_occ16"]["psnr"]
    transfers = d_dense >= -0.1 and d_occ16 >= -0.1
    verdict = (
        f"occ12 frontier recipe {'TRANSFERS to' if transfers else 'FAILS on'} "
        f"the real-capture path: at 20k it scores {d_dense:+.2f} dB PSNR vs "
        f"dense ({deltas['occ12_vs_dense']['nll']:+.2f} nat NLL, "
        f"{deltas['occ12_vs_dense']['ause']:+.3f} AUSE) and {d_occ16:+.2f} dB "
        f"vs occ16, at {table['dense_20k']['train_wall_s'] / max(table['occ12_20k']['train_wall_s'], 1e-9):.1f}x "
        f"dense's training speed.")
    if "occ12_100k_vs_20k" in deltas:
        d100 = deltas["occ12_100k_vs_20k"]
        overfit = d100["nll"] > 1.0
        verdict += (
            f"  At the reference's 100k schedule PSNR moves {d100['psnr']:+.2f} dB "
            f"but held-out NLL moves {d100['nll']:+.2f} nat"
            + (" — the EVAL_r11 long-schedule calibration blowup reproduces "
               "off-scene; use the 20k schedule or the dense cooldown "
               "(--occ_train_until) when NLL matters." if overfit else "."))

    out = {
        "experiment": (
            "Off-scene frontier validation (EVAL_r16, VERDICT r03 task 3): "
            "the EXACT EVAL_r09 occ12 frontier recipe (W384, occ_train=12, "
            "floor 0.3, K-schedule 8:0,16:4000,32:8000, dense warmup to "
            "6000) run through the minicapture real-capture path (factor-2 "
            "minify, NDC rays, COLMAP sparse-depth supervision — the "
            "configs/fern.txt code path), paired at 20k iters against its "
            "occ16 and dense arms, plus one run at the reference's 100k "
            "headline schedule."
        ),
        "hardware": "1x TPU v5e, fused render core",
        "scene": "minicapture fixture (real-capture path; genuine LF/LLFF "
                 "data remains unavailable — zero egress, see "
                 "dataset_fetch_attempt in EVAL_r15.json)",
        "arms": table,
        "deltas": deltas,
        "verdict": verdict,
        "runs_raw": {k: {kk: vv for kk, vv in v.items() if kk != "eval"}
                     for k, v in runs.items()},
    }
    if args.read:
        out["read"] = args.read
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print("wrote", args.out)
    print(json.dumps({"arms": table, "deltas": deltas}, indent=1))


if __name__ == "__main__":
    main()
