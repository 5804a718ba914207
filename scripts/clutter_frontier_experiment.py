"""EVAL_r19: the frontier recipe on a HARDER procedural scene
(VERDICT r03 task 6 — the defense against single-scene tuning).

Every frontier call so far was tuned on the 128px two-sphere scene.  This
runs the occ12 frontier recipe against its occ16 and dense arms on the
new 'clutter' scene (scripts/demo_synthetic.py ray_trace_clutter: eight
textured spheres, mutual occlusion, cast shadows, 256px, 8 val views),
2 paired seeds per arm, dense-N48 eval — asking whether the occ12-
matches-occ16-beats-dense ordering (EVAL_r07/r09) transfers.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/clutter_frontier_experiment.py
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.environ.get("R19_OUT", os.path.join(REPO, "EVAL_r19.json"))
OUTDIR = os.environ.get("R19_OUTDIR", "/tmp/cfnerf_r19")
LOG = os.environ.get("R19_LOG", "/tmp/r19_runs.log")
ITERS = int(os.environ.get("R19_ITERS", "20000"))
SEEDS = (0, 1)
METRICS = ("psnr", "ssim", "nll", "ause")

ARMS = {
    "dense": dict(occ_train=0),
    "occ16": dict(occ_train=16),
    "occ12": dict(occ_train=12),
}


def run_one(name, arm, seed, log_fh):
    cmd = [
        sys.executable, os.path.join(REPO, "scripts", "demo_synthetic.py"),
        "--outdir", OUTDIR, "--scene", "clutter",
        "--res", "256", "--n_train", "60", "--n_val", "8",
        "--supersample", "4",
        "--netwidth", "384", "--netdepth", "8",
        "--N_rand", "4096", "--iters", str(ITERS),
        "--expname", f"r19_{name}_s{seed}",
        "--N_samples", "48", "--K_samples", "32",
        "--k_schedule", f"8:0,16:{int(0.2 * ITERS)},32:{int(0.4 * ITERS)}",
        "--seed", str(seed),
    ]
    if arm["occ_train"]:
        cmd += ["--occ_train", str(arm["occ_train"]),
                "--occ_train_from", str(int(0.3 * ITERS)),
                "--occ_train_floor", "0.3"]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    t0 = time.time()
    proc = subprocess.run(cmd, env=env, stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT, text=True)
    log_fh.write(f"\n===== {name}_s{seed} rc={proc.returncode} =====\n")
    log_fh.write(proc.stdout[-8000:])
    log_fh.flush()
    entry = dict(arm, seed=seed, wall_s=round(time.time() - t0, 1),
                 rc=proc.returncode)
    m = re.search(r"DEMO SUMMARY: (\{.*\})", proc.stdout)
    if m:
        entry["eval"] = json.loads(m.group(1))
    else:
        entry["error_tail"] = proc.stdout[-2000:]
    return entry


def pooled_wall(runs, name):
    """Mean train wall over the seeds that completed for this arm."""
    walls = [runs[k]["eval"]["train_wall_s"] for k in runs
             if k.startswith(name + "_s") and "eval" in runs[k]
             and "train_wall_s" in runs[k]["eval"]]
    return float(np.mean(walls)) if walls else 0.0


def main() -> None:
    runs = {}
    if os.path.exists(OUT):
        runs = json.load(open(OUT)).get("runs", {})
        print(f"resuming: {sorted(runs)} done")
    with open(LOG, "a") as log_fh:
        for seed in SEEDS:
            for name, arm in ARMS.items():
                key = f"{name}_s{seed}"
                if key in runs and runs[key].get("rc") == 0 and "eval" in runs[key]:
                    continue
                print(f"[{time.strftime('%H:%M:%S')}] running {key}", flush=True)
                runs[key] = run_one(name, arm, seed, log_fh)
                if (runs[key]["rc"] != 0
                        and "remote_compile" in runs[key].get("error_tail", "")):
                    print(f"  retrying after remote_compile flake", flush=True)
                    runs[key] = run_one(name, arm, seed, log_fh)
                json.dump({"runs": runs}, open(OUT, "w"), indent=1)
                e = runs[key].get("eval", {})
                print(f"  -> rc={runs[key]['rc']} psnr={e.get('psnr')} "
                      f"nll={e.get('nll')} wall={runs[key]['wall_s']}s",
                      flush=True)

    # aggregate
    paired, pooled = {}, {}
    for seed in SEEDS:
        row = {}
        for name in ARMS:
            e = runs.get(f"{name}_s{seed}", {}).get("eval")
            if e and "psnr" in e:
                row[name] = {m: round(float(e[m]), 4) for m in METRICS}
        if "occ12" in row and "dense" in row:
            row["occ12_delta_psnr_vs_dense"] = round(
                row["occ12"]["psnr"] - row["dense"]["psnr"], 4)
        if "occ12" in row and "occ16" in row:
            row["occ12_delta_psnr_vs_occ16"] = round(
                row["occ12"]["psnr"] - row["occ16"]["psnr"], 4)
        paired[str(seed)] = row
    for name in ARMS:
        vals = [paired[str(s)][name] for s in SEEDS
                if name in paired[str(s)]]
        if len(vals) == len(SEEDS):
            pooled[name] = {
                m: {"mean": round(float(np.mean([v[m] for v in vals])), 4),
                    "std": round(float(np.std([v[m] for v in vals])), 4)}
                for m in METRICS}

    out = {
        "experiment": (
            "Frontier recipe on the harder 'clutter' scene (EVAL_r19, "
            "VERDICT r03 task 6): occ12 vs occ16 vs dense at the W384 N48 "
            "K-schedule recipe, 20k iters, 4096 rays/step, 2 paired seeds, "
            "256px 8-textured-sphere scene with occlusion + cast shadows "
            "(ray_trace_clutter), 8 val views, dense-N48 eval — does the "
            "EVAL_r07/r09 occ ordering transfer off the tuning scene?"
        ),
        "hardware": "1x TPU v5e, fused render core",
        "iters": ITERS,
        "runs": runs,
        "paired_by_seed": paired,
        "pooled": pooled,
    }

    # Verdict from explicit numeric criteria (VERDICT r04 task 4): the occ
    # ordering "transfers" to the clutter scene if pooled occ12 is within
    # 0.25 dB of occ16 AND both occ arms beat dense on pooled PSNR.
    if all(a in pooled for a in ARMS):
        d12_16 = round(pooled["occ12"]["psnr"]["mean"]
                       - pooled["occ16"]["psnr"]["mean"], 4)
        d12_dense = round(pooled["occ12"]["psnr"]["mean"]
                          - pooled["dense"]["psnr"]["mean"], 4)
        d16_dense = round(pooled["occ16"]["psnr"]["mean"]
                          - pooled["dense"]["psnr"]["mean"], 4)
        transfers = d12_16 >= -0.25 and d12_dense > 0 and d16_dense > 0
        out["verdict"] = (
            f"occ ordering {'TRANSFERS' if transfers else 'DOES NOT transfer'} "
            f"to the harder clutter scene over {len(SEEDS)} paired seeds: "
            f"occ12 pools {pooled['occ12']['psnr']['mean']:.2f} dB "
            f"({d12_16:+.2f} vs occ16, {d12_dense:+.2f} vs dense; "
            f"occ16 {d16_dense:+.2f} vs dense), occ12 NLL "
            f"{pooled['occ12']['nll']['mean']:+.2f} vs dense "
            f"{pooled['dense']['nll']['mean']:+.2f} nat, at "
            f"{pooled_wall(runs, 'dense') / max(pooled_wall(runs, 'occ12'), 1e-9):.1f}x "
            f"dense's training speed.")

    json.dump(out, open(OUT, "w"), indent=1)
    print("wrote", OUT)
    print(json.dumps(pooled, indent=1))
    print(out.get("verdict", ""))


if __name__ == "__main__":
    main()
