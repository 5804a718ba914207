"""EVAL_r20: close the cand64-at-matched-wall question (VERDICT r04 task 3).

EVAL_r15 left cand64_wall AMBIGUOUS at 3 paired seeds: pooled dPSNR
-0.24 dB vs occ12_20k but better at 2/3 seeds and better pooled NLL
(-6.07 vs -5.93), the gap entirely seed-1 driven with 2x the seed std.
This runs 2 MORE paired seeds (3, 4) of both arms — occ12_20k (the
frontier reference: occ_train=12, cand128, 20k iters) and cand64_wall
(cand64, 21056 iters = the extra steps its +7.5% step rate buys in the
same device-time budget, EVAL_r15 protocol) — then pools all 5 seeds
(0-2 from EVAL_r09/EVAL_r15, 3-4 from here) and writes the final
verdict under the same numeric criteria as aggregate_r15.

Scene/recipe identical to EVAL_r09/r15: 128px anti-aliased two-sphere,
W384 D8 N48 K32, K-schedule 8:0,16:4000,32:8000, dense warmup to 6000,
floor 0.3, 4096 rays/step, dense-N48 eval.

Reference surface being tuned: the inverse-CDF placement grid vs dense
stratified sampling at /root/reference/run_nerf_uncertainty_NF.py:510-532.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/cand64_closure_experiment.py
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
OUT = os.environ.get("R20_OUT", os.path.join(REPO, "EVAL_r20.json"))
OUTDIR = os.environ.get("R20_OUTDIR", "/tmp/cfnerf_r20")
LOG = os.environ.get("R20_LOG", "/tmp/r20_runs.log")
NEW_SEEDS = (3, 4)
METRICS = ("psnr", "ssim", "nll", "ause")

# identical to wallmatched_experiment.py (EVAL_r15)
CAND64_WALL_ITERS = 21056

ARMS = {
    "occ12_20k": dict(occ_train=12, iters=20000),
    "cand64_wall": dict(occ_train=12, occ_train_candidates=64,
                        iters=CAND64_WALL_ITERS),
}


def run_one(name: str, arm: dict, seed: int, log_fh) -> dict:
    cmd = [
        sys.executable, os.path.join(REPO, "scripts", "demo_synthetic.py"),
        "--outdir", OUTDIR, "--res", "128", "--n_train", "50", "--n_val", "4",
        "--supersample", "4",
        "--netwidth", "384", "--netdepth", "8",
        "--N_rand", "4096", "--iters", str(arm["iters"]),
        "--expname", f"r20_{name}_s{seed}",
        "--N_samples", "48", "--K_samples", "32",
        "--k_schedule", "8:0,16:4000,32:8000",
        "--occ_train", str(arm["occ_train"]),
        "--occ_train_from", "6000",
        "--occ_train_floor", "0.3",
        "--seed", str(seed),
    ]
    if arm.get("occ_train_candidates"):
        cmd += ["--occ_train_candidates", str(arm["occ_train_candidates"])]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    t0 = time.time()
    try:
        proc = subprocess.run(cmd, env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True,
                              timeout=4200)
    except subprocess.TimeoutExpired as te:
        # tunnel-outage guard (round 5: a first-compile hang ate 40 min
        # at 11s CPU): record and let the resumable driver retry later
        out = (te.stdout or b"")
        out = out.decode() if isinstance(out, bytes) else out
        proc = subprocess.CompletedProcess(
            cmd, 124, stdout=out + "\n[driver] killed: TimeoutExpired "
            f"after 4200s (remote_compile tunnel hang?)", stderr=None)
    log_fh.write(f"\n===== {name}_s{seed} (iters={arm['iters']}) "
                 f"rc={proc.returncode} =====\n")
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


def prior_seed_rows() -> dict:
    """Seeds 0-2: occ12_20k from EVAL_r09, cand64_wall from EVAL_r15."""
    r09 = json.load(open(os.path.join(REPO, "EVAL_r09.json")))
    r15 = json.load(open(os.path.join(REPO, "EVAL_r15.json")))
    rows = {}
    for s in sorted(r09["paired_by_seed"]):
        rows[s] = {
            "occ12_20k": {m: r09["paired_by_seed"][s]["occ12"][m]
                          for m in METRICS},
            "cand64_wall": {m: r15["paired_by_seed"][s]["cand64_wall"][m]
                            for m in METRICS},
            "source": "EVAL_r09/EVAL_r15",
        }
    return rows


def main() -> None:
    runs = {}
    if os.path.exists(OUT):
        runs = json.load(open(OUT)).get("runs", {})
        print(f"resuming: {sorted(runs)} done")
    with open(LOG, "a") as log_fh:
        for seed in NEW_SEEDS:
            for name, arm in ARMS.items():
                key = f"{name}_s{seed}"
                if key in runs and runs[key].get("rc") == 0 and "eval" in runs[key]:
                    continue
                print(f"[{time.strftime('%H:%M:%S')}] running {key} "
                      f"(iters={arm['iters']})", flush=True)
                runs[key] = run_one(name, arm, seed, log_fh)
                if (runs[key]["rc"] != 0
                        and "remote_compile" in runs[key].get("error_tail", "")):
                    # one immediate retry on transient compile-tunnel flakes
                    print(f"  retrying {key} after remote_compile flake",
                          flush=True)
                    runs[key] = run_one(name, arm, seed, log_fh)
                json.dump({"runs": runs}, open(OUT, "w"), indent=1)
                e = runs[key].get("eval", {})
                print(f"  -> rc={runs[key]['rc']} psnr={e.get('psnr')} "
                      f"nll={e.get('nll')} wall={runs[key]['wall_s']}s",
                      flush=True)

    # pool all 5 seeds
    paired = prior_seed_rows()
    for seed in NEW_SEEDS:
        row = {"source": "EVAL_r20"}
        for name in ARMS:
            e = runs.get(f"{name}_s{seed}", {}).get("eval")
            if e and "psnr" in e:
                row[name] = {m: round(float(e[m]), 4) for m in METRICS}
        paired[str(seed)] = row
    seeds = [s for s in sorted(paired)
             if "occ12_20k" in paired[s] and "cand64_wall" in paired[s]]
    pooled = {}
    for arm in ARMS:
        vals = [paired[s][arm] for s in seeds]
        pooled[arm] = {
            m: {"mean": round(float(np.mean([v[m] for v in vals])), 4),
                "std": round(float(np.std([v[m] for v in vals])), 4)}
            for m in METRICS}
        pooled[arm]["n_seeds"] = len(vals)
    for s in seeds:
        paired[s]["cand64_wall_delta_psnr"] = round(
            paired[s]["cand64_wall"]["psnr"] - paired[s]["occ12_20k"]["psnr"], 4)
        paired[s]["cand64_wall_delta_nll"] = round(
            paired[s]["cand64_wall"]["nll"] - paired[s]["occ12_20k"]["nll"], 4)

    # Same criteria as aggregate_r15, now at 5 seeds — the committed call.
    d_pool = round(pooled["cand64_wall"]["psnr"]["mean"]
                   - pooled["occ12_20k"]["psnr"]["mean"], 4)
    d_nll = round(pooled["cand64_wall"]["nll"]["mean"]
                  - pooled["occ12_20k"]["nll"]["mean"], 4)
    dp = [paired[s]["cand64_wall_delta_psnr"] for s in seeds]
    n_worse = sum(1 for d in dp if d < 0)
    if d_pool < -0.25 and n_worse * 2 > len(dp):
        call = "REJECTED — cand128 stays the train-side default"
    elif d_pool >= -0.1 and d_nll <= 0.0:
        call = ("NEW FRONTIER — cand64 at matched wall replaces cand128 "
                "as the train-side default")
    else:
        call = ("NO WIN — cand128 stays the train-side default (cand64's "
                "extra steps do not buy a quality edge and its seed "
                "variance is higher)")
    verdict = (
        f"cand64_wall vs occ12_20k over {len(seeds)} paired seeds: {call}. "
        f"Pooled ΔPSNR {d_pool:+.2f} dB (worse at {n_worse}/{len(dp)} "
        f"seeds; per-seed {', '.join(f'{d:+.2f}' for d in dp)}), "
        f"ΔNLL {d_nll:+.2f} nat, PSNR std "
        f"{pooled['cand64_wall']['psnr']['std']:.2f} vs "
        f"{pooled['occ12_20k']['psnr']['std']:.2f}.")

    out = {
        "experiment": (
            "cand64-at-matched-wall closure (EVAL_r20, VERDICT r04 task 3): "
            "2 additional paired seeds (3, 4) of occ12_20k (cand128 "
            "frontier) and cand64_wall (21056 iters — the steps its +7.5% "
            "step rate buys in occ12@20k's device-time budget), pooled "
            "with seeds 0-2 from EVAL_r09/EVAL_r15 into a 5-seed verdict "
            "under aggregate_r15's numeric criteria."
        ),
        "hardware": "1x TPU v5e, fused render core",
        "dataset_fetch_attempt": (
            "scripts/fetch_datasets.sh re-attempted round 5 (2026-08-20): "
            "gdown absent; direct urllib to drive.google.com AND "
            "cseweb.ucsd.edu fails with URLError 'Name or service not "
            "known' — zero-egress confirmed again; genuine LF/LLFF data "
            "remains environmental (EVAL_r10/r14/r15 prior records)."
        ),
        "iters": {name: arm["iters"] for name, arm in ARMS.items()},
        "runs": runs,
        "paired_by_seed": paired,
        "pooled": pooled,
        "verdict": verdict,
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print("wrote", OUT)
    print(json.dumps(pooled, indent=1))
    print(verdict)


if __name__ == "__main__":
    main()
