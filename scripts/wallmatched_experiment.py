"""EVAL_r15: wall-matched train-frontier study (VERDICT r03 task 2).

EVAL_r09/r14 rejected occ_train=8 (878k rays/s) and occ_candidates=64
(678k) at MATCHED ITERATIONS (20k) — but at matched wall-clock they train
more steps than the occ12/cand128 frontier (615k/630k rays/s).  The
deployment-honest question the 1M-north-star framing implies: does the
faster arm WIN when given the same wall budget?

Protocol: identical to EVAL_r09 (128px anti-aliased two-sphere scene,
W384 D8 N48 K32, K-schedule 8:0,16:4000,32:8000, dense warmup to step
6000, occ placed sampling after, floor 0.3, 4096 rays/step, 3 paired
seeds, dense-N48 eval via cli.eval) EXCEPT the total steps: the occ stage
is extended by the measured device-rate ratio so each arm spends the same
device time as occ12@20k.  Warmup and K-schedule boundaries stay at their
ABSOLUTE step indices (they are identical work across arms; scaling them
would change the comparison).

  occ stage steps   = 14000 x (rate_fast / rate_occ12)
  occ8   @ 878.0k/615.3k -> 14000 x 1.4269 = 19976 -> iters 25976
  cand64 @ 677.9k/630.3k -> 14000 x 1.0755 = 15056 -> iters 21056

(Rates: EVAL_r09 aggregation constants for occ8/occ12 at the 4096-ray
step; EVAL_r14 step_rate_rays_per_sec for cand64/cand128 at 32k — the
best same-process A/B measurements available; host wall from the r09/r14
logs is contention-noisy, e.g. occ12_s1 trained 1798s vs s2's 647s.)

Reference surface being beaten: the dense training schedule,
/root/reference/run_nerf_uncertainty_NF.py:510-532 (hardcoded 96+32
z-schedule) + :923 (100k iters).

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/wallmatched_experiment.py
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/aggregate_r15.py
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.environ.get("R15_OUT", os.path.join(REPO, "EVAL_r15_sweep.json"))
OUTDIR = os.environ.get("R15_OUTDIR", "/tmp/cfnerf_r15")
LOG = os.environ.get("R15_LOG", "/tmp/r15_runs.log")
SEEDS = (0, 1, 2)

# occ-stage extension by measured device step-rate ratios (docstring)
OCC12_RATE = 615300.0   # EVAL_r09
OCC8_RATE = 877972.0    # EVAL_r09
CAND128_RATE = 630313.0  # EVAL_r14 (32k-ray batch A/B)
CAND64_RATE = 677877.0   # EVAL_r14
WARMUP = 6000
OCC_STEPS_20K = 20000 - WARMUP

ARMS = {
    "occ8_wall": dict(
        occ_train=8,
        iters=WARMUP + round(OCC_STEPS_20K * OCC8_RATE / OCC12_RATE),
    ),
    "cand64_wall": dict(
        occ_train=12, occ_train_candidates=64,
        iters=WARMUP + round(OCC_STEPS_20K * CAND64_RATE / CAND128_RATE),
    ),
}


def run_one(name: str, arm: dict, seed: int, log_fh) -> dict:
    cmd = [
        sys.executable, os.path.join(REPO, "scripts", "demo_synthetic.py"),
        "--outdir", OUTDIR, "--res", "128", "--n_train", "50", "--n_val", "4",
        "--supersample", "4",
        "--netwidth", "384", "--netdepth", "8",
        "--N_rand", "4096", "--iters", str(arm["iters"]),
        "--expname", f"r15_{name}_s{seed}",
        "--N_samples", "48", "--K_samples", "32",
        "--k_schedule", "8:0,16:4000,32:8000",
        "--occ_train", str(arm["occ_train"]),
        "--occ_train_from", str(WARMUP),
        "--occ_train_floor", "0.3",
        "--seed", str(seed),
    ]
    if arm.get("occ_train_candidates"):
        cmd += ["--occ_train_candidates", str(arm["occ_train_candidates"])]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    t0 = time.time()
    proc = subprocess.run(cmd, env=env, stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT, text=True)
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


def main() -> None:
    runs = {}
    if os.path.exists(OUT):
        runs = json.load(open(OUT)).get("wallmatched", {})
        print(f"resuming: {sorted(runs)} already done")
    with open(LOG, "a") as log_fh:
        for seed in SEEDS:
            for name, arm in ARMS.items():
                key = f"{name}_s{seed}"
                if key in runs and runs[key].get("rc") == 0 and "eval" in runs[key]:
                    continue
                print(f"[{time.strftime('%H:%M:%S')}] running {key} "
                      f"(iters={arm['iters']})", flush=True)
                runs[key] = run_one(name, arm, seed, log_fh)
                if (runs[key]["rc"] != 0
                        and "remote_compile" in runs[key].get("error_tail", "")):
                    # transient compile-tunnel flake (occ8_wall_s0 hit
                    # "response body closed before all bytes were read"
                    # mid-run) — one immediate retry
                    print(f"  retrying {key} after remote_compile flake",
                          flush=True)
                    runs[key] = run_one(name, arm, seed, log_fh)
                with open(OUT, "w") as f:
                    json.dump({"wallmatched": runs}, f, indent=1)
                e = runs[key].get("eval", {})
                print(f"  -> rc={runs[key]['rc']} "
                      f"psnr={e.get('psnr')} nll={e.get('nll')} "
                      f"wall={runs[key]['wall_s']}s", flush=True)
    print("sweep complete:", OUT)


if __name__ == "__main__":
    main()
