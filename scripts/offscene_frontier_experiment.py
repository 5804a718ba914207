"""EVAL_r16: the occ12 frontier recipe validated OFF the tuning scene
(VERDICT r03 task 3).

Every train-frontier call so far (occ12 vs occ8/occ16, floor 0.3,
cand128 — EVAL_r07..r14) was tuned on the 128px synthetic two-sphere
scene.  This experiment runs the EXACT EVAL_r09 frontier recipe (W384,
occ_train=12, floor 0.3, K-schedule 8:0,16:4000,32:8000, dense warmup to
6000) through the minicapture REAL-CAPTURE path (factor-2 minify cache ->
NDC rays -> COLMAP sparse-depth supervision — the same code path as
configs/fern.txt / africa_ds.txt, scripts/real_capture_quality.py),
paired at 20k iters against its occ16 and dense arms, plus ONE run at
the reference's own 100k headline schedule
(/root/reference/run_nerf_uncertainty_NF.py:923, train_NF.sh).

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/offscene_frontier_experiment.py
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.environ.get("R16_OUT", os.path.join(REPO, "EVAL_r16_sweep.json"))
WORKROOT = os.environ.get("R16_WORKROOT", "/tmp/cfnerf_r16")
LOG = os.environ.get("R16_LOG", "/tmp/r16_runs.log")
SEED = int(os.environ.get("R16_SEED", "0"))

KSCHED = "8:0,16:4000,32:8000"

ARMS = {
    "dense_20k": dict(n_iters=20000, occ_train=0),
    "occ16_20k": dict(n_iters=20000, occ_train=16),
    "occ12_20k": dict(n_iters=20000, occ_train=12),
    "occ12_100k": dict(n_iters=100000, occ_train=12),
}
# R16_ARMS=occ12_20k,dense_20k runs a subset (the 100k arm is ~3h on its
# own — schedule it separately so the 20k deliverables land first)
if os.environ.get("R16_ARMS"):
    _sel = os.environ["R16_ARMS"].split(",")
    ARMS = {k: v for k, v in ARMS.items() if k in _sel}


def run_one(name: str, arm: dict, log_fh) -> dict:
    workdir = os.path.join(WORKROOT, name)
    cmd = [
        sys.executable, os.path.join(REPO, "scripts", "real_capture_quality.py"),
        "--workdir", workdir,
        "--n_iters", str(arm["n_iters"]), "--seed", str(SEED),
        "--netwidth", "384", "--N_samples", "48",
        "--k_schedule", KSCHED,
    ]
    if arm["occ_train"]:
        cmd += ["--occ_train", str(arm["occ_train"]),
                "--occ_train_from", "6000", "--occ_train_floor", "0.3"]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    t0 = time.time()
    proc = subprocess.run(cmd, env=env, stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT, text=True)
    log_fh.write(f"\n===== {name} rc={proc.returncode} =====\n")
    log_fh.write(proc.stdout[-8000:])
    log_fh.flush()
    entry = dict(arm, wall_s=round(time.time() - t0, 1), rc=proc.returncode)
    summary_path = os.path.join(workdir, "summary.json")
    if proc.returncode == 0 and os.path.exists(summary_path):
        entry["eval"] = json.load(open(summary_path))
    else:
        entry["error_tail"] = proc.stdout[-2000:]
    return entry


def main() -> None:
    runs = {}
    if os.path.exists(OUT):
        runs = json.load(open(OUT)).get("offscene", {})
        print(f"resuming: {sorted(runs)} already done")
    with open(LOG, "a") as log_fh:
        for name, arm in ARMS.items():
            if name in runs and runs[name].get("rc") == 0 and "eval" in runs[name]:
                continue
            print(f"[{time.strftime('%H:%M:%S')}] running {name} "
                  f"(iters={arm['n_iters']}, occ={arm['occ_train']})",
                  flush=True)
            runs[name] = run_one(name, arm, log_fh)
            if (runs[name]["rc"] != 0
                    and "remote_compile" in runs[name].get("error_tail", "")):
                print("  retrying after remote_compile flake", flush=True)
                runs[name] = run_one(name, arm, log_fh)
            with open(OUT, "w") as f:
                json.dump({"offscene": runs}, f, indent=1)
            e = runs[name].get("eval", {})
            print(f"  -> rc={runs[name]['rc']} psnr={e.get('psnr')} "
                  f"nll={e.get('nll')} wall={runs[name]['wall_s']}s",
                  flush=True)
    print("sweep complete:", OUT)


if __name__ == "__main__":
    main()
