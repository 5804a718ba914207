"""EVAL_r21: ONE converged run of the FINAL frontier recipe at the
reference's 100k headline schedule, through the FULL real-data path
(VERDICT r04 task 6).

The recipe, as settled by rounds 3-5: W384 trunk (EVAL_r05), occ_train=12
with dense warmup to 6k / floor 0.3 / cand128 (EVAL_r09, off-scene
confirmed EVAL_r16, harder-scene confirmed EVAL_r19), K-schedule
8:0,16:4000,32:8000 (EVAL_r03), PLUS the dense-cooldown calibration lever
(--occ_train_until 90000 — EVAL_r08/r10: recovers held-out NLL at a small
PSNR give-back; EVAL_r16 reproduced the 100k NLL blowup it exists to fix,
+4.02 nat without it).

Path: minicapture LLFF+COLMAP fixture (the real-data stand-in; zero
egress) — factor-2 minify cache -> NDC rays -> COLMAP sparse-depth
supervision -> held-out K-sample eval (writes per-view uncertainty PLY
point clouds) -> occ-served spiral render with mp4.  Matches the
reference's own headline path: /root/reference/run_nerf_uncertainty_NF.py
:722-816 (LLFF+depth), :923 (100k schedule), train_NF.sh.

Pairings recorded in the artifact:
  - EVAL_r10 result (W512 occ16 100k, NLL 6.93) + its cooldown arm (5.61)
  - EVAL_r16 occ12_100k (W384, no cooldown, NLL 7.05) — the ablation this
    run's cooldown must beat
  - EVAL_r16 occ12_20k (the short-schedule calibration ceiling)

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/converged_frontier_experiment.py
"""
from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.environ.get("R21_OUT", os.path.join(REPO, "EVAL_r21.json"))
WORKDIR = os.environ.get("R21_WORKDIR", "/tmp/cfnerf_r21/occ12_100k_cool")
LOG = os.environ.get("R21_LOG", "/tmp/r21_runs.log")
METRICS = ("psnr", "ssim", "nll", "ause")


def run_training(log_fh) -> dict:
    cmd = [
        sys.executable, os.path.join(REPO, "scripts", "real_capture_quality.py"),
        "--workdir", WORKDIR,
        "--n_iters", "100000", "--seed", "0",
        "--netwidth", "384", "--N_samples", "48",
        "--k_schedule", "8:0,16:4000,32:8000",
        "--occ_train", "12", "--occ_train_from", "6000",
        "--occ_train_floor", "0.3", "--occ_train_until", "90000",
    ]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    t0 = time.time()
    try:
        proc = subprocess.run(cmd, env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True,
                              timeout=7200)
    except subprocess.TimeoutExpired as te:
        # tunnel-outage guard (round 5: a first-compile hang ate 40 min
        # at 11s CPU): record and let the resumable driver retry later
        out = (te.stdout or b"")
        out = out.decode() if isinstance(out, bytes) else out
        proc = subprocess.CompletedProcess(
            cmd, 124, stdout=out + "\n[driver] killed: TimeoutExpired "
            f"after 7200s (remote_compile tunnel hang?)", stderr=None)
    log_fh.write(f"\n===== occ12_100k_cool rc={proc.returncode} =====\n")
    log_fh.write(proc.stdout[-8000:])
    log_fh.flush()
    entry = {"wall_s": round(time.time() - t0, 1), "rc": proc.returncode}
    summary_path = os.path.join(WORKDIR, "summary.json")
    if proc.returncode == 0 and os.path.exists(summary_path):
        entry["eval"] = json.load(open(summary_path))
    else:
        entry["error_tail"] = proc.stdout[-2000:]
    return entry


def run_spiral(flags_str: str, log_fh) -> dict:
    """Occ-served spiral render (mp4) off the trained checkpoint — the
    deployment render path (EVAL_r06 serving point, C=64 per EVAL_r17)."""
    code = (
        "import sys, json\n"
        "from cfnerf_tpu.train.loop import train\n"
        "from cfnerf_tpu.utils.config import parse_args\n"
        f"flags = json.loads(sys.argv[1])\n"
        "args = parse_args(flags + ['--render_only', '--occ_eval', '16',"
        " '--occ_eval_candidates', '64'])\n"
        "train(args)\n"
    )
    cmd = [sys.executable, "-c", code, json.dumps(flags_str.split())]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    t0 = time.time()
    try:
        proc = subprocess.run(cmd, env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True,
                              timeout=7200)
    except subprocess.TimeoutExpired as te:
        # tunnel-outage guard (round 5: a first-compile hang ate 40 min
        # at 11s CPU): record and let the resumable driver retry later
        out = (te.stdout or b"")
        out = out.decode() if isinstance(out, bytes) else out
        proc = subprocess.CompletedProcess(
            cmd, 124, stdout=out + "\n[driver] killed: TimeoutExpired "
            f"after 7200s (remote_compile tunnel hang?)", stderr=None)
    log_fh.write(f"\n===== spiral rc={proc.returncode} =====\n")
    log_fh.write(proc.stdout[-6000:])
    log_fh.flush()
    entry = {"wall_s": round(time.time() - t0, 1), "rc": proc.returncode}
    dirs = sorted(glob.glob(os.path.join(
        WORKDIR, "logs", "*", "*", "realq", "renderonly_path_*")))
    if dirs:
        d = dirs[-1]
        vids = sorted(glob.glob(os.path.join(d, "*.mp4")))
        entry["dir"] = d
        entry["videos"] = [os.path.basename(v) for v in vids]
        entry["mp4_bytes"] = {os.path.basename(v): os.path.getsize(v)
                              for v in vids}
        entry["n_frames"] = len(glob.glob(os.path.join(d, "*.png")))
    if proc.returncode != 0:
        entry["error_tail"] = proc.stdout[-2000:]
    return entry


def main() -> None:
    state = {}
    if os.path.exists(OUT):
        state = json.load(open(OUT))
        print(f"resuming: {sorted(state)} present")
    with open(LOG, "a") as log_fh:
        if state.get("run", {}).get("rc") != 0 or "eval" not in state.get("run", {}):
            print(f"[{time.strftime('%H:%M:%S')}] training occ12_100k_cool "
                  "(100k iters, cooldown from 90k)", flush=True)
            state["run"] = run_training(log_fh)
            json.dump(state, open(OUT, "w"), indent=1)
            print(f"  -> {state['run'].get('eval', {}).get('psnr')}", flush=True)
        if state["run"].get("rc") == 0 and "spiral" not in state:
            print(f"[{time.strftime('%H:%M:%S')}] occ-served spiral render",
                  flush=True)
            state["spiral"] = run_spiral(state["run"]["eval"]["flags"], log_fh)
            json.dump(state, open(OUT, "w"), indent=1)

    e = state["run"].get("eval", {})
    if not e:
        raise SystemExit("training failed; artifact left as partial state")
    ours = {m: round(float(e[m]), 4) for m in METRICS}

    # PLY evidence: the held-out eval wrote per-view uncertainty clouds
    plys = glob.glob(os.path.join(
        WORKDIR, "logs", "*", "*", "realq", "eval_*", "*_uncertainty.ply"))
    state["pointclouds"] = {
        "n": len(plys),
        "bytes": {os.path.basename(p): os.path.getsize(p) for p in plys[:4]},
    }

    r10 = json.load(open(os.path.join(REPO, "EVAL_r10.json")))
    r16 = json.load(open(os.path.join(REPO, "EVAL_r16.json")))
    pair = {
        "r10_occ16_w512_100k": {m: round(float(r10["result"][m]), 4)
                                for m in METRICS},
        "r10_occ16_w512_100k_cooldown": {
            m: round(float(r10["cooldown_arm"]["result"][m]), 4)
            for m in METRICS},
        "r16_occ12_w384_100k_nocooldown": {
            m: r16["arms"]["occ12_100k"][m] for m in METRICS},
        "r16_occ12_w384_20k": {
            m: r16["arms"]["occ12_20k"][m] for m in METRICS},
    }

    d_nll_cool = round(ours["nll"] - pair["r16_occ12_w384_100k_nocooldown"]["nll"], 4)
    d_psnr_cool = round(ours["psnr"] - pair["r16_occ12_w384_100k_nocooldown"]["psnr"], 4)
    d_psnr_r10 = round(ours["psnr"] - pair["r10_occ16_w512_100k_cooldown"]["psnr"], 4)
    d_nll_r10 = round(ours["nll"] - pair["r10_occ16_w512_100k_cooldown"]["nll"], 4)
    recovers = d_nll_cool < -1.0 and d_psnr_cool > -0.5
    verdict = (
        f"Final frontier recipe (W384 occ12 cand128 + K-schedule + dense "
        f"cooldown 90k) at the reference's 100k schedule: "
        f"{'the cooldown RECOVERS the converged-schedule calibration' if recovers else 'the cooldown does NOT deliver the expected recovery'} "
        f"— held-out NLL {ours['nll']:+.2f} vs the no-cooldown ablation's "
        f"{pair['r16_occ12_w384_100k_nocooldown']['nll']:+.2f} nat "
        f"({d_nll_cool:+.2f}) at {d_psnr_cool:+.2f} dB PSNR.  Vs the round-3 "
        f"W512 occ16+cooldown headline run (EVAL_r10): {d_psnr_r10:+.2f} dB "
        f"PSNR, {d_nll_r10:+.2f} nat NLL at ~0.57x the per-point FLOPs.  "
        f"Full real-data deliverables attached: COLMAP-depth-supervised "
        f"training, held-out eval with {state['pointclouds']['n']} "
        f"uncertainty PLY cloud(s), occ-served spiral mp4 "
        f"({state.get('spiral', {}).get('videos')}).")

    out = {
        "experiment": (
            "Converged-schedule frontier run (EVAL_r21, VERDICT r04 task "
            "6): the settled recipe — W384, occ_train=12 from 6k, floor "
            "0.3, cand128, K-schedule 8:0,16:4000,32:8000, dense cooldown "
            "from 90k — for 100,000 iterations (the reference's headline "
            "schedule, run_nerf_uncertainty_NF.py:923) through the full "
            "real-data path on the minicapture LLFF+COLMAP fixture, with "
            "held-out eval, uncertainty PLY export, and an occ-served "
            "spiral mp4 (occ_eval 16, C=64 per EVAL_r17)."
        ),
        "hardware": "1x TPU v5e, fused render core",
        "recipe_evidence": "EVAL_r05 (W384) / EVAL_r09 (occ12) / EVAL_r03 "
                           "(K-schedule) / EVAL_r08+r10 (cooldown) / "
                           "EVAL_r16+r19 (off-scene transfer)",
        "run": state["run"],
        "spiral": state.get("spiral"),
        "pointclouds": state["pointclouds"],
        "ours": ours,
        "paired_against": pair,
        "verdict": verdict,
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print("wrote", OUT)
    print(verdict)


if __name__ == "__main__":
    main()
