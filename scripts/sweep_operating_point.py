"""Quality-matched fast-operating-point sweep (VERDICT r01 task 1).

The honest route toward the 1M rays/s north-star is fewer FLOPs per ray at
MATCHED quality: the step is ~85% trunk encode, which scales linearly with
N_samples and is independent of K, so the levers are N_samples (vs the
reference's hardcoded 96+32 schedule, run_nerf_uncertainty_NF.py:510-516),
the K ramp (--k_schedule, quality-positive per EVAL_r03), a lower final K
(K is not a parameter axis — a K16-trained model evaluates at K32
unchanged), and hierarchical N_importance with a reduced coarse N.

Runs scripts/demo_synthetic.py per config on the SAME cached 128px
anti-aliased two-sphere dataset (the EVAL_r03 scene), collects the
paper-grade eval (PSNR/SSIM/NLL/AUSE through cfnerf_tpu.cli.eval), and
writes an incremental JSON.  Stage "screen" compares candidates at 6k
iters; stage "confirm" re-runs survivors at 20k iters against the EVAL_r03
flagship target (28.0 dB / SSIM 0.968 / AUSE 0.077).

    PYTHONPATH=/root/repo python scripts/sweep_operating_point.py \
        --stage screen --out /root/repo/EVAL_r04_sweep.json
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# iters -> k_schedule stage boundaries at 20% / 40% of the run (the
# EVAL_r03 20k recipe used 4000/8000)
def ksched(iters, ks=(8, 16, 32)):
    if len(ks) == 2:
        return f"{ks[0]}:0,{ks[1]}:{int(0.3 * iters)}"
    return f"{ks[0]}:0,{ks[1]}:{int(0.2 * iters)},{ks[2]}:{int(0.4 * iters)}"


def configs(stage, iters):
    base = dict(N_samples=128, K_samples=32, k_schedule=ksched(iters),
                N_importance=0, eval_K=0)
    if stage == "screen":
        return {
            "anchor_N128": dict(base),
            "N64": dict(base, N_samples=64),
            "N48": dict(base, N_samples=48),
            "N32": dict(base, N_samples=32),
            "N64_K16": dict(base, N_samples=64, K_samples=16,
                            k_schedule=ksched(iters, (8, 16)), eval_K=32),
            "hier_N32_imp32": dict(base, N_samples=32, N_importance=32),
        }
    raise SystemExit(f"unknown stage {stage}; use --configs for confirm runs")


def run_one(name, cfg, iters, outdir, log_fh):
    cmd = [
        sys.executable, os.path.join(REPO, "scripts", "demo_synthetic.py"),
        "--outdir", outdir, "--res", "128", "--n_train", "50", "--n_val", "4",
        "--supersample", "4",
        "--netwidth", str(cfg.get("netwidth", 512)),
        "--netdepth", str(cfg.get("netdepth", 8)),
        "--N_rand", "4096", "--iters", str(iters),
        "--expname", f"sweep_{name}_{iters}",
        "--N_samples", str(cfg["N_samples"]),
        "--K_samples", str(cfg["K_samples"]),
        "--N_importance", str(cfg["N_importance"]),
        "--eval_K", str(cfg["eval_K"]),
        "--seed", str(cfg.get("seed", 0)),
    ]
    if cfg.get("eval_N_samples"):
        cmd += ["--eval_N_samples", str(cfg["eval_N_samples"])]
    if cfg.get("eval_N_importance"):
        cmd += ["--eval_N_importance", str(cfg["eval_N_importance"])]
    # occ-training passthroughs (r08 annealing/cooldown studies); zero values
    # match the demo defaults so falsy keys can simply be omitted
    for k in ("occ_train", "occ_train_from", "occ_train_until",
              "occ_floor_anneal"):
        if cfg.get(k):
            cmd += [f"--{k}", str(cfg[k])]
    for k in ("occ_train_floor", "occ_floor_start"):
        if cfg.get(k) is not None:
            cmd += [f"--{k}", str(cfg[k])]
    if cfg["k_schedule"]:
        cmd += ["--k_schedule", cfg["k_schedule"]]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    t0 = time.time()
    proc = subprocess.run(cmd, env=env, stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT, text=True)
    log_fh.write(f"\n===== {name} (iters={iters}) rc={proc.returncode} =====\n")
    log_fh.write(proc.stdout[-8000:])
    log_fh.flush()
    m = re.search(r"DEMO SUMMARY: (\{.*\})", proc.stdout)
    entry = dict(cfg, iters=iters, wall_s=round(time.time() - t0, 1),
                 rc=proc.returncode)
    if m:
        entry["eval"] = json.loads(m.group(1))
    else:
        entry["error_tail"] = proc.stdout[-2000:]
    return entry


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="screen")
    ap.add_argument("--iters", type=int, default=6000)
    ap.add_argument("--configs", default="",
                    help="SEMICOLON-separated name=json entries for confirm "
                         'runs (json itself contains commas), e.g. '
                         '\'N64={"N_samples":64};N48={"N_samples":48}\'; '
                         "unset keys take the screen-stage defaults")
    ap.add_argument("--outdir", default="/tmp/cfnerf_sweep_r04")
    ap.add_argument("--out", default=os.path.join(REPO, "EVAL_r04_sweep.json"))
    ap.add_argument("--log", default="/tmp/sweep_r04_runs.log")
    args = ap.parse_args()

    if args.configs:
        base = dict(N_samples=128, K_samples=32, k_schedule=ksched(args.iters),
                    N_importance=0, eval_K=0)
        cfgs = {}
        for part in args.configs.split(";"):
            name, js = part.split("=", 1)
            cfgs[name] = dict(base, **json.loads(js))
    else:
        cfgs = configs(args.stage, args.iters)

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
    key = f"{args.stage}_{args.iters}"
    results.setdefault(key, {})
    with open(args.log, "a") as log_fh:
        for name, cfg in cfgs.items():
            if name in results[key] and "eval" in results[key][name]:
                print(f"skip {name} (already done)")
                continue
            print(f"running {name}: {cfg}", flush=True)
            entry = run_one(name, cfg, args.iters, args.outdir, log_fh)
            results[key][name] = entry
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)
            ev = entry.get("eval", {})
            print(f"  -> psnr={ev.get('psnr')} ssim={ev.get('ssim')} "
                  f"nll={ev.get('nll')} ause={ev.get('ause')} "
                  f"train_wall={ev.get('train_wall_s')}s", flush=True)


if __name__ == "__main__":
    main()
