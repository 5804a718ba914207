"""EVAL_r22: the held-out val gate demonstrated at the ensemble frontier
(VERDICT r04 task 5).

EVAL_r18's autogate (train-PSNR, 2 dB) correctly kept all 3 members — but
member 2 was a held-out CALIBRATION outlier (eval NLL -4.34 vs -6.13/-6.16
nat) invisible to any train-side PSNR statistic.  Round 5 wired the
internal-val ray stream per member into train_ensemble_parallel
(val/psnr_mXX + val/nll_mXX at i_print cadence — the stream the reference
builds and never consumes, run_nerf_uncertainty_NF.py:877-885,:954-963)
and gave `--members auto` a --gate_metric switch.

This re-runs the exact EVAL_r13/r18 protocol (M=3 one-jit parallel
training at the occ12 frontier recipe, member seeds 1000/2000/3000, 20k
iters, 128px AA two-sphere scene) with the val stream on, then evals the
full mixture and the subset each gate picks:
  train_psnr (the r13/r18 default), val_psnr, val_nll.
Question: does the held-out NLL gate catch the calibration outlier the
train gate provably cannot see, and does its subset mixture win on NLL?

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/valgate_ensemble_experiment.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from demo_synthetic import make_dataset  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.environ.get("R22_OUT", os.path.join(REPO, "EVAL_r22.json"))
OUTDIR = os.environ.get("R22_OUTDIR", "/tmp/cfnerf_r22")
ITERS = int(os.environ.get("R22_ITERS", "20000"))
RES = int(os.environ.get("R22_RES", "128"))
N_TRAIN = int(os.environ.get("R22_NTRAIN", "50"))
SMOKE = os.environ.get("R22_SMOKE", "") == "1"
M = 3
KEYS = ("psnr", "ssim", "nll", "ause")
GATES = ("train_psnr", "val_psnr", "val_nll")


def _flags(datadir, basedir, iters):
    # the EVAL_r09/r13/r18 occ12 frontier recipe
    return [
        "--expname", "ens_valgate", "--dataname", "spheres",
        "--basedir", basedir,
        "--datadir", datadir, "--dataset_type", "blender", "--testskip", "1",
        "--N_rand", "4096" if not SMOKE else "256",
        "--N_samples", "48", "--K_samples", "32",
        "--n_flows", "4", "--h_alpha_size", "64", "--h_rgb_size", "64",
        "--netdepth", "8", "--netwidth", "384",
        "--type_flows", "triangular", "--beta1", "0.01",
        "--use_viewdirs", "--white_bkgd", "--no_ndc",
        "--lrate", "5e-4", "--n_inner", "10",
        "--n_iters", str(iters),
        "--i_print", "200" if not SMOKE else "10",
        "--i_weights", str(iters),
        "--i_img", "0", "--chunk", "4096",
        "--compute_dtype", "bfloat16",
        "--k_schedule", f"8:0,16:{int(0.2 * iters)},32:{int(0.4 * iters)}",
        "--occ_train", "12", "--occ_train_from", str(int(0.3 * iters)),
        "--occ_floor", "0.3",
        "--fused_render", "auto",
    ]


def main() -> None:
    if SMOKE:
        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
            " --xla_force_host_platform_device_count=8"
        import jax
        jax.config.update("jax_platforms", "cpu")

    from cfnerf_tpu.cli.ensemble import (
        auto_member_subset,
        eval_ensemble,
        member_metric_medians,
        train_ensemble_parallel,
    )
    from cfnerf_tpu.cli.eval import evaluate
    from cfnerf_tpu.utils.config import config_parser

    datadir = make_dataset(
        os.path.join(OUTDIR, f"scene_{RES}_{N_TRAIN}_4"), H=RES, W=RES,
        n_train=N_TRAIN, n_val=4, ss=4,
    )
    basedir = os.path.join(OUTDIR, "logs")
    flags = _flags(datadir, basedir, ITERS)

    parser = config_parser()
    parser.add_argument("--n_members", type=int, default=M)
    args = parser.parse_args(flags + ["--is_train"])

    t0 = time.time()
    train_ensemble_parallel(args, M)
    train_wall = time.time() - t0
    print(f"parallel ensemble train wall: {train_wall:.1f}s")

    members = {}
    for m in range(1, M + 1):
        margs = parser.parse_args(flags + ["--index_ensembles", str(m)])
        margs.seed = args.seed + 1000 * m
        s = evaluate(margs)
        members[f"m{m}_seed{1000 * m}"] = {
            k: round(float(s[k]), 4) for k in KEYS}
        print(f"member {m}: {members[f'm{m}_seed{1000 * m}']}")

    eargs = parser.parse_args(flags)
    full = eval_ensemble(eargs, M)
    full_m = {k: round(float(full[k]), 4) for k in KEYS}

    # per-member medians of every gate signal, straight from metrics.jsonl
    metrics_path = os.path.join(basedir, args.dataname, "summaries",
                                args.expname, "metrics.jsonl")
    signals = {
        "train_psnr": member_metric_medians(metrics_path, M, "train/psnr"),
        "val_psnr": member_metric_medians(metrics_path, M, "val/psnr"),
        "val_nll": member_metric_medians(metrics_path, M, "val/nll"),
    }

    gates, mixtures = {}, {"full_M3": full_m}
    for g in GATES:
        subset = auto_member_subset(eargs, M, gate_metric=g)
        gates[g] = subset
        tag = f"gate_{g}"
        if len(subset) < M:
            gm = eval_ensemble(eargs, M, members=subset)
            mixtures[tag] = {k: round(float(gm[k]), 4) for k in KEYS}
        else:
            mixtures[tag] = full_m

    # verdict from explicit criteria: the val_nll gate "demonstrates" if it
    # drops the member whose held-out eval NLL is worst by >1 nat AND its
    # subset mixture improves mixture NLL over full M3.
    member_list = list(members.values())
    eval_nlls = [v["nll"] for v in member_list]
    worst = int(max(range(M), key=lambda i: eval_nlls[i])) + 1
    spread = max(eval_nlls) - min(eval_nlls)
    nll_gate_drops_worst = (worst not in gates["val_nll"]
                            and len(gates["val_nll"]) == M - 1)
    gated_nll = mixtures["gate_val_nll"]["nll"]
    improves = gated_nll < full_m["nll"]
    if spread > 1.0 and nll_gate_drops_worst and improves:
        call = ("DEMONSTRATED — the held-out NLL gate drops the "
                "calibration outlier the train-PSNR gate cannot see and "
                "the gated mixture improves NLL")
    elif spread <= 1.0:
        call = (f"NOT TESTABLE this run — no calibration outlier emerged "
                f"(member eval-NLL spread {spread:.2f} nat <= 1.0); gate "
                f"behavior recorded for the no-outlier case")
    else:
        call = ("NOT DEMONSTRATED — an outlier exists but the gate/subset "
                "did not deliver (see numbers)")
    verdict = (
        f"{call}.  Member eval NLLs "
        f"{', '.join(f'{v:+.2f}' for v in eval_nlls)} nat; gate subsets "
        f"train_psnr={gates['train_psnr']}, val_psnr={gates['val_psnr']}, "
        f"val_nll={gates['val_nll']}; mixture NLL full {full_m['nll']:+.2f} "
        f"vs val_nll-gated {gated_nll:+.2f} nat.")

    out = {
        "experiment": (
            "Held-out val-gate demonstration (EVAL_r22, VERDICT r04 task "
            "5): the EVAL_r13/r18 protocol (M=3 one-jit parallel occ12 "
            "frontier training, seeds 1000/2000/3000, 20k iters, 128px AA "
            "two-sphere scene) with the per-member internal-val stream on "
            "(val/psnr_mXX + val/nll_mXX), then --members auto under each "
            "gate_metric, mixture eval of every distinct subset."
        ),
        "hardware": "1x TPU v5e, fused render core + vmapped member axis",
        "iters": ITERS,
        "train_wall_s_total": round(train_wall, 1),
        "members": members,
        "gate_signal_medians": {g: {f"m{m}": round(v, 4)
                                    for m, v in s.items()}
                                for g, s in signals.items()},
        "gate_subsets": gates,
        "mixtures": mixtures,
        "verdict": verdict,
    }
    path = (os.path.join(OUTDIR, "EVAL_r22_smoke.json") if SMOKE else OUT)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print("wrote", path)
    print(verdict)


if __name__ == "__main__":
    main()
