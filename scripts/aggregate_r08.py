"""Aggregate the r08 cooldown evidence into EVAL_r08.json.

Pairs the 3-seed occ+cooldown runs (EVAL_r08_sweep.json: seed 0 from the
screen stage, seeds 1-2 from the confirm stage) against the EVAL_r07
dense and occ(no-cooldown) arms (identical config/seeds/scene), so the
artifact answers one question: does the dense calibration cooldown
(--occ_train_until) close the occ-stage KDE-NLL gap at no quality cost?

    PYTHONPATH=/root/repo python scripts/aggregate_r08.py
"""
from __future__ import annotations

import json
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    sweep = json.load(open(os.path.join(REPO, "EVAL_r08_sweep.json")))
    r07 = json.load(open(os.path.join(REPO, "EVAL_r07.json")))

    cool = {
        "0": sweep["occ_screen_20000"]["occ_cooldown"]["eval"],
        "1": sweep["occ_cooldown_seeds_20000"]["cooldown_s1"]["eval"],
        "2": sweep["occ_cooldown_seeds_20000"]["cooldown_s2"]["eval"],
    }

    paired = {}
    for s in ("0", "1", "2"):
        d = r07["paired_by_seed"][s]["dense"]
        o = r07["paired_by_seed"][s]["occ"]
        c = cool[s]
        paired[s] = {
            "dense": d,
            "occ": {k: o[k] for k in ("psnr", "ssim", "nll", "ause")},
            "occ_cooldown": {k: round(float(c[k]), 4)
                             for k in ("psnr", "ssim", "nll", "ause")},
            "cooldown_delta_psnr_vs_dense": round(c["psnr"] - d["psnr"], 4),
            "cooldown_delta_nll_vs_dense": round(c["nll"] - d["nll"], 4),
        }

    def pool(vals):
        a = np.asarray(vals, dtype=np.float64)
        return {"mean": round(float(a.mean()), 4),
                "std": round(float(a.std(ddof=1)), 4)}

    pools = {}
    for arm, get in (
        ("dense", lambda s: r07["paired_by_seed"][s]["dense"]),
        ("occ", lambda s: r07["paired_by_seed"][s]["occ"]),
        ("occ_cooldown", lambda s: cool[s]),
    ):
        pools[arm] = {m: pool([get(s)[m] for s in ("0", "1", "2")])
                      for m in ("psnr", "ssim", "nll", "ause")}

    out = {
        "experiment": (
            "Dense calibration cooldown for proposal-placed training "
            "(EVAL_r08): the EVAL_r07 occ recipe (6k dense warmup at N48, "
            "then N=16 proposal-placed steps, floor 0.3) plus "
            "--occ_train_until 18000 — the last 2000 steps return to dense "
            "N48 sampling inside the same run (opt-state unwrap at the "
            "boundary, same jit machinery).  PAIRED 3 seeds against the "
            "EVAL_r07 dense and occ arms (identical W384 D8 N48 K32 "
            "config, 8->16->32 K-schedule, 20k iters, 128px anti-aliased "
            "scene, 4096 rays/step, one v5e chip); all evals dense N48 "
            "through cli.eval.  Sibling screens (EVAL_r08_sweep.json): "
            "floor annealing alone helps less, annealing+cooldown adds "
            "nothing over cooldown, occ-from-step-0 loses 4.7 dB — the "
            "dense warmup is load-bearing.  Cooldown runs use the default "
            "--occ_candidates 128 (r07 occ seeds 0/1 used 192; measured "
            "no effect, EVAL_r07 ablations)."
        ),
        "paired_by_seed": paired,
        "pools_n3": pools,
        "throughput_v5e": {
            "occ_step_rays_per_sec": r07["throughput_v5e"]["occ_step_rays_per_sec"],
            "dense_step_rays_per_sec": r07["throughput_v5e"]["dense_step_rays_per_sec"],
            "note": (
                "The cooldown does not change step throughput — it moves "
                "2000 of 20000 steps (10%) from the occ rate back to the "
                "dense rate.  Schedule-average step cost at this recipe: "
                "6k dense warmup + 12k occ + 2k dense cooldown."
            ),
        },
    }

    # effective whole-schedule throughput from the measured per-arm step rates
    occ_r = r07["throughput_v5e"]["occ_step_rays_per_sec"]
    den_r = r07["throughput_v5e"]["dense_step_rays_per_sec"]
    steps_dense, steps_occ = 6000 + 2000, 12000
    t = steps_dense / den_r + steps_occ / occ_r   # step-seconds per ray/step unit
    eff = (steps_dense + steps_occ) / t
    out["throughput_v5e"]["schedule_avg_rays_per_sec"] = round(eff)
    out["throughput_v5e"]["schedule_speedup_vs_dense"] = round(eff / den_r, 2)

    out["read"] = "FILLED_AFTER_RESULTS"
    with open(os.path.join(REPO, "EVAL_r08.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["pools_n3"], indent=1))
    print("schedule_avg", out["throughput_v5e"]["schedule_avg_rays_per_sec"])


if __name__ == "__main__":
    main()
