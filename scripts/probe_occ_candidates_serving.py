"""Serving-side placement-CDF resolution A/B (r14 follow-on).

The r06 serving point (proposal-guided occupancy placement, --occ_eval 16,
1.373M rays/s) evaluates the proposal MLP on a C-point candidate grid per
ray and inverts the resulting CDF (ops/occupancy.py place_from_sigma);
C=128 was never swept on the serving side.  The train-side A/B (EVAL_r14)
measured +7.5% step rate at C=64 — the serving step is lighter per ray
(no grad, K-sample render dominates less at N16), so the placement share
is LARGER and the win should be too.

Same-process A/B through bench.bench_inference at the serving operating
point (32k rays, W384, occ_n=16, proposal impl):

    PYTHONPATH=/root/repo python scripts/probe_occ_candidates_serving.py

Prints one JSON line per candidate count; quality companion is the
cand-swept re-eval of a trained checkpoint via demo_synthetic
--skip_train --eval_occ 16 --eval_occ_candidates C (EVAL_r14 serving
section).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_inference  # noqa: E402


def main() -> None:
    out = {}
    # default sweep now extends below 64 (EVAL_r17 found quality flat down
    # to C=64 with speed monotonic in 1/C; EVAL_r23 asks whether 48/32
    # stay flat — 2-3x oversampling of the N=16 placed samples)
    cands = tuple(int(c) for c in os.environ.get(
        "PROBE_CANDS", "192,128,96,64,48,32").split(","))
    for c in cands:
        r = bench_inference(32768, occ_n=16, net_width=384, occ_candidates=c,
                            occ_impl="proposal")
        out[str(c)] = round(r, 1)
        print(json.dumps({"occ_candidates": c, "infer_rays_per_sec": out[str(c)],
                          "batch": 32768, "occ_n": 16, "net_width": 384}),
              flush=True)
    print("PROBE SUMMARY:", json.dumps(out))


if __name__ == "__main__":
    main()
