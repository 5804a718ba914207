#!/bin/bash
# Round-4 TPU experiment queue — one chip, strictly serial, VERDICT-priority
# order.  Each stage is resumable (the drivers skip completed rc==0 arms),
# so re-running this script after an interruption continues where it left
# off.  Stage 0 proves the restructured bench.py (emit-early + 1100s
# budget) actually terminates inside the driver window — BENCH_r03's
# rc=124 was round 3's one regression.
#
#   nohup bash scripts/run_r04_queue.sh > /tmp/r04_chain.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

stage() {
    local name="$1"; shift
    echo "===== [$(date +%H:%M:%S)] stage $name: $* ====="
    "$@"
    echo "===== [$(date +%H:%M:%S)] stage $name done rc=$? ====="
    return 0  # keep the chain going; drivers record their own failures
}

stage bench_validate  timeout 1300 python bench.py
stage r15_wallmatched python scripts/wallmatched_experiment.py
stage r15_aggregate   python scripts/aggregate_r15.py
stage r16_offscene    python scripts/offscene_frontier_experiment.py
stage r17_serving     python scripts/serving_candidates_experiment.py
stage r18_autogate    python scripts/ensemble_autogate_experiment.py
stage r19_clutter     python scripts/clutter_frontier_experiment.py
echo "===== [$(date +%H:%M:%S)] QUEUE COMPLETE ====="
