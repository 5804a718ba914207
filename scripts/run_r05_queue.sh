#!/bin/bash
# Round-5 TPU experiment queue — one chip, strictly serial, VERDICT-r04
# priority order.  Waits for the round-4 queue (if still running) before
# touching the chip.  Each stage is resumable (drivers skip completed
# rc==0 arms), so re-running this script continues where it left off.
#
#   nohup bash scripts/run_r05_queue.sh > /tmp/r05_chain.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

# serialize on the r04 queue: the chip is single-tenant
if [ -f /tmp/r04_chain.pid ]; then
    prev=$(cat /tmp/r04_chain.pid)
    while kill -0 "$prev" 2>/dev/null; do
        echo "[$(date +%H:%M:%S)] waiting for r04 queue (pid $prev) ..."
        sleep 60
    done
fi

stage() {
    local name="$1"; shift
    echo "===== [$(date +%H:%M:%S)] stage $name: $* ====="
    "$@"
    echo "===== [$(date +%H:%M:%S)] stage $name done rc=$? ====="
    return 0  # keep the chain going; drivers record their own failures
}

# r19 aggregation with the round-5 verdict field (all runs cached in
# EVAL_r19.json -> the driver skips training and re-aggregates)
stage r19_aggregate   python scripts/clutter_frontier_experiment.py
# prove the compact-final-line bench parses (VERDICT r04 task 2) FIRST,
# not in the round's final hours
stage bench_validate  timeout 1300 python bench.py
stage r20_cand64      python scripts/cand64_closure_experiment.py
stage r22_valgate     python scripts/valgate_ensemble_experiment.py
stage r21_converged   python scripts/converged_frontier_experiment.py
echo "===== [$(date +%H:%M:%S)] QUEUE COMPLETE ====="
