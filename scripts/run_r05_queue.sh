#!/bin/bash
# Round-5 TPU experiment queue — one chip, strictly serial, VERDICT-r04
# priority order.  Waits for the round-4 queue (if still running) before
# touching the chip.  Each stage is resumable (drivers skip completed
# rc==0 arms), so re-running this script continues where it left off.
#
# Hardening added mid-round-5 after a ~1h tunnel outage (remote-compile
# relay stopped answering ~11:05; a 21k-iter arm hung at first compile
# with 11s of CPU over 40min):
#   * stage() captures rc BEFORE the closing echo ($(date) inside the
#     echo was resetting $?, so failures printed as rc=0)
#   * wait_tpu probes the chip with a tiny timed compile between stages
#     and blocks until the tunnel answers, so a wedged relay costs wait
#     time instead of leaving a stage hung forever
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

wait_tpu() {
    # block until a tiny TPU compile round-trips (tunnel alive)
    while true; do
        if timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128)); print(float((x @ x).sum()))" >/dev/null 2>&1; then
            return 0
        fi
        echo "[$(date +%H:%M:%S)] TPU tunnel not answering; retry in 120s"
        sleep 120
    done
}

stage() {
    local name="$1"; shift
    echo "===== [$(date +%H:%M:%S)] stage $name: $* ====="
    wait_tpu
    "$@"
    local rc=$?
    echo "===== [$(date +%H:%M:%S)] stage $name done rc=$rc ====="
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
stage r23_servecands  env R17_OUT="$PWD/EVAL_r23.json" R17_CANDS=128,64,48,32 PROBE_CANDS=128,64,48,32 python scripts/serving_candidates_experiment.py
echo "===== [$(date +%H:%M:%S)] QUEUE COMPLETE ====="
