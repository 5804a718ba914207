#!/bin/bash
# Round-5 resume queue (after the host reboot killed run_r05_queue.sh
# mid-r20 and wiped /tmp workdirs/checkpoints).  Remaining stages, strictly
# serial on the single chip:
#   bench_validate  — prove the compact final line parses on the real chip
#                     (VERDICT r04 task 2) before anything long
#   r20             — finish cand64_wall seeds 3/4 + occ12_20k seed 4,
#                     pool 5 seeds, write the committed verdict
#   r22             — valgate ensemble demo (full rerun; /tmp wiped)
#   r21             — converged 100k frontier run (full rerun; /tmp wiped)
#   r23             — serving candidates below C=64 (donor retrain forced:
#                     rc flipped to -15 in EVAL_r23.json since the ckpt died)
#
#   nohup bash scripts/run_r05b_queue.sh > /tmp/r05b_chain.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
echo $$ > /tmp/r05b_chain.pid

wait_tpu() {
    # block until a tiny TPU compile round-trips (tunnel alive); first
    # compile after a cold cache measured 135s, so the probe gets 300s
    while true; do
        if timeout 300 python -c "
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

stage bench_validate  timeout 1300 python bench.py
stage r20_cand64      python scripts/cand64_closure_experiment.py
stage r22_valgate     python scripts/valgate_ensemble_experiment.py
stage r21_converged   python scripts/converged_frontier_experiment.py
stage r23_servecands  env R17_OUT="$PWD/EVAL_r23.json" R17_CANDS=128,64,48,32 PROBE_CANDS=128,64,48,32 python scripts/serving_candidates_experiment.py
echo "===== [$(date +%H:%M:%S)] QUEUE COMPLETE ====="
