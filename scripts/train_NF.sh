#!/usr/bin/env bash
# Training launch — workflow parity with the reference's train_NF.sh
# (flagship CF-NeRF configuration: D=8, W=512, N=128, K=32, 4 flows).
set -e
cd "$(dirname "$0")/.."

python -m cfnerf_tpu.cli.train \
    --config configs/africa_ds.txt \
    --expname 'africa' \
    --N_rand 512 \
    --N_samples 128 \
    --n_flows 4 \
    --h_alpha_size 64 \
    --h_rgb_size 64 \
    --K_samples 32 \
    --n_hidden 128 \
    --type_flows 'triangular' \
    --beta1 0.01 \
    --depth_lambda 0.01 \
    --netdepth 8 \
    --netwidth 512 \
    --model 'NeRF_Flows' \
    --index_step -1 \
    --is_train \
    "$@"
