#!/usr/bin/env bash
# Fetch the genuine CF-NeRF datasets (requires network; none exists in the
# build environment, so this is the documented recipe — VERDICT r01 task 3).
#
# Sources (from /root/reference/README.md:44):
#   LF (official):      https://drive.google.com/file/d/1gsjDjkbTh4GAR9fFqlIDZ__qR9NYTURQ/view
#   LF (paper variant): https://drive.google.com/drive/folders/1bmlNSFZ_eouQ-sQhw-o5B00WkadRiSpd
#   LLFF (fern/flower/...): https://drive.google.com/drive/folders/14boI-o5hGO9srnWaaogTU5_ji7wkX2S7
#   (nerf_llff_data is also mirrored as the standard NeRF tarball, Drive id
#    16VnMcF1KJYxN9QId6TClMsZRahHNMW5g, from the original NeRF release.)
#
# Usage:  bash scripts/fetch_datasets.sh [data_root]   # default ./data
set -euo pipefail
ROOT="${1:-./data}"
mkdir -p "$ROOT"

if ! command -v gdown >/dev/null 2>&1; then
  echo "gdown not found — install it (pip install gdown) or download the"
  echo "Drive folders above manually into:"
  echo "  $ROOT/lf_data/{africa,basket,statue,torch}"
  echo "  $ROOT/nerf_llff_data/{fern,flower,...}"
  exit 1
fi

echo "== LF dataset (official archive) =="
gdown 1gsjDjkbTh4GAR9fFqlIDZ__qR9NYTURQ -O "$ROOT/lf_data.zip"
unzip -qo "$ROOT/lf_data.zip" -d "$ROOT"

echo "== LLFF scenes (standard NeRF release tarball) =="
gdown 16VnMcF1KJYxN9QId6TClMsZRahHNMW5g -O "$ROOT/nerf_llff_data.zip"
unzip -qo "$ROOT/nerf_llff_data.zip" -d "$ROOT"

echo "Layout check:"
ls "$ROOT"
echo "Expected (reference README): data/nerf_llff_data/<scene>/{images,poses_bounds.npy,sparse/0}"
echo "Then:  python -m cfnerf_tpu.cli.train --config configs/africa_ds.txt --is_train"
