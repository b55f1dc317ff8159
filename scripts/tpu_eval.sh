#!/usr/bin/env bash
# Detector eval launcher (reference: tools/scripts/dist_test.sh /
# slurm_test_mgpu.sh). Same one-process-per-host model as tpu_train.sh;
# eval results merge across hosts via process_allgather
# (lvv_tpu/parallel/__init__.py) instead of the reference's pickle-file
# merge_results_dist (common_utils.py:229-250).
#
#   scripts/tpu_eval.sh --config configs/kitti_second.json --ckpt runs/...
set -euo pipefail
cd "$(dirname "$0")/.."
export LVV_MULTIHOST=${LVV_MULTIHOST:-0}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/lvv_jax_cache}
exec python tools/eval_detector.py "$@"
