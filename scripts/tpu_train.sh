#!/usr/bin/env bash
# Multi-host TPU-pod launcher for VQA training.
#
# TPU-native replacement for the reference's torchrun/launch scripts
# (src/lidar-encoder/tools/scripts/dist_train.sh, torch_train.sh): instead
# of spawning one process per GPU with torch.distributed.launch, a TPU pod
# runs ONE process per host VM; jax.distributed.initialize() discovers the
# pod topology from the TPU runtime (no rendezvous port scan needed — the
# reference's free-port loop at dist_train.sh:5-13 has no TPU equivalent).
#
# Single host (v5e-8 etc.):
#   scripts/tpu_train.sh --config configs/vqa_nuscenes_large.json
# Cloud TPU pod slice (run on every worker, e.g. via
# `gcloud compute tpus tpu-vm ssh $TPU --worker=all --command=...`):
#   LVV_MULTIHOST=1 scripts/tpu_train.sh --config ...
set -euo pipefail
cd "$(dirname "$0")/.."

export LVV_MULTIHOST=${LVV_MULTIHOST:-0}
# persistent compilation cache: pod restarts skip the multi-minute compile
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/lvv_jax_cache}

exec python tools/train_vqa.py "$@"
