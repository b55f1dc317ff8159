#!/usr/bin/env bash
# SLURM launcher (reference: src/lidar-encoder/tools/scripts/slurm_train.sh).
#
# The reference srun's one task per GPU and hand-builds a NCCL rendezvous
# (common_utils.py:162-186 init_dist_slurm). The JAX idiom: one task per
# host; jax.distributed.initialize() auto-detects SLURM (coordinator =
# first node of SLURM_NODELIST) — lvv_tpu.parallel.init_distributed() calls
# it whenever SLURM_JOB_ID is set.
#
#   sbatch -N 4 --ntasks-per-node=1 scripts/slurm_train.sh \
#       --config configs/vqa_nuscenes_large.json
set -euo pipefail
cd "$(dirname "$0")/.."
export LVV_MULTIHOST=1
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/lvv_jax_cache}
srun --kill-on-bad-exit=1 python tools/train_vqa.py "$@"
