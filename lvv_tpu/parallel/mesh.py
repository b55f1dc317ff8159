"""Device mesh construction and batch/parameter placement.

Replaces the reference's process-group plumbing (NCCL init at
src/encoder-decoder/training/utils/distributed.py:7-27 and
pcdet/utils/common_utils.py:162-204) with the JAX idiom: one
`jax.sharding.Mesh` with named axes and NamedSharding placements; XLA emits
the collectives over ICI/DCN (SURVEY.md §2.6 "TPU-native equivalents").

Axes:
- "data": data parallelism (the only parallelism the reference has);
- "model": tensor sharding for the LLM (the natural TPU extension; unused
  by reference parity but first-class here).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config.schema import MeshConfig


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = cfg.model if cfg else 1
    if n % model != 0:
        raise ValueError(f"{n} devices not divisible by model={model}")
    data = (cfg.data if cfg and cfg.data > 0 else n // model)
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def init_distributed() -> None:
    """Multi-host init (replaces torch.distributed env-var init — reference
    init_dist_pytorch/init_dist_slurm, common_utils.py:162-204). No-op on a
    single host; call before device queries on multi-host TPU pods.

    Triggers on any of: explicit COORDINATOR_ADDRESS, a SLURM allocation
    (jax auto-detects the coordinator from SLURM_NODELIST — the TPU
    equivalent of the reference's hand-built SLURM rendezvous), or
    LVV_MULTIHOST=1 (Cloud TPU pod slices, where the TPU runtime carries
    the topology; see scripts/tpu_train.sh)."""
    import os
    if ("COORDINATOR_ADDRESS" in os.environ
            or os.environ.get("LVV_MULTIHOST") == "1"
            or (os.environ.get("SLURM_JOB_ID")
                and int(os.environ.get("SLURM_NTASKS", "1")) > 1)):
        jax.distributed.initialize()


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data-parallel sharding for array batches."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place every array in a batch pytree with its leading axis split over
    the data axis (DistributedSampler equivalent placement — the sampler
    already hands each host its shard; this distributes across local chips).
    """
    sh = batch_sharding(mesh)

    def put(x):
        return jax.device_put(x, sh) if hasattr(x, "shape") and x.ndim else x

    return jax.tree_util.tree_map(put, batch)
