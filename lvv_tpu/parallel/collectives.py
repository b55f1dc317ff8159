"""Cross-host result gathering.

Replaces the reference's pickle-files-on-shared-FS eval merge
(pcdet/utils/common_utils.py:229-250 merge_results_dist) and its NCCL
object collectives (commu_utils.py:50-182) with
`jax.experimental.multihost_utils` — results ride ICI/DCN as arrays, no
filesystem rendezvous.
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax
import numpy as np


def all_gather_arrays(tree: Any) -> Any:
    """Gather a pytree of per-host arrays; every host receives the
    concatenation along axis 0 (replaces merge_results_dist)."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(tree)


def broadcast_from_host0(tree: Any) -> Any:
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils
    return multihost_utils.broadcast_one_to_all(tree)


def reduce_mean_scalar(value: float) -> float:
    """Average a python scalar across hosts (replaces
    commu_utils.average_reduce_value)."""
    if jax.process_count() == 1:
        return float(value)
    gathered = all_gather_arrays(np.asarray([value], np.float64))
    return float(np.mean(gathered))


def gather_metric_dicts(metrics: Dict[str, float]) -> Dict[str, float]:
    """Mean-reduce a {name: scalar} dict across hosts (replaces
    commu_utils.reduce_dict)."""
    keys = sorted(metrics)
    vec = np.asarray([metrics[k] for k in keys], np.float64)
    if jax.process_count() > 1:
        vec = np.mean(all_gather_arrays(vec).reshape(
            jax.process_count(), -1), axis=0)
    return dict(zip(keys, vec.tolist()))
