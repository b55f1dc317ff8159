"""Segment/scatter ops — the XLA-native replacements for the reference's
scatter-style CUDA extensions.

- `ingroup_inds` replaces `ingroup_inds_cuda` (reference
  pcdet/ops/ingroup_inds/src/ingroup_inds_kernel.cu, used by DSVT window
  partitioning via model_utils/dsvt_utils.py:4-7): per-element running index
  within its group, for arbitrary (unsorted) group ids, without atomics —
  sort + run-rank + unsort, all fixed-shape.
- segment_{sum,mean,max} wrap `jax.ops.segment_*` with static segment counts
  (replaces scatter/index_add patterns e.g. the VoxelNeXt bev_out Z-collapse,
  spconv_backbone_voxelnext.py:149-164).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data, segment_ids, num_segments: int):
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_mean(data, segment_ids, num_segments: int, *, eps: float = 1e-12):
    total = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    ones = jnp.ones(data.shape[:1], dtype=jnp.float32)
    count = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)
    return total / jnp.maximum(count, eps)[(...,) + (None,) * (data.ndim - 1)]


def segment_max(data, segment_ids, num_segments: int):
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments)


def run_ranks_sorted(ids: jax.Array) -> jax.Array:
    """For a SORTED 1-D id array: index of each element within its run.

    [3,3,3,7,7,9] -> [0,1,2,0,1,0]
    """
    n = ids.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool), ids[1:] != ids[:-1]])
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, idx, 0))
    return idx - run_start


def ingroup_inds(group_ids: jax.Array,
                 valid: jax.Array | None = None) -> jax.Array:
    """Running index of each element within its group (unsorted ids).

    Invalid elements (valid==False) get index -1 and do not consume slots.
    Fixed-shape: sort by (invalid, id), rank runs, scatter back.
    """
    n = group_ids.shape[0]
    ids = group_ids.astype(jnp.int32)
    if valid is not None:
        big = jnp.iinfo(jnp.int32).max
        ids = jnp.where(valid, ids, big)
    order = jnp.argsort(ids, stable=True)
    ranks_sorted = run_ranks_sorted(ids[order])
    ranks = jnp.zeros((n,), jnp.int32).at[order].set(ranks_sorted)
    if valid is not None:
        ranks = jnp.where(valid, ranks, -1)
    return ranks


def unique_with_inverse(ids: jax.Array, fill_id, max_unique: int):
    """Fixed-capacity unique over a 1-D id array.

    Returns (unique_ids [max_unique], inverse [N], counts [max_unique],
    num_unique scalar). Ids equal to `fill_id` are treated as invalid; slots
    beyond num_unique are filled with `fill_id` / zero counts. The inverse of
    invalid elements points at `max_unique - 1`'s overflow slot only if the
    caller doesn't mask them — mask with `ids != fill_id`.
    """
    n = ids.shape[0]
    order = jnp.argsort(ids, stable=True)
    s = ids[order]
    is_start = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    is_start &= s != fill_id
    # rank of each run among valid runs
    run_rank = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    num_unique = jnp.maximum(run_rank[-1] + 1, 0)
    slot_sorted = jnp.where(s != fill_id, run_rank, max_unique - 1)
    slot_sorted = jnp.minimum(slot_sorted, max_unique - 1)
    # `order` is a permutation: un-permute with a gather through the inverse
    # permutation instead of a scatter (TPU scatters serialize on possible
    # collisions; a second argsort + gather is ~10x cheaper at 1.6M ids)
    inv_perm = jnp.argsort(order)
    inverse = slot_sorted.astype(jnp.int32)[inv_perm]
    # slot_sorted is sorted and every element of a run writes the same
    # value, so duplicate-index writes are benign
    unique_ids = jnp.full((max_unique,), fill_id, ids.dtype).at[
        slot_sorted].set(jnp.where(s != fill_id, s, fill_id),
                         indices_are_sorted=True)
    counts = jax.ops.segment_sum((s != fill_id).astype(jnp.int32),
                                 slot_sorted, num_segments=max_unique,
                                 indices_are_sorted=True)
    # overflow slot may mix invalids; zero it if it holds no real run
    has_run = jnp.any((slot_sorted == max_unique - 1) & (s != fill_id))
    counts = counts.at[max_unique - 1].set(
        jnp.where(has_run, counts[max_unique - 1], 0))
    return unique_ids, inverse, counts, num_unique
