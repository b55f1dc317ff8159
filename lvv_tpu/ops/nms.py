"""Rotated NMS as masked iterative suppression over a fixed top-K.

Replaces the reference's sequential-bitmask CUDA NMS
(pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu `nms_gpu`, wrapped by
iou3d_nms_utils.py and model_utils/model_nms_utils.py). Sequential
suppression is hostile to TPUs, but the detector only ever NMS-es the top-K
pre-NMS candidates (K<=1000, cbgs_voxel0075_voxelnext.yaml:124-128), so the
O(K^2) IoU matrix is tiny: compute it once on the MXU-friendly vectorized
path, then run the greedy suppression as a lax.fori_loop over rows of the
precomputed boolean matrix (K steps of O(K) vector work).
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .boxes import iou_aabb_bev, iou_bev


def _greedy_suppress(iou: jax.Array, order_valid: jax.Array,
                     iou_thresh: float) -> jax.Array:
    """Boxes sorted by score desc; iou [K,K]; returns keep mask [K]."""
    k = iou.shape[0]
    over = (iou > iou_thresh)
    over = over & ~jnp.eye(k, dtype=bool)

    def body(i, alive):
        # if box i is still alive, kill everything it overlaps after it
        kill = over[i] & (jnp.arange(k) > i) & alive[i]
        return alive & ~kill

    alive = jax.lax.fori_loop(0, k, body, order_valid)
    return alive


@functools.partial(jax.jit, static_argnames=("iou_thresh", "pre_max",
                                             "post_max", "iou_fn"))
def nms(boxes: jax.Array, scores: jax.Array, *, iou_thresh: float,
        pre_max: int, post_max: int,
        iou_fn: Callable = iou_bev,
        valid: Optional[jax.Array] = None):
    """Class-agnostic rotated NMS (reference
    model_nms_utils.class_agnostic_nms semantics).

    boxes [N, 7+], scores [N]; invalid rows masked via `valid` or score=-inf.
    Returns (keep_idx [post_max] int32, keep_count, keep_scores [post_max]);
    unused slots have idx -1 / score -inf.
    """
    n = boxes.shape[0]
    scores = jnp.where(valid, scores, -jnp.inf) if valid is not None else scores
    k = min(pre_max, n)
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_boxes = boxes[top_idx]
    order_valid = jnp.isfinite(top_scores)

    iou = iou_fn(top_boxes[:, :7], top_boxes[:, :7])
    alive = _greedy_suppress(iou, order_valid, iou_thresh)

    # compact alive (already score-ordered) to post_max slots
    alive_scores = jnp.where(alive, top_scores, -jnp.inf)
    kept_scores, kept_pos = jax.lax.top_k(alive_scores, min(post_max, k))
    kept_idx = jnp.where(jnp.isfinite(kept_scores), top_idx[kept_pos], -1)
    count = jnp.sum(jnp.isfinite(kept_scores).astype(jnp.int32))
    if post_max > k:
        pad = post_max - k
        kept_idx = jnp.concatenate([kept_idx, jnp.full((pad,), -1, jnp.int32)])
        kept_scores = jnp.concatenate(
            [kept_scores, jnp.full((pad,), -jnp.inf, kept_scores.dtype)])
    return kept_idx, count, kept_scores


def nms_axis_aligned(boxes, scores, **kw):
    """NMS with axis-aligned BEV IoU (cheaper; reference `nms_normal_gpu`
    uses unrotated overlap)."""
    return nms(boxes, scores, iou_fn=iou_aabb_bev, **kw)


def multi_class_nms(boxes, scores, labels, num_classes: int, *,
                    iou_thresh: float, pre_max: int, post_max: int):
    """Per-class NMS (reference model_nms_utils.multi_classes_nms): offset
    each class's boxes to disjoint regions so one class-agnostic pass
    suppresses only within-class pairs."""
    span = (jnp.max(jnp.abs(boxes[:, :2])) + jnp.max(boxes[:, 3:5]) + 1.0) * 2
    shifted = boxes.at[:, 0].add(labels.astype(boxes.dtype) * span)
    return nms(shifted, scores, iou_thresh=iou_thresh, pre_max=pre_max,
               post_max=post_max)
