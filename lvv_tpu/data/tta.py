"""Test-time augmentation: double-flip (reference
pcdet/datasets/processor/data_processor.py:117-131 + the detector-side
result averaging). Jit-able: produce the 4 flip variants of a point cloud,
run the detector on each, un-flip the boxes, and merge via NMS."""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..ops.nms import nms

FLIPS: Tuple[Tuple[bool, bool], ...] = (
    (False, False), (True, False), (False, True), (True, True))


def flip_points(points: jax.Array, flip_x: bool, flip_y: bool) -> jax.Array:
    p = points
    if flip_x:
        p = p.at[:, 1].multiply(-1.0)
    if flip_y:
        p = p.at[:, 0].multiply(-1.0)
    return p


def unflip_boxes(boxes: jax.Array, flip_x: bool, flip_y: bool) -> jax.Array:
    b = boxes
    if flip_x:
        b = b.at[:, 1].multiply(-1.0)
        b = b.at[:, 6].multiply(-1.0)
        if b.shape[1] >= 9:
            b = b.at[:, 8].multiply(-1.0)
    if flip_y:
        b = b.at[:, 0].multiply(-1.0)
        b = b.at[:, 6].set(jnp.pi - b[:, 6])
        if b.shape[1] >= 9:
            b = b.at[:, 7].multiply(-1.0)
    return b


def double_flip_detect(detect_fn: Callable, points: jax.Array,
                       num_points: jax.Array, *, iou_thresh: float = 0.2,
                       post_max: int = 83):
    """Run `detect_fn(points, num_points) -> Detections` on the 4 flip
    variants, map boxes back, merge with class-agnostic NMS."""
    all_boxes, all_scores, all_labels = [], [], []
    for fx, fy in FLIPS:
        d = detect_fn(flip_points(points, fx, fy), num_points)
        boxes = unflip_boxes(d.boxes, fx, fy)
        valid = jnp.arange(boxes.shape[0]) < d.count
        all_boxes.append(boxes)
        all_scores.append(jnp.where(valid, d.scores, -jnp.inf))
        all_labels.append(d.labels)
    boxes = jnp.concatenate(all_boxes)
    scores = jnp.concatenate(all_scores)
    labels = jnp.concatenate(all_labels)
    keep, count, kscores = nms(boxes, scores, iou_thresh=iou_thresh,
                               pre_max=boxes.shape[0], post_max=post_max)
    safe = jnp.maximum(keep, 0)
    from ..models.voxelnext import Detections
    return Detections(boxes=boxes[safe],
                      scores=jnp.where(keep >= 0, kscores, 0.0),
                      labels=jnp.where(keep >= 0, labels[safe], -1),
                      count=count)
