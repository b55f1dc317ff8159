"""Anchor-based dense detection head (SECOND / PointPillars-classic style).

Re-design of the reference's anchor stack:
- AnchorHeadSingle/Template (pcdet/models/dense_heads/anchor_head_single.py,
  anchor_head_template.py): 1x1 conv cls/box/dir branches over the dense BEV
  map, anchors of per-class fixed size at 2 rotations per cell;
- AxisAlignedTargetAssigner (target_assigner/axis_aligned_target_assigner.py):
  per-class pos/neg IoU thresholds against axis-aligned anchor boxes;
- ResidualCoder (pcdet/utils/box_coder_utils.py): offsets normalized by the
  anchor diagonal, log-ratio dims, sin/cos-free angle residual + direction
  classifier (limit_period binning);
- losses (loss_utils.py): sigmoid focal cls, smooth-L1 box with code
  weights, dir cross-entropy.

Everything fixed-shape: anchors are a compile-time constant [N_anchor, 7];
gts pad to MAX_GT with a mask.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config.schema import VoxelizeConfig, VoxelNeXtConfig
from ..ops.boxes import iou_aabb_bev, limit_period
from ..ops.nms import nms
from .voxelnext import Detections


class ResidualBoxCoder:
    """pcdet ResidualCoder (code_size 7): targets relative to anchors."""

    code_size = 7

    @staticmethod
    def encode(boxes: jax.Array, anchors: jax.Array) -> jax.Array:
        xa, ya, za = anchors[..., 0], anchors[..., 1], anchors[..., 2]
        dxa, dya, dza = anchors[..., 3], anchors[..., 4], anchors[..., 5]
        ra = anchors[..., 6]
        xg, yg, zg = boxes[..., 0], boxes[..., 1], boxes[..., 2]
        dxg, dyg, dzg = boxes[..., 3], boxes[..., 4], boxes[..., 5]
        rg = boxes[..., 6]
        diag = jnp.sqrt(dxa ** 2 + dya ** 2)
        return jnp.stack([
            (xg - xa) / diag, (yg - ya) / diag, (zg - za) / dza,
            jnp.log(jnp.clip(dxg / dxa, 1e-3)),
            jnp.log(jnp.clip(dyg / dya, 1e-3)),
            jnp.log(jnp.clip(dzg / dza, 1e-3)),
            rg - ra,
        ], axis=-1)

    @staticmethod
    def decode(deltas: jax.Array, anchors: jax.Array) -> jax.Array:
        xa, ya, za = anchors[..., 0], anchors[..., 1], anchors[..., 2]
        dxa, dya, dza = anchors[..., 3], anchors[..., 4], anchors[..., 5]
        ra = anchors[..., 6]
        diag = jnp.sqrt(dxa ** 2 + dya ** 2)
        return jnp.stack([
            deltas[..., 0] * diag + xa, deltas[..., 1] * diag + ya,
            deltas[..., 2] * dza + za,
            jnp.exp(jnp.clip(deltas[..., 3], -5, 5)) * dxa,
            jnp.exp(jnp.clip(deltas[..., 4], -5, 5)) * dya,
            jnp.exp(jnp.clip(deltas[..., 5], -5, 5)) * dza,
            deltas[..., 6] + ra,
        ], axis=-1)


def generate_anchors(grid_hw: Tuple[int, int], class_sizes: Sequence,
                     point_range, stride_m: Tuple[float, float],
                     rotations=(0.0, np.pi / 2),
                     z_centers: float = -1.0) -> np.ndarray:
    """-> [H*W*C*R, 7] compile-time anchor table (+ class id array).

    class_sizes: [(dx, dy, dz), ...] one per class (reference anchor config
    per class in the yaml zoo)."""
    h, w = grid_hw
    ys = point_range[1] + (np.arange(h) + 0.5) * stride_m[1]
    xs = point_range[0] + (np.arange(w) + 0.5) * stride_m[0]
    out, cls = [], []
    for yi in ys:
        for xi in xs:
            for ci, (dx, dy, dz) in enumerate(class_sizes):
                for r in rotations:
                    out.append([xi, yi, z_centers, dx, dy, dz, r])
                    cls.append(ci)
    return (np.asarray(out, np.float32), np.asarray(cls, np.int32))


class AnchorHead(nn.Module):
    """1x1-conv anchor head over a dense [C, H, W] BEV map."""
    num_classes: int
    anchors_per_cell: int     # C * R
    code_size: int = 7

    @nn.compact
    def __call__(self, bev_chw: jax.Array) -> Dict[str, jax.Array]:
        x = bev_chw[None].transpose(0, 2, 3, 1)
        a = self.anchors_per_cell

        def head(name, ch, bias=0.0):
            y = nn.Conv(ch, (1, 1), bias_init=nn.initializers.constant(bias),
                        name=name)(x)[0]
            return y  # [H, W, ch]

        cls = head("cls", a * self.num_classes, bias=-4.6)
        box = head("box", a * self.code_size)
        direction = head("dir", a * 2)
        h, w, _ = cls.shape
        return {
            "cls": cls.reshape(h * w * a, self.num_classes),
            "box": box.reshape(h * w * a, self.code_size),
            "dir": direction.reshape(h * w * a, 2),
        }


class AnchorHeadMulti(nn.Module):
    """Grouped multi-head anchor predictor (reference
    dense_heads/anchor_head_multi.py: each class group gets its own conv
    branch over the shared BEV map — SingleHead per group — and outputs
    concatenate in global class order).

    `class_groups`: tuple of per-group global class-id tuples, e.g.
    nuScenes rpn ((0, 1), (2, 3), ...). Build the matching anchor table
    with `multi_anchor_table`."""
    num_classes: int
    class_groups: Tuple[Tuple[int, ...], ...]
    rotations: int = 2
    code_size: int = 7

    @nn.compact
    def __call__(self, bev_chw: jax.Array) -> Dict[str, jax.Array]:
        outs = []
        for gi, group in enumerate(self.class_groups):
            head = AnchorHead(num_classes=len(group),
                              anchors_per_cell=len(group) * self.rotations,
                              code_size=self.code_size,
                              name=f"head_{gi}")
            preds = head(bev_chw)
            # lift group-local cls logits into the global class space so
            # the shared assign/decode path applies unchanged
            n = preds["cls"].shape[0]
            cls_full = jnp.full((n, self.num_classes), -1e9,
                                preds["cls"].dtype)
            cls_full = cls_full.at[:, jnp.asarray(group)].set(preds["cls"])
            outs.append({"cls": cls_full, "box": preds["box"],
                         "dir": preds["dir"]})
        return {k: jnp.concatenate([o[k] for o in outs]) for k in
                ("cls", "box", "dir")}


def multi_anchor_table(grid_hw, class_groups, class_sizes, point_range,
                       stride_m, rotations=(0.0, np.pi / 2)):
    """Anchor table matching AnchorHeadMulti's output concatenation: one
    generate_anchors block per group (global class ids preserved)."""
    anchors, cls = [], []
    for group in class_groups:
        a, c_local = generate_anchors(
            grid_hw, [class_sizes[g] for g in group], point_range,
            stride_m, rotations=rotations)
        anchors.append(a)
        cls.append(np.asarray([group[i] for i in c_local], np.int32))
    return np.concatenate(anchors), np.concatenate(cls)


def assign_anchor_targets(anchors: jax.Array, anchor_cls: jax.Array,
                          gt_boxes: jax.Array, gt_labels: jax.Array,
                          gt_mask: jax.Array, pos_thresh: float = 0.6,
                          neg_thresh: float = 0.45):
    """Axis-aligned IoU assignment (reference AxisAlignedTargetAssigner).

    Returns dict: cls_tgt [N] int32 (-1 ignore, 0 neg, 1..C pos class+1),
    box_tgt [N, 7], dir_tgt [N], matched gt index [N]."""
    n = anchors.shape[0]
    iou = iou_aabb_bev(anchors, gt_boxes[:, :7])       # [N, G]
    iou = jnp.where(gt_mask[None, :], iou, 0.0)
    # class-matched anchors only compete for a gt of their class
    same = anchor_cls[:, None] == gt_labels[None, :]
    iou = jnp.where(same, iou, 0.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    # force-match: each gt's best anchor is positive (reference behavior),
    # but only for gts that overlap SOMETHING — the reference sets
    # gt_to_anchor_max==0 rows to -1 before force-matching, so a gt with
    # zero IoU against every same-class anchor must not mark anchor 0.
    best_anchor = jnp.argmax(iou, axis=0)              # [G]
    gt_has_overlap = jnp.max(iou, axis=0) > 0          # [G]
    # scatter-MAX (boolean OR): padding/zero-overlap gts all argmax to
    # anchor 0 and a .set would let their False clobber a real gt's True
    forced = jnp.zeros((n,), bool).at[best_anchor].max(
        gt_mask & gt_has_overlap)
    pos = (best_iou >= pos_thresh) | forced
    neg = best_iou < neg_thresh

    cls_tgt = jnp.where(pos, gt_labels[best_gt] + 1,
                        jnp.where(neg, 0, -1)).astype(jnp.int32)
    box_tgt = ResidualBoxCoder.encode(gt_boxes[best_gt][:, :7], anchors)
    # direction bin from the ABSOLUTE gt heading (reference
    # get_direction_target uses rot_gt = reg_targets[...,6] + anchors[...,6]
    # = the gt angle itself, then floor(limit_period(rot_gt, 0, 2pi)/pi));
    # decode_anchor_preds pairs this with limit_period(angle, 0, pi) below.
    rot_gt = gt_boxes[best_gt][:, 6]
    dir_tgt = (limit_period(rot_gt, 0.0, 2 * np.pi) >= np.pi).astype(
        jnp.int32)
    return {"cls": cls_tgt, "box": box_tgt, "dir": dir_tgt,
            "matched_gt": best_gt}


def sigmoid_focal_loss(logits, targets_onehot, alpha=0.25, gamma=2.0):
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    ce = optax_sigmoid_ce(logits.astype(jnp.float32), targets_onehot)
    p_t = p * targets_onehot + (1 - p) * (1 - targets_onehot)
    a_t = alpha * targets_onehot + (1 - alpha) * (1 - targets_onehot)
    return a_t * ((1 - p_t) ** gamma) * ce


def optax_sigmoid_ce(logits, labels):
    return jnp.maximum(logits, 0) - logits * labels + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


def smooth_l1(x, beta: float = 1.0 / 9.0):
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def anchor_head_loss(preds: Dict, targets: Dict, num_classes: int,
                     box_weight: float = 2.0, dir_weight: float = 0.2):
    cls_tgt = targets["cls"]
    valid = cls_tgt >= 0
    pos = cls_tgt > 0
    onehot = jax.nn.one_hot(jnp.clip(cls_tgt - 1, 0, num_classes - 1),
                            num_classes) * pos[:, None]
    cls_loss = sigmoid_focal_loss(preds["cls"], onehot)
    n_pos = jnp.maximum(jnp.sum(pos), 1)
    cls_loss = jnp.sum(cls_loss * valid[:, None]) / n_pos

    # sin-difference trick on the angle channel (reference
    # add_sin_difference): sin(a-b) ~ residual for smooth-L1
    box_pred, box_tgt = preds["box"], targets["box"]
    ang = jnp.sin(box_pred[:, 6:7] - box_tgt[:, 6:7])
    diff = jnp.concatenate([box_pred[:, :6] - box_tgt[:, :6], ang], axis=1)
    box_loss = jnp.sum(smooth_l1(diff) * pos[:, None]) / n_pos

    dir_onehot = jax.nn.one_hot(targets["dir"], 2)
    dir_loss = jnp.sum(optax_sigmoid_ce(preds["dir"], dir_onehot)
                       * pos[:, None]) / n_pos
    total = cls_loss + box_weight * box_loss + dir_weight * dir_loss
    return total, {"cls_loss": cls_loss, "box_loss": box_loss,
                   "dir_loss": dir_loss}


def decode_anchor_preds(preds: Dict, anchors: jax.Array,
                        anchor_cls: jax.Array, det_cfg: VoxelNeXtConfig
                        ) -> Detections:
    scores_all = jax.nn.sigmoid(preds["cls"].astype(jnp.float32))
    score = jnp.max(scores_all, axis=1)
    label = jnp.argmax(scores_all, axis=1).astype(jnp.int32)
    boxes = ResidualBoxCoder.decode(preds["box"].astype(jnp.float32),
                                    anchors)
    # direction correction (reference anchor_head_template decode with
    # dir_limit_offset=0: rot in [0, pi) + pi * dir_bin — consistent with
    # the absolute-angle dir target in assign_anchor_targets)
    dir_cls = jnp.argmax(preds["dir"], axis=1)
    rot = limit_period(boxes[:, 6], 0.0, np.pi)
    boxes = boxes.at[:, 6].set(rot + np.pi * dir_cls)
    k = min(det_cfg.nms_pre_max, boxes.shape[0])
    top_scores, top_idx = jax.lax.top_k(score, k)
    valid = top_scores > det_cfg.score_thresh
    keep, count, kscores = nms(
        boxes[top_idx], top_scores, iou_thresh=det_cfg.nms_iou_thresh,
        pre_max=k, post_max=det_cfg.nms_post_max, valid=valid)
    safe = jnp.maximum(keep, 0)
    full = jnp.concatenate([boxes[top_idx][safe],
                            jnp.zeros((safe.shape[0], 2))], axis=1)
    return Detections(boxes=full,
                      scores=jnp.where(keep >= 0, kscores, 0.0),
                      labels=jnp.where(keep >= 0, label[top_idx][safe], -1),
                      count=count)
