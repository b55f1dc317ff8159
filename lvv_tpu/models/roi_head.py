"""Two-stage RoI refinement head.

Re-design of the reference's RoI stack (pcdet/models/roi_heads/):
- proposal_target_layer (roi_heads/target_assigner/proposal_target_layer.py):
  IoU-match proposals to gts, sample a fixed fg/bg set, IoU-aware soft
  classification targets (quality regression), canonical-frame box targets;
- RoIAware pooling second stage (partA2_head.py / voxelrcnn_head.py shape):
  pool per-RoI point features on a G^3 lattice (ops.roiaware_pool3d),
  flatten, shared FCs, cls + reg branches;
- refinement decode via the ResidualBoxCoder in the RoI's canonical frame.

Fixed shapes: NUM_SAMPLED rois per scene; ragged gts masked.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.boxes import iou_aabb_bev
from ..ops.pool import roiaware_pool3d
from .anchor_head import ResidualBoxCoder, smooth_l1


def canonical_encode(gt: jax.Array, roi: jax.Array) -> jax.Array:
    """Encode gt relative to roi in the roi's yaw frame (reference
    canonical transformation in proposal-based heads)."""
    c, s = jnp.cos(-roi[..., 6]), jnp.sin(-roi[..., 6])
    dx = gt[..., 0] - roi[..., 0]
    dy = gt[..., 1] - roi[..., 1]
    local = jnp.stack([dx * c - dy * s, dx * s + dy * c], axis=-1)
    rot_roi = roi.at[..., 0:2].set(0.0).at[..., 6].set(0.0)
    gt_local = gt.at[..., 0:2].set(local).at[..., 6].add(-roi[..., 6])
    return ResidualBoxCoder.encode(gt_local, rot_roi)


def canonical_decode(deltas: jax.Array, roi: jax.Array) -> jax.Array:
    rot_roi = roi.at[..., 0:2].set(0.0).at[..., 6].set(0.0)
    local = ResidualBoxCoder.decode(deltas, rot_roi)
    c, s = jnp.cos(roi[..., 6]), jnp.sin(roi[..., 6])
    x = local[..., 0] * c - local[..., 1] * s + roi[..., 0]
    y = local[..., 0] * s + local[..., 1] * c + roi[..., 1]
    out = local.at[..., 0].set(x).at[..., 1].set(y)
    return out.at[..., 6].add(roi[..., 6])


class RoITargets(NamedTuple):
    rois: jax.Array        # [R, 7]
    cls_tgt: jax.Array     # [R] in [0,1] (IoU-aware soft labels)
    reg_tgt: jax.Array     # [R, 7]
    fg_mask: jax.Array     # [R]
    valid: jax.Array       # [R]


def proposal_targets(rois: jax.Array, gt_boxes: jax.Array,
                     gt_mask: jax.Array, *, fg_thresh: float = 0.55,
                     bg_thresh: float = 0.45) -> RoITargets:
    """Match each proposal to its best gt; soft cls target from IoU
    (reference: CLS_FG_THRESH/CLS_BG_THRESH interpolation)."""
    iou = iou_aabb_bev(rois[:, :7], gt_boxes[:, :7])
    iou = jnp.where(gt_mask[None, :], iou, 0.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    fg = best_iou >= fg_thresh
    soft = jnp.clip((best_iou - bg_thresh) / (fg_thresh - bg_thresh), 0, 1)
    reg_tgt = canonical_encode(gt_boxes[best_gt][:, :7], rois[:, :7])
    valid = jnp.any(gt_mask) & (jnp.sum(rois[:, 3:6], axis=1) > 0)
    return RoITargets(rois=rois, cls_tgt=soft, reg_tgt=reg_tgt,
                      fg_mask=fg & valid, valid=valid)


class RoIHead(nn.Module):
    """RoI-aware pooled refinement (reference partA2/voxelrcnn head shape)."""
    grid: int = 6
    fc_channels: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, points, point_feats, rois, valid_points=None):
        """points [N,3+], point_feats [N,C], rois [R,7] ->
        {cls [R], reg [R,7]}."""
        pooled = roiaware_pool3d(points[:, :3], point_feats, rois[:, :7],
                                 self.grid, mode="max",
                                 valid_points=valid_points)
        r = rois.shape[0]
        x = pooled.reshape(r, -1)
        for i, ch in enumerate(self.fc_channels):
            x = nn.Dense(ch, name=f"fc{i}")(x)
            x = nn.LayerNorm(name=f"ln{i}")(x)
            x = nn.relu(x)
        cls = nn.Dense(1, name="cls")(x)[:, 0]
        reg = nn.Dense(7, name="reg")(x)
        return {"cls": cls, "reg": reg}


def roi_head_loss(preds: Dict, targets: RoITargets,
                  reg_weight: float = 1.0):
    """BCE on IoU-soft labels + smooth-L1 on fg reg (reference
    partA2_head get_loss)."""
    logits = preds["cls"].astype(jnp.float32)
    # logaddexp(0, l) - l*t: same value as the max/abs formulation but
    # with grad sigmoid(l) - t EVERYWHERE — the max(l,0)+log1p(exp(-|l|))
    # form has exact-zero grad at l == 0 (sign(0) = 0 + max-tie), which is
    # precisely where a zero-init head starts
    bce = jnp.logaddexp(0.0, logits) - logits * targets.cls_tgt
    n_valid = jnp.maximum(jnp.sum(targets.valid), 1)
    cls_loss = jnp.sum(bce * targets.valid) / n_valid

    diff = preds["reg"].astype(jnp.float32) - targets.reg_tgt
    n_fg = jnp.maximum(jnp.sum(targets.fg_mask), 1)
    reg_loss = jnp.sum(jnp.sum(smooth_l1(diff), axis=1)
                       * targets.fg_mask) / n_fg
    total = cls_loss + reg_weight * reg_loss
    return total, {"roi_cls_loss": cls_loss, "roi_reg_loss": reg_loss}


def refine_boxes(preds: Dict, rois: jax.Array) -> jax.Array:
    """-> refined boxes [R, 7] + confidence [R]."""
    boxes = canonical_decode(preds["reg"].astype(jnp.float32), rois[:, :7])
    conf = jax.nn.sigmoid(preds["cls"].astype(jnp.float32))
    return boxes, conf
