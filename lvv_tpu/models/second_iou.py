"""SECONDNetIoU — SECOND RPN + BEV-grid IoU refinement head.

Re-design of the reference SECONDNetIoU (pcdet detectors/second_net_iou.py
+ roi_heads/second_head.py): the anchor RPN proposes boxes, a rotated
RoI-grid pool over the dense BEV map (affine_grid + grid_sample in the
reference; rotated-lattice bilinear sampling here) feeds FC layers that
predict each proposal's IoU with its ground truth, and detection scores
blend classification and IoU confidence by the number of lidar points in
the box (cal_scores_by_npoints, second_net_iou.py:37-55).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config.schema import VoxelizeConfig, VoxelNeXtConfig
from ..ops.boxes import iou_3d
from ..ops.pool import points_in_rotated_boxes
from .layers import Dense
from .pv_rcnn import bev_bilinear
from .second import SECONDDetector
from .voxelnext import Detections


def roi_grid_points(rois: jax.Array, grid: int) -> jax.Array:
    """[M, 7] rois -> [M, grid*grid, 2] metric BEV sample points on a
    rotated lattice covering each box footprint (reference
    second_head.get_dense_grid_points + affine_grid semantics)."""
    gs = (jnp.arange(grid, dtype=jnp.float32) + 0.5) / grid - 0.5  # [-.5,.5)
    gu, gv = jnp.meshgrid(gs, gs, indexing="ij")
    local = jnp.stack([gu.reshape(-1), gv.reshape(-1)], axis=1)  # [G2, 2]
    lx = local[None, :, 0] * rois[:, None, 3]
    ly = local[None, :, 1] * rois[:, None, 4]
    c = jnp.cos(rois[:, 6])[:, None]
    s = jnp.sin(rois[:, 6])[:, None]
    x = lx * c - ly * s + rois[:, None, 0]
    y = lx * s + ly * c + rois[:, None, 1]
    return jnp.stack([x, y], axis=-1)


class SECONDIoUHead(nn.Module):
    """BEV-grid pooled FC head predicting per-RoI IoU."""
    grid: int = 7
    hidden: Tuple[int, ...] = (256, 256)

    @nn.compact
    def __call__(self, bev_chw: jax.Array, rois: jax.Array, point_range,
                 stride_m) -> jax.Array:
        m = rois.shape[0]
        pts = roi_grid_points(rois, self.grid).reshape(-1, 2)
        feats = bev_bilinear(bev_chw, pts, point_range, stride_m)
        h = feats.reshape(m, -1)
        for i, ch in enumerate(self.hidden):
            h = nn.relu(Dense(ch, name=f"fc{i}")(h))
        return Dense(1, name="iou")(h)[:, 0]        # logits


def cal_scores_by_npoints(cls_scores, iou_scores, npoints,
                          cls_thresh: float = 10.0,
                          iou_thresh: float = 100.0):
    """Blend cls/IoU confidences by point count (reference
    second_net_iou.py:37-55): boxes with few points trust the classifier,
    dense boxes trust the IoU head, linear ramp between."""
    alpha = jnp.clip((npoints - cls_thresh) / (iou_thresh - cls_thresh),
                     0.0, 1.0)
    return (1 - alpha) * cls_scores + alpha * iou_scores


class SECONDNetIoUDetector(nn.Module):
    det_cfg: VoxelNeXtConfig
    vox_cfg: VoxelizeConfig
    roi_grid: int = 7

    @nn.compact
    def __call__(self, points: jax.Array, num_points: jax.Array):
        base = SECONDDetector(det_cfg=self.det_cfg, vox_cfg=self.vox_cfg,
                              name="second")
        out = base(points, num_points)
        from .anchor_head import decode_anchor_preds
        proposals = decode_anchor_preds(out["preds"], out["anchors"],
                                        out["anchor_cls"], self.det_cfg)
        grid = base.voxel_grid()
        stride = self.det_cfg.spatial_stride
        stride_m = (grid.voxel_size[0] * stride, grid.voxel_size[1] * stride)
        iou_logits = SECONDIoUHead(grid=self.roi_grid, name="iou_head")(
            out["bev_dense"], proposals.boxes[:, :7],
            self.vox_cfg.point_range, stride_m)

        # per-proposal point counts for the score blend
        valid_pts = jnp.arange(points.shape[0]) < num_points
        inside = points_in_rotated_boxes(points, proposals.boxes[:, :7]) \
            & valid_pts[:, None]
        npoints = jnp.sum(inside.astype(jnp.int32), axis=0)
        return {**out, "proposals": proposals, "iou_logits": iou_logits,
                "npoints": npoints}

    def detect(self, points, num_points) -> Detections:
        out = self(points, num_points)
        p = out["proposals"]
        iou_conf = jax.nn.sigmoid(out["iou_logits"].astype(jnp.float32))
        fused = cal_scores_by_npoints(p.scores, iou_conf,
                                      out["npoints"].astype(jnp.float32))
        fused = jnp.where(p.labels >= 0, fused, 0.0)
        return Detections(boxes=p.boxes, scores=fused, labels=p.labels,
                          count=p.count)

    def loss(self, out, gt_boxes, gt_labels, gt_mask):
        from .anchor_head import anchor_head_loss, assign_anchor_targets
        rpn_loss, stats = anchor_head_loss(
            out["preds"],
            assign_anchor_targets(out["anchors"], out["anchor_cls"],
                                  gt_boxes, gt_labels, gt_mask),
            self.det_cfg.num_classes)
        # IoU-head target: actual 3D IoU of each proposal vs best gt
        rois = out["proposals"].boxes[:, :7]
        iou = iou_3d(rois, gt_boxes[:, :7])
        iou = jnp.where(gt_mask[None, :], iou, 0.0)
        best = jnp.max(iou, axis=1)
        logit = out["iou_logits"].astype(jnp.float32)
        bce = jnp.maximum(logit, 0) - logit * best + \
            jnp.log1p(jnp.exp(-jnp.abs(logit)))
        # supervise every decoded proposal (the reference supervises its
        # SAMPLED roi set independently of score thresholds)
        iou_loss = jnp.mean(bce)
        return rpn_loss + iou_loss, {**stats, "iou_loss": iou_loss}
