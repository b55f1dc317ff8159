"""PointRCNN — point-based proposals + RoI refinement.

Re-design of the reference PointRCNN (pcdet detectors/point_rcnn.py:
PointNet2MSG backbone -> PointHeadBox per-point proposals -> RoIPoint
pooling second stage): per-point foreground scores gate proposal boxes
decoded from the point head's regression; top-scoring proposals NMS down
to a fixed RoI set; the RoI head refines over pooled point features.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config.schema import VoxelizeConfig, VoxelNeXtConfig
from ..ops.nms import nms
from .point_head import PointHead
from .pointnet2 import PointNet2Backbone
from .roi_head import RoIHead, refine_boxes
from .voxelnext import Detections


def decode_point_proposals(points: jax.Array, preds: Dict) -> jax.Array:
    """Per-point box decode: offsets from the point + log dims + sin/cos
    (inverse of point_head.point_targets encoding) -> [N, 7]."""
    b = preds["box"].astype(jnp.float32)
    center = points[:, :3] + b[:, :3]
    dims = jnp.exp(jnp.clip(b[:, 3:6], -4, 4))
    heading = jnp.arctan2(b[:, 6], b[:, 7])
    return jnp.concatenate([center, dims, heading[:, None]], axis=1)


class PointRCNNDetector(nn.Module):
    det_cfg: VoxelNeXtConfig
    vox_cfg: VoxelizeConfig
    num_rois: int = 64

    @nn.compact
    def __call__(self, points: jax.Array, num_points: jax.Array):
        valid = jnp.arange(points.shape[0]) < num_points
        feats = PointNet2Backbone(
            npoints=(512, 128, 32, 16), radii=(0.5, 1.0, 2.0, 4.0),
            nsamples=(16, 16, 16, 16), channels=(16, 32, 64, 128),
            out_channels=64, name="backbone")(points, valid)
        preds = PointHead(num_classes=self.det_cfg.num_classes,
                          predict_boxes=True, fc_channels=(64,),
                          name="point_head")(feats)

        scores_all = jax.nn.sigmoid(preds["cls"].astype(jnp.float32))
        score = jnp.max(scores_all, axis=1)
        label = jnp.argmax(scores_all, axis=1).astype(jnp.int32)
        proposals = decode_point_proposals(points, preds)
        keep, count, kscores = nms(
            proposals, jnp.where(valid, score, -jnp.inf),
            iou_thresh=self.det_cfg.nms_iou_thresh,
            pre_max=min(self.det_cfg.nms_pre_max, points.shape[0]),
            post_max=self.num_rois)
        safe = jnp.maximum(keep, 0)
        # proposals are constants to the second stage (reference
        # proposal_layer runs under no_grad)
        rois = jax.lax.stop_gradient(proposals[safe])

        roi_preds = RoIHead(grid=4, fc_channels=(128,),
                            name="roi_head")(points, feats, rois,
                                             valid_points=valid)
        refined, conf = refine_boxes(roi_preds, rois)
        boxes9 = jnp.concatenate(
            [refined, jnp.zeros((refined.shape[0], 2))], axis=1)
        final_scores = jnp.where(keep >= 0, conf * kscores, 0.0)
        return {
            "point_preds": preds, "point_features": feats,
            "rois": rois, "roi_preds": roi_preds,
            "points": points, "valid_points": valid,
            "detections": Detections(
                boxes=boxes9, scores=final_scores,
                labels=jnp.where(keep >= 0, label[safe], -1),
                count=count),
        }

    def loss(self, out, gt_boxes, gt_labels, gt_mask):
        """Point-head loss (per-point fg cls + proposal regression) + RoI
        refinement loss (reference detectors/point_rcnn.py
        get_training_loss = point_head.get_loss + roi_head.get_loss)."""
        from .point_head import point_head_loss, point_targets
        from .roi_head import proposal_targets, roi_head_loss
        gt = jnp.where(gt_mask[:, None], gt_boxes, 0.0)
        pt = point_targets(out["points"], gt, gt_labels, gt_mask,
                           valid_points=out["valid_points"])
        p_loss, aux = point_head_loss(out["point_preds"], pt,
                                      self.det_cfg.num_classes,
                                      valid_points=out["valid_points"])
        rt = proposal_targets(out["rois"], gt_boxes, gt_mask)
        r_loss, r_aux = roi_head_loss(out["roi_preds"], rt)
        aux = dict(aux)
        aux.update(r_aux)
        return p_loss + r_loss, aux

    def detect(self, points, num_points) -> Detections:
        return self(points, num_points)["detections"]
