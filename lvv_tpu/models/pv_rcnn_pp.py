"""PV-RCNN++ — proposal-centric keypoints + VectorPool aggregation.

Re-design of the reference PVRCNNPlusPlus (pcdet detectors/
pv_rcnn_plusplus.py; pfe/voxel_set_abstraction.py sectorized
proposal-centric sampling; VectorPoolAggregationModuleMSG over
pointnet2_stack vector_pool_gpu.cu). Differences from the framework's
PV-RCNN family:

1. keypoints are farthest-point-sampled ONLY from points near first-stage
   proposals (sectorized_proposal_centric_sampling) — the sectors in the
   reference exist to parallelize CUDA FPS across angular partitions; on
   TPU one fused masked FPS produces the same proposal-centric coverage,
   so sectoring is an optional partition count, not a correctness knob;
2. multi-scale voxel features aggregate through vector_pool (sub-voxel-
   binned, position-encoded local pooling) instead of ball-query+max.
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config.schema import VoxelizeConfig, VoxelNeXtConfig
from ..ops.sampling import ball_query, farthest_point_sample
from ..ops.sparse import from_voxels
from ..ops.voxel_query import gather_neighborhood, vector_pool
from ..ops.voxelize import VoxelGrid, voxelize_mean
from .anchor_head import AnchorHead, decode_anchor_preds, generate_anchors
from .centerpoint import CenterPointBackbone3D, height_compression
from .layers import Dense
from .pv_rcnn import bev_bilinear
from .roi_head import RoIHead, refine_boxes
from .second import DEFAULT_ANCHOR_SIZES
from .voxelnext import Detections


def proposal_centric_mask(points: jax.Array, valid: jax.Array,
                          proposals: jax.Array, prop_scores: jax.Array,
                          radius_extra: float = 1.6) -> jax.Array:
    """Points within each proposal's enlarged footprint (reference
    sectorized_proposal_centric_sampling stage 1: keep points whose
    distance to a proposal center is under the box half-diagonal + delta).
    Zero-score proposals (NMS padding) are ignored."""
    c2 = proposals[None, :, :2] - points[:, None, :2]
    d2 = jnp.sum(c2 * c2, axis=-1)
    half_diag = 0.5 * jnp.sqrt(proposals[:, 3] ** 2 + proposals[:, 4] ** 2)
    thr = (half_diag + radius_extra) ** 2
    live = prop_scores > 0
    near = jnp.any((d2 <= thr[None, :]) & live[None, :], axis=1)
    return near & valid


class VectorPoolVSA(nn.Module):
    """Voxel-set abstraction with vector_pool neighborhoods (reference
    VectorPoolAggregationModuleMSG)."""
    num_keypoints: int = 512
    out_channels: int = 128
    raw_radius: float = 0.8
    raw_nsample: int = 16
    divisions: Sequence[int] = (2, 2, 2)
    ranges: Sequence[int] = (1, 1, 1)

    @nn.compact
    def __call__(self, points, kp_mask, voxel_tensors, voxel_strides,
                 bev_chw, grid: VoxelGrid, bev_stride: int):
        kp_idx = farthest_point_sample(points[:, :3], self.num_keypoints,
                                       kp_mask)
        kp = points[kp_idx, :3]
        branches = []
        # raw-point branch (ball + mean, as in PV-RCNN)
        gi, cnt = ball_query(kp, points[:, :3], self.raw_radius,
                             self.raw_nsample, kp_mask)
        raw = points[gi][..., 3:] if points.shape[1] > 3 else \
            points[gi][..., :3] - kp[:, None, :]
        m = (jnp.arange(self.raw_nsample)[None, :]
             < jnp.maximum(cnt, 1)[:, None])[..., None]
        pooled = jnp.sum(jnp.where(m, raw, 0.0), axis=1) / \
            jnp.maximum(cnt, 1)[:, None]
        branches.append(Dense(32, name="raw_proj")(pooled))

        origin = jnp.asarray(grid.point_range[:3], jnp.float32)
        for si, (st, stride) in enumerate(zip(voxel_tensors, voxel_strides)):
            vs = jnp.asarray(grid.voxel_size, jnp.float32) * stride
            qc = jnp.floor((kp - origin) / vs).astype(jnp.int32)[:, ::-1]
            rel, feats, mask = gather_neighborhood(
                st, kp, qc, vs, origin, ranges=tuple(self.ranges),
                radius=float(2.0 * np.max(np.asarray(grid.voxel_size))
                             * stride))
            ext = tuple(float(v) * (self.ranges[i] + 0.5)
                        for i, v in enumerate(np.asarray(grid.voxel_size)
                                              * stride))
            vp = vector_pool(rel, feats, mask, extent=ext,
                             divisions=tuple(self.divisions))
            branches.append(Dense(32, name=f"vp_proj{si}")(vp))

        stride_m = (grid.voxel_size[0] * bev_stride,
                    grid.voxel_size[1] * bev_stride)
        bev_feat = bev_bilinear(bev_chw, kp[:, :2], grid.point_range,
                                stride_m)
        branches.append(Dense(32, name="bev_proj")(bev_feat))
        fused = jnp.concatenate(branches, axis=-1)
        fused = nn.relu(nn.LayerNorm(name="ln")(
            Dense(self.out_channels, name="fuse")(fused)))
        return kp, fused


class PVRCNNPlusPlusDetector(nn.Module):
    det_cfg: VoxelNeXtConfig
    vox_cfg: VoxelizeConfig
    num_keypoints: int = 512

    def voxel_grid(self) -> VoxelGrid:
        return VoxelGrid.create(self.vox_cfg.point_range,
                                self.vox_cfg.voxel_size)

    @nn.compact
    def __call__(self, points, num_points):
        grid = self.voxel_grid()
        vox = voxelize_mean(points, num_points, grid,
                            max_voxels=self.vox_cfg.max_voxels)
        st0 = from_voxels(vox.coords, vox.features, grid.grid_size)
        st8 = CenterPointBackbone3D(self.det_cfg, self.vox_cfg.max_voxels,
                                    name="backbone3d")(st0)
        bev = height_compression(st8)
        stride = self.det_cfg.spatial_stride
        h = -(-grid.grid_size[1] // stride)
        w = -(-grid.grid_size[0] // stride)
        sizes = DEFAULT_ANCHOR_SIZES[: min(self.det_cfg.num_classes, 3)]
        anchors, acls = generate_anchors(
            (h, w), sizes, self.vox_cfg.point_range,
            (grid.voxel_size[0] * stride, grid.voxel_size[1] * stride))
        preds = AnchorHead(num_classes=self.det_cfg.num_classes,
                           anchors_per_cell=len(sizes) * 2,
                           name="rpn")(bev)
        proposals = decode_anchor_preds(preds, jnp.asarray(anchors),
                                        jnp.asarray(acls), self.det_cfg)

        valid_pts = jnp.arange(points.shape[0]) < num_points
        kp_mask = proposal_centric_mask(points, valid_pts,
                                        proposals.boxes[:, :7],
                                        proposals.scores)
        # fall back to all valid points when no proposal survives NMS
        kp_mask = jnp.where(jnp.any(kp_mask), kp_mask, valid_pts)
        kp, kp_feats = VectorPoolVSA(
            num_keypoints=self.num_keypoints, name="vsa")(
            points, kp_mask, [st8], [stride], bev, grid, stride)

        # proposals are constants to the second stage (reference
        # proposal_layer runs under no_grad)
        rois = jax.lax.stop_gradient(proposals.boxes[:, :7])
        roi_preds = RoIHead(grid=4, fc_channels=(128, 128), name="roi_head")(
            kp, kp_feats, rois)
        refined, conf = refine_boxes(roi_preds, rois)
        boxes9 = jnp.concatenate(
            [refined, jnp.zeros((refined.shape[0], 2))], axis=1)
        return {
            "proposals": proposals,
            "detections": Detections(
                boxes=boxes9, scores=conf * proposals.scores,
                labels=proposals.labels, count=proposals.count),
            "keypoints": kp, "keypoint_features": kp_feats,
            "rpn_preds": preds, "anchors": jnp.asarray(anchors),
            "anchor_cls": jnp.asarray(acls),
            "rois": rois, "roi_preds": roi_preds,
        }

    def loss(self, out, gt_boxes, gt_labels, gt_mask):
        """RPN anchor loss + RoI refinement loss (reference
        detectors/pv_rcnn_plusplus.py get_training_loss)."""
        from .pv_rcnn import two_stage_loss
        return two_stage_loss(out, gt_boxes, gt_labels, gt_mask,
                              self.det_cfg.num_classes)

    def detect(self, points, num_points) -> Detections:
        return self(points, num_points)["detections"]
