"""PV-RCNN — voxel set abstraction + two-stage refinement.

Re-design of the reference PV-RCNN stack (pcdet detectors/pv_rcnn.py;
backbones_3d/pfe/voxel_set_abstraction.py over the pointnet2_stack CUDA
ops): FPS keypoints sampled from the raw cloud aggregate features from
(a) the raw points, (b) multi-scale sparse voxel features (voxel centers
as point sets), and (c) bilinear BEV samples; proposals from a first-stage
head refine through the RoI head over keypoint features.

All neighborhood ops come from lvv_tpu.ops.sampling; fixed shapes
throughout (static keypoint/neighbor counts).
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.schema import VoxelizeConfig, VoxelNeXtConfig
from ..ops.sampling import ball_query, farthest_point_sample
from ..ops.sparse import SparseTensor, delinearize, from_voxels
from ..ops.voxelize import VoxelGrid, voxelize_mean
from .anchor_head import (AnchorHead, decode_anchor_preds, generate_anchors)
from .centerpoint import CenterPointBackbone3D, height_compression
from .roi_head import RoIHead, refine_boxes
from .second import DEFAULT_ANCHOR_SIZES
from .voxelnext import Detections


def voxel_centers(st: SparseTensor, grid: VoxelGrid,
                  stride: int) -> Tuple[jax.Array, jax.Array]:
    """-> (centers [V, 3] in meters, valid [V]) for a sparse tensor at a
    given stride of the base voxel grid."""
    coords = delinearize(st.ids, st.grid)           # (z, y, x)
    vx, vy, vz = grid.voxel_size
    x0, y0, z0 = grid.point_range[0], grid.point_range[1], grid.point_range[2]
    cx = (coords[:, 2].astype(jnp.float32) + 0.5) * vx * stride + x0
    cy = (coords[:, 1].astype(jnp.float32) + 0.5) * vy * stride + y0
    cz = (coords[:, 0].astype(jnp.float32) + 0.5) * vz * stride + z0
    return jnp.stack([cx, cy, cz], axis=1), st.valid


def bev_bilinear(bev_chw: jax.Array, xy: jax.Array, point_range,
                 stride_m: Tuple[float, float]) -> jax.Array:
    """Bilinear sample a [C, H, W] BEV map at metric xy -> [K, C]."""
    c, h, w = bev_chw.shape
    u = (xy[:, 0] - point_range[0]) / stride_m[0] - 0.5
    v = (xy[:, 1] - point_range[1]) / stride_m[1] - 0.5
    u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, w - 2)
    v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, h - 2)
    du = jnp.clip(u - u0, 0, 1)[:, None]
    dv = jnp.clip(v - v0, 0, 1)[:, None]
    g = lambda vv, uu: bev_chw[:, vv, uu].T       # [K, C]
    return (g(v0, u0) * (1 - du) * (1 - dv) + g(v0, u0 + 1) * du * (1 - dv)
            + g(v0 + 1, u0) * (1 - du) * dv + g(v0 + 1, u0 + 1) * du * dv)


class VoxelSetAbstraction(nn.Module):
    """Keypoint feature aggregation (reference voxel_set_abstraction.py)."""
    num_keypoints: int = 2048
    out_channels: int = 128
    raw_radius: float = 0.8
    raw_nsample: int = 16
    voxel_radii: Sequence[float] = (1.2, 2.4)
    voxel_nsample: int = 16

    @nn.compact
    def __call__(self, points, num_points, voxel_tensors, voxel_strides,
                 bev_chw, grid: VoxelGrid, bev_stride: int):
        valid_pts = jnp.arange(points.shape[0]) < num_points
        kp_idx = farthest_point_sample(points[:, :3], self.num_keypoints,
                                       valid_pts)
        kp = points[kp_idx, :3]

        branches = []
        # (a) raw-point branch: ball-query around the keypoints + mean pool
        gi, cnt = ball_query(kp, points[:, :3], self.raw_radius,
                             self.raw_nsample, valid_pts)
        raw_feat = points[gi][..., 3:] if points.shape[1] > 3 else \
            points[gi][..., :3] - kp[:, None, :]
        mask = (jnp.arange(self.raw_nsample)[None, :]
                < jnp.maximum(cnt, 1)[:, None])[..., None]
        pooled = jnp.sum(jnp.where(mask, raw_feat, 0.0), axis=1) / \
            jnp.maximum(cnt, 1)[:, None]
        branches.append(nn.Dense(32, name="raw_proj")(pooled))

        # (b) multi-scale voxel branches
        for si, (st, stride) in enumerate(zip(voxel_tensors, voxel_strides)):
            centers, vvalid = voxel_centers(st, grid, stride)
            gi, cnt = ball_query(kp, centers, self.voxel_radii[
                min(si, len(self.voxel_radii) - 1)], self.voxel_nsample,
                vvalid)
            grouped = st.features[gi]
            mask = (jnp.arange(self.voxel_nsample)[None, :]
                    < jnp.maximum(cnt, 1)[:, None])[..., None]
            pooled = jnp.max(jnp.where(mask, grouped, -1e9), axis=1)
            pooled = jnp.where(cnt[:, None] > 0, pooled, 0.0)
            branches.append(nn.Dense(32, name=f"vox_proj{si}")(pooled))

        # (c) BEV bilinear branch
        stride_m = (grid.voxel_size[0] * bev_stride,
                    grid.voxel_size[1] * bev_stride)
        bev_feat = bev_bilinear(bev_chw, kp[:, :2], grid.point_range,
                                stride_m)
        branches.append(nn.Dense(32, name="bev_proj")(bev_feat))

        fused = jnp.concatenate(branches, axis=-1)
        fused = nn.relu(nn.LayerNorm(name="ln")(
            nn.Dense(self.out_channels, name="fuse")(fused)))
        return kp, fused


class PVRCNNDetector(nn.Module):
    """First-stage anchors + keypoint VSA + RoI refinement (reference
    detectors/pv_rcnn.py topology)."""
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
        trunk = CenterPointBackbone3D(self.det_cfg, self.vox_cfg.max_voxels,
                                      name="backbone3d")
        st8 = trunk(st0)
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

        kp, kp_feats = VoxelSetAbstraction(
            num_keypoints=self.num_keypoints, name="vsa")(
            points, num_points, [st8], [stride], bev, grid, stride)

        # proposals are constants to the second stage (the reference's
        # proposal layer runs under no_grad, detector3d_template.py
        # proposal_layer): grads reach the RPN only through its own loss
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
        """Two-stage loss: RPN anchor loss + RoI refinement loss
        (reference detectors/pv_rcnn.py get_training_loss = anchor head +
        point head + roi head; the keypoint-segmentation weighting term is
        folded out — keypoint features are unweighted here)."""
        return two_stage_loss(out, gt_boxes, gt_labels, gt_mask,
                              self.det_cfg.num_classes)

    def detect(self, points, num_points) -> Detections:
        return self(points, num_points)["detections"]


def two_stage_loss(out, gt_boxes, gt_labels, gt_mask, num_classes: int):
    """Shared anchor-RPN + RoI-head training loss (reference
    tools/train.py -> get_training_loss for PVRCNN/PVRCNNPlusPlus:
    rpn_loss + rcnn_loss over proposal_target_layer matches)."""
    from .anchor_head import anchor_head_loss, assign_anchor_targets
    from .roi_head import proposal_targets, roi_head_loss
    targets = assign_anchor_targets(out["anchors"], out["anchor_cls"],
                                    gt_boxes, gt_labels, gt_mask)
    rpn_loss, aux = anchor_head_loss(out["rpn_preds"], targets, num_classes)
    rt = proposal_targets(out["rois"], gt_boxes, gt_mask)
    roi_loss, roi_aux = roi_head_loss(out["roi_preds"], rt)
    aux = dict(aux)
    aux.update(roi_aux)
    aux["rpn_loss"] = rpn_loss
    return rpn_loss + roi_loss, aux
