"""Voxel R-CNN — two-stage detector with voxel-query RoI pooling.

Re-design of the reference VoxelRCNN (pcdet detectors/voxel_rcnn.py +
roi_heads/voxelrcnn_head.py): stage 1 is the SECOND-style trunk + anchor
RPN; stage 2 lays a G^3 lattice of grid points inside every proposal and
aggregates MULTI-SCALE sparse voxel features around each grid point with
voxel-neighborhood queries (the voxel_query CUDA op -> ops.voxel_query's
sorted-id binary searches) followed by an accelerated PointNet (masked
max over in-radius neighbors), then FC layers refine each box.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config.schema import VoxelizeConfig, VoxelNeXtConfig
from ..ops.sparse import SparseTensor, from_voxels
from ..ops.voxel_query import gather_neighborhood
from ..ops.voxelize import VoxelGrid, voxelize_mean
from .anchor_head import AnchorHead, decode_anchor_preds
from .centerpoint import height_compression
from .layers import Dense
from .pointpillars import BaseBEVBackbone
from .roi_head import canonical_decode
from .second import default_anchor_table
from ..ops.sparse import build_subm_rulebook
from .voxelnext import Detections, SparseBasicBlock, SparseConvLayer


class MultiScaleBackbone3D(nn.Module):
    """Sparse stages to stride 8, returning every stage (the reference
    VoxelBackBone8x keeps x_conv1..4 in batch_dict for the head)."""
    cfg: VoxelNeXtConfig
    capacity: int

    @nn.compact
    def __call__(self, st: SparseTensor) -> List[SparseTensor]:
        chs = self.cfg.channels[:4]
        cap = self.capacity
        rb = build_subm_rulebook(st)
        st = SparseConvLayer(chs[0], name="conv_input")(st, rb)
        st = SparseBasicBlock(chs[0], name="res1")(st, rb)
        stages = [st]
        for i, ch in enumerate(chs[1:], start=1):
            cap = max(cap * 3 // 4, 1024)
            st = SparseConvLayer(ch, subm=False, stride=2, out_capacity=cap,
                                 name=f"down{i}")(st)
            st = SparseBasicBlock(ch, name=f"res{i + 1}")(
                st, build_subm_rulebook(st))
            stages.append(st)
        return stages


def roi_grid_points_3d(rois: jax.Array, grid: int) -> jax.Array:
    """[M, 7] -> [M, G^3, 3] metric grid points inside each rotated box
    (reference voxelrcnn_head.get_global_grid_points_of_roi)."""
    gs = (jnp.arange(grid, dtype=jnp.float32) + 0.5) / grid - 0.5
    gx, gy, gz = jnp.meshgrid(gs, gs, gs, indexing="ij")
    local = jnp.stack([gx.reshape(-1), gy.reshape(-1), gz.reshape(-1)],
                      axis=1)                                  # [G3, 3]
    lx = local[None, :, 0] * rois[:, None, 3]
    ly = local[None, :, 1] * rois[:, None, 4]
    lz = local[None, :, 2] * rois[:, None, 5]
    c = jnp.cos(rois[:, 6])[:, None]
    s = jnp.sin(rois[:, 6])[:, None]
    x = lx * c - ly * s + rois[:, None, 0]
    y = lx * s + ly * c + rois[:, None, 1]
    z = lz + rois[:, None, 2]
    return jnp.stack([x, y, z], axis=-1)


class VoxelRCNNHead(nn.Module):
    """Grid-point voxel aggregation + FC refinement
    (reference roi_heads/voxelrcnn_head.py)."""
    grid: int = 4
    mlp_ch: int = 32
    fc_channels: Tuple[int, ...] = (128, 128)
    ranges: Tuple[int, int, int] = (1, 1, 1)

    @nn.compact
    def __call__(self, stages: List[SparseTensor], strides: List[int],
                 rois: jax.Array, base_grid: VoxelGrid,
                 point_range) -> Dict[str, jax.Array]:
        m = rois.shape[0]
        gp = roi_grid_points_3d(rois, self.grid)               # [M, G3, 3]
        g3 = gp.shape[1]
        flat = gp.reshape(-1, 3)
        origin = jnp.asarray(point_range[:3], jnp.float32)
        pooled_scales = []
        for si, (st, stride) in enumerate(zip(stages, strides)):
            vs = jnp.asarray(base_grid.voxel_size, jnp.float32) * stride
            coords_f = (flat - origin) / vs
            qc = jnp.floor(coords_f).astype(jnp.int32)[:, ::-1]  # zyx
            radius = float(np.linalg.norm(
                np.asarray(base_grid.voxel_size) * stride))
            rel, feats, mask = gather_neighborhood(
                st, flat, qc, vs, origin, ranges=self.ranges, radius=radius)
            h = jnp.concatenate([rel, feats], axis=-1)
            h = nn.relu(Dense(self.mlp_ch, name=f"mlp{si}")(h))
            h = jnp.where(mask[..., None], h, -jnp.inf)
            h = jnp.max(h, axis=1)                             # [M*G3, ch]
            h = jnp.where(jnp.isfinite(h), h, 0.0)
            pooled_scales.append(h)
        h = jnp.concatenate(pooled_scales, axis=-1).reshape(m, -1)
        for i, ch in enumerate(self.fc_channels):
            h = nn.relu(Dense(ch, name=f"fc{i}")(h))
        return {"cls": Dense(1, name="cls")(h)[:, 0],
                "reg": Dense(7, name="reg")(h)}


class VoxelRCNNDetector(nn.Module):
    det_cfg: VoxelNeXtConfig
    vox_cfg: VoxelizeConfig
    roi_grid: int = 4

    def voxel_grid(self) -> VoxelGrid:
        return VoxelGrid.create(self.vox_cfg.point_range,
                                self.vox_cfg.voxel_size)

    @nn.compact
    def __call__(self, points: jax.Array, num_points: jax.Array,
                 image: jax.Array = None, proj: jax.Array = None):
        grid = self.voxel_grid()
        vox = voxelize_mean(points, num_points, grid,
                            max_voxels=self.vox_cfg.max_voxels)
        st = from_voxels(vox.coords, vox.features, grid.grid_size)
        focal_aux = []
        if getattr(self.det_cfg, "focal", False):
            # VoxelBackBone8xFocal trunk (reference voxel_rcnn_car_focal*
            # configs); focal_use_img adds the camera branch — pass the
            # RGB image [H, W, 3] and the combined [3, 4] lidar->pixel
            # matrix (KITTI: P2 @ R0_rect @ Tr_velo_to_cam)
            from .focal_conv import FocalMultiScaleBackbone3D
            use_img = getattr(self.det_cfg, "focal_use_img", False) \
                and image is not None
            image_feat = None
            if use_img:
                from .semseg import PyramidFeat2D
                image_feat = PyramidFeat2D(
                    feat_layers=("layer1",),
                    reduce_out=(self.det_cfg.channels[0],),
                    trunk_norm=getattr(self.det_cfg, "focal_trunk_norm",
                                       "gn"),
                    name="semseg")(image[None])[
                        "layer1_feat2d"][0]
                # layer1 sits at stride 4: scale the pixel rows of the
                # projection so voxels land in feature-map coordinates
                # (the reference instead upsamples features to full res,
                # focal_sparse_conv.py:72-73 — same mapping, fewer bytes)
                proj = proj * jnp.asarray([[0.25], [0.25], [1.0]],
                                          proj.dtype)
            stages, focal_aux = FocalMultiScaleBackbone3D(
                self.det_cfg, self.vox_cfg.max_voxels, use_img=use_img,
                spawn=getattr(self.det_cfg, "focal_spawn", 128),
                name="backbone3d")(
                    st, image_feat, proj,
                    self.vox_cfg.voxel_size, self.vox_cfg.point_range)
        else:
            stages = MultiScaleBackbone3D(
                self.det_cfg, self.vox_cfg.max_voxels,
                name="backbone3d")(st)
        bev = height_compression(stages[-1])
        bev = BaseBEVBackbone(layer_channels=(64, 128),
                              layer_strides=(1, 2),
                              upsample_channels=(64, 64),
                              name="backbone2d")(bev)
        anchors, acls, n_sizes = default_anchor_table(self.det_cfg,
                                                      self.vox_cfg)
        preds = AnchorHead(num_classes=self.det_cfg.num_classes,
                           anchors_per_cell=n_sizes * 2, name="rpn")(bev)
        proposals = decode_anchor_preds(preds, jnp.asarray(anchors),
                                        jnp.asarray(acls), self.det_cfg)

        # head pools from strides 2/4/8 (reference FEATURES_SOURCE
        # x_conv2..x_conv4)
        roi_preds = VoxelRCNNHead(grid=self.roi_grid, name="roi_head")(
            stages[1:], [2, 4, 8], proposals.boxes[:, :7], grid,
            self.vox_cfg.point_range)
        conf = jax.nn.sigmoid(roi_preds["cls"].astype(jnp.float32))
        refined = canonical_decode(
            roi_preds["reg"].astype(jnp.float32), proposals.boxes[:, :7])
        boxes9 = jnp.concatenate(
            [refined, jnp.zeros((refined.shape[0], 2))], axis=1)
        detections = Detections(boxes=boxes9,
                                scores=conf * proposals.scores,
                                labels=proposals.labels,
                                count=proposals.count)
        return {"preds": preds, "anchors": jnp.asarray(anchors),
                "anchor_cls": jnp.asarray(acls), "bev_dense": bev,
                "proposals": proposals, "roi_preds": roi_preds,
                "detections": detections, "focal_aux": focal_aux}

    def detect(self, points, num_points) -> Detections:
        return self(points, num_points)["detections"]

    def loss(self, out, gt_boxes, gt_labels, gt_mask):
        from .anchor_head import anchor_head_loss, assign_anchor_targets
        from .roi_head import proposal_targets, roi_head_loss
        rpn_loss, stats = anchor_head_loss(
            out["preds"],
            assign_anchor_targets(out["anchors"], out["anchor_cls"],
                                  gt_boxes, gt_labels, gt_mask),
            self.det_cfg.num_classes)
        tgt = proposal_targets(out["proposals"].boxes[:, :7], gt_boxes,
                               gt_mask)
        rcnn_loss, rstats = roi_head_loss(out["roi_preds"], tgt)
        total = rpn_loss + rcnn_loss
        if out.get("focal_aux"):
            from .focal_conv import focal_aux_loss
            fl = focal_aux_loss(out["focal_aux"], gt_boxes, gt_labels,
                                gt_mask)
            total = total + fl
            rstats = {**rstats, "loss_box_of_pts": fl}
        return total, {**stats, **rstats}
