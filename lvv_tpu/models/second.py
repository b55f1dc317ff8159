"""SECOND — sparse voxel trunk + anchor head (fourth detector family).

Re-design of the reference SECONDNet (pcdet detectors/second_net.py:
MeanVFE -> VoxelBackBone8x -> HeightCompression -> BaseBEVBackbone ->
AnchorHeadSingle). Composed entirely from existing framework pieces; the
anchor table is a compile-time constant derived from the voxel grid.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config.schema import VoxelizeConfig, VoxelNeXtConfig
from ..ops.sparse import from_voxels
from ..ops.voxelize import VoxelGrid, voxelize_mean
from .anchor_head import (AnchorHead, anchor_head_loss,
                          assign_anchor_targets, decode_anchor_preds,
                          generate_anchors)
from .centerpoint import CenterPointBackbone3D, height_compression
from .pointpillars import BaseBEVBackbone
from .voxelnext import Detections

# nuScenes-ish per-class anchor sizes (dx, dy, dz); trimmed to num_classes
DEFAULT_ANCHOR_SIZES = ((4.6, 1.95, 1.72), (6.9, 2.5, 2.8), (0.7, 0.7, 1.7))


def default_anchor_table(det_cfg: VoxelNeXtConfig, vox_cfg: VoxelizeConfig):
    """Compile-time anchor table + class ids for the standard BEV geometry
    (pure function of the configs — shared by SECOND, PartA2, VoxelRCNN,
    CaDDN so their anchor layouts stay in lockstep)."""
    grid = VoxelGrid.create(vox_cfg.point_range, vox_cfg.voxel_size)
    stride = det_cfg.spatial_stride
    h = -(-grid.grid_size[1] // stride)
    w = -(-grid.grid_size[0] // stride)
    sizes = DEFAULT_ANCHOR_SIZES[: min(det_cfg.num_classes,
                                       len(DEFAULT_ANCHOR_SIZES))]
    anchors, acls = generate_anchors(
        (h, w), sizes, vox_cfg.point_range,
        (grid.voxel_size[0] * stride, grid.voxel_size[1] * stride))
    return anchors, acls, len(sizes)


class SECONDDetector(nn.Module):
    det_cfg: VoxelNeXtConfig
    vox_cfg: VoxelizeConfig

    def voxel_grid(self) -> VoxelGrid:
        return VoxelGrid.create(self.vox_cfg.point_range,
                                self.vox_cfg.voxel_size)

    def anchor_table(self) -> Tuple[np.ndarray, np.ndarray]:
        anchors, acls, _ = default_anchor_table(self.det_cfg, self.vox_cfg)
        return anchors, acls

    @nn.compact
    def __call__(self, points: jax.Array, num_points: jax.Array):
        grid = self.voxel_grid()
        vox = voxelize_mean(points, num_points, grid,
                            max_voxels=self.vox_cfg.max_voxels)
        st = from_voxels(vox.coords, vox.features, grid.grid_size)
        st = CenterPointBackbone3D(self.det_cfg, self.vox_cfg.max_voxels,
                                   name="backbone3d")(st)
        bev = height_compression(st)
        bev = BaseBEVBackbone(layer_channels=(64, 128),
                              layer_strides=(1, 2),
                              upsample_channels=(64, 64),
                              name="backbone2d")(bev)
        anchors, acls = self.anchor_table()
        n_sizes = len(DEFAULT_ANCHOR_SIZES[: min(
            self.det_cfg.num_classes, len(DEFAULT_ANCHOR_SIZES))])
        preds = AnchorHead(num_classes=self.det_cfg.num_classes,
                           anchors_per_cell=n_sizes * 2, name="head")(bev)
        return {"preds": preds, "anchors": jnp.asarray(anchors),
                "anchor_cls": jnp.asarray(acls), "bev_dense": bev}

    def detect(self, points, num_points) -> Detections:
        out = self(points, num_points)
        return decode_anchor_preds(out["preds"], out["anchors"],
                                   out["anchor_cls"], self.det_cfg)

    def loss(self, out, gt_boxes, gt_labels, gt_mask):
        targets = assign_anchor_targets(out["anchors"], out["anchor_cls"],
                                        gt_boxes, gt_labels, gt_mask)
        return anchor_head_loss(out["preds"], targets,
                                self.det_cfg.num_classes)
