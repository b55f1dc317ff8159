"""PillarNet — sparse-2D pillar trunk + center head.

Re-design of the reference PillarNet (pcdet detectors/pillarnet.py with
DynamicPillarVFESimple2D -> PillarRes18BackBone8x (sparse 2D residual
stages, backbones_3d/spconv_backbone_2d.py:207-290) -> PointPillarScatter3d
-> BaseBEVBackbone -> CenterHead): pillars stay SPARSE through the trunk —
the dense scatter happens only at stride 8, unlike PointPillars' immediate
dense canvas. The framework's 2D sparse library (ops.sparse ndim2d=True)
expresses the whole trunk with static capacities.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.schema import VoxelizeConfig, VoxelNeXtConfig
from ..ops.sparse import SparseTensor, from_voxels, to_dense
from ..ops.voxelize import VoxelGrid, voxelize_mean
from .pointpillars import BaseBEVBackbone, DenseCenterHead, decode_dense
from ..ops.sparse import build_subm_rulebook
from .voxelnext import Detections, SparseBasicBlock, SparseConvLayer


class PillarResBackbone(nn.Module):
    """Sparse 2D residual trunk to stride 8 (PillarRes18BackBone8x shape:
    per stage a strided sparse conv + two residual submanifold blocks)."""
    channels: Tuple[int, ...] = (32, 64, 128, 256)
    capacity: int = 0

    @nn.compact
    def __call__(self, st: SparseTensor) -> SparseTensor:
        cap = self.capacity or st.ids.shape[0]
        chs = self.channels
        rb = build_subm_rulebook(st, ndim2d=True)
        st = SparseConvLayer(chs[0], ndim2d=True, name="conv_input")(st, rb)
        st = SparseBasicBlock(chs[0], ndim2d=True, name="res1a")(st, rb)
        st = SparseBasicBlock(chs[0], ndim2d=True, name="res1b")(st, rb)
        for i, ch in enumerate(chs[1:], start=1):
            cap = max(cap * 3 // 4, 1024)
            st = SparseConvLayer(ch, subm=False, stride=2, ndim2d=True,
                                 out_capacity=cap, name=f"down{i}")(st)
            rb = build_subm_rulebook(st, ndim2d=True)
            st = SparseBasicBlock(ch, ndim2d=True,
                                  name=f"res{i + 1}a")(st, rb)
            st = SparseBasicBlock(ch, ndim2d=True,
                                  name=f"res{i + 1}b")(st, rb)
        return st


class PillarNetDetector(nn.Module):
    det_cfg: VoxelNeXtConfig
    vox_cfg: VoxelizeConfig

    def voxel_grid(self) -> VoxelGrid:
        """Pillar grid: full z range as ONE voxel (2D pillars)."""
        pr = self.vox_cfg.point_range
        vs = self.vox_cfg.voxel_size
        return VoxelGrid.create(pr, (vs[0], vs[1], pr[5] - pr[2]))

    @nn.compact
    def __call__(self, points: jax.Array, num_points: jax.Array):
        grid = self.voxel_grid()
        vox = voxelize_mean(points, num_points, grid,
                            max_voxels=self.vox_cfg.max_voxels)
        st = from_voxels(vox.coords, vox.features, grid.grid_size)
        st = PillarResBackbone(capacity=self.vox_cfg.max_voxels,
                               name="backbone2d_sparse")(st)
        dense = to_dense(st)                     # [C, 1, H/8, W/8]
        bev = dense[:, 0]
        bev = BaseBEVBackbone(layer_channels=(64, 128),
                              layer_strides=(1, 2),
                              upsample_channels=(64, 64),
                              name="backbone2d")(bev)
        preds = DenseCenterHead(self.det_cfg.num_classes, name="head")(bev)
        return {"bev_dense": bev, "preds": preds}

    def detect(self, points, num_points) -> Detections:
        out = self(points, num_points)
        return decode_dense(out["preds"], self.det_cfg, self.vox_cfg,
                            stride=self.det_cfg.spatial_stride)
