"""CenterPoint — sparse 3D trunk + dense BEV head (third detector family).

Re-design of the reference CenterPoint path (pcdet detectors/centerpoint.py;
backbones_3d VoxelResBackBone8x; map_to_bev/height_compression.py
HeightCompression folds the z axis into channels of a dense map;
backbones_2d BaseBEVBackbone; dense_heads CenterHead): composes the
framework's existing pieces — the sparse stages of the VoxelNeXt trunk, a
HeightCompression collapse, the dense multi-scale BEV trunk from the
PointPillars family, and the dense center head + shared decode.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.schema import VoxelizeConfig, VoxelNeXtConfig
from ..ops.sparse import SparseTensor, from_voxels, to_dense
from ..ops.voxelize import VoxelGrid, voxelize_mean
from .pointpillars import BaseBEVBackbone, DenseCenterHead, decode_dense
from ..ops.sparse import build_subm_rulebook
from .voxelnext import Detections, SparseBasicBlock, SparseConvLayer


def height_compression(st: SparseTensor) -> jax.Array:
    """Dense [C*nz, ny, nx] map: z folded into channels (reference
    map_to_bev/height_compression.py)."""
    dense = to_dense(st)                      # [C, nz, ny, nx]
    c, nz, ny, nx = dense.shape
    return dense.reshape(c * nz, ny, nx)


class CenterPointBackbone3D(nn.Module):
    """Sparse stages to stride 8 (VoxelResBackBone8x shape)."""
    cfg: VoxelNeXtConfig
    capacity: int

    @nn.compact
    def __call__(self, st: SparseTensor) -> SparseTensor:
        chs = self.cfg.channels[:4]
        cap = self.capacity
        rb = build_subm_rulebook(st)
        st = SparseConvLayer(chs[0], name="conv_input")(st, rb)
        st = SparseBasicBlock(chs[0], name="res1")(st, rb)
        sched = getattr(self.cfg, "capacity_schedule", None)
        for i, ch in enumerate(chs[1:], start=1):
            cap = sched[i - 1] if sched and i - 1 < len(sched) else \
                max(cap * 3 // 4, 1024)
            st = SparseConvLayer(ch, subm=False, stride=2, out_capacity=cap,
                                 name=f"down{i}")(st)
            st = SparseBasicBlock(ch, name=f"res{i + 1}")(
                st, build_subm_rulebook(st))
        return st


class CenterPointDetector(nn.Module):
    det_cfg: VoxelNeXtConfig
    vox_cfg: VoxelizeConfig

    def voxel_grid(self) -> VoxelGrid:
        return VoxelGrid.create(self.vox_cfg.point_range,
                                self.vox_cfg.voxel_size)

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
        preds = DenseCenterHead(self.det_cfg.num_classes, name="head")(bev)
        return {"bev_dense": bev, "preds": preds}

    def detect(self, points, num_points) -> Detections:
        out = self(points, num_points)
        return decode_dense(out["preds"], self.det_cfg, self.vox_cfg,
                            stride=self.det_cfg.spatial_stride)
