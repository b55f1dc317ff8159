"""PointPillars — pillar-based BEV detector (second model-zoo family).

Re-design of the reference's PointPillar stack (pcdet detectors registry
detectors/__init__.py:19-38; PillarVFE backbones_3d/vfe; PointPillarScatter
backbones_2d/map_to_bev; BaseBEVBackbone backbones_2d; anchor/center heads):

- PillarVFE: per-pillar PointNet over decorated point features
  [x, y, z, i, xc, yc, zc, xp, yp] (cluster + pillar-center offsets), max-
  pooled per pillar;
- PointPillarScatter: pillar features scattered onto the dense BEV canvas —
  a single segment-scatter here;
- BaseBEVBackbone: dense multi-scale conv/deconv trunk (pure MXU work);
- head: CenterPoint-style dense heatmap head + the shared NMS decode.

Dense 2D conv after the scatter is exactly what TPUs are best at, so unlike
VoxelNeXt this family needs no sparse machinery at all.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config.schema import VoxelizeConfig, VoxelNeXtConfig
from ..ops.boxes import limit_period
from ..ops.nms import nms
from ..ops.voxelize import VoxelGrid, Voxels, voxelize
from .voxelnext import Detections


class PillarVFE(nn.Module):
    """Pillar feature encoder (reference pillar_vfe.py): decorate points
    with cluster/center offsets, Linear+LN+ReLU, max-pool per pillar."""
    out_ch: int = 64
    vox_cfg: VoxelizeConfig = None

    @nn.compact
    def __call__(self, vox: Voxels, grid: VoxelGrid) -> jax.Array:
        feats = vox.features                      # [P, N, 4]
        p, n, _ = feats.shape
        mask = (jnp.arange(n)[None, :] < vox.num_points[:, None])[..., None]
        counts = jnp.maximum(vox.num_points, 1)[:, None, None]
        mean_xyz = jnp.sum(feats[..., :3] * mask, axis=1,
                           keepdims=True) / counts
        cluster = feats[..., :3] - mean_xyz       # xc, yc, zc

        vx, vy = grid.voxel_size[0], grid.voxel_size[1]
        x0, y0 = grid.point_range[0], grid.point_range[1]
        cx = (vox.coords[:, 2:3].astype(jnp.float32) + 0.5) * vx + x0
        cy = (vox.coords[:, 1:2].astype(jnp.float32) + 0.5) * vy + y0
        center = jnp.stack([feats[..., 0] - cx[:, :1],
                            feats[..., 1] - cy[:, :1]], axis=-1)  # xp, yp

        dec = jnp.concatenate([feats, cluster, center], axis=-1)  # [P,N,9]
        dec = jnp.where(mask, dec, 0.0)
        h = nn.Dense(self.out_ch, name="fc")(dec)
        h = nn.LayerNorm(name="ln")(h)
        h = nn.relu(h)
        h = jnp.where(mask, h, -1e9)
        pooled = jnp.max(h, axis=1)               # [P, C]
        return jnp.where(vox.num_points[:, None] > 0, pooled, 0.0)


def pillar_scatter(pillar_feats: jax.Array, coords: jax.Array,
                   grid_hw: Tuple[int, int]) -> jax.Array:
    """[P, C] + (z,y,x) coords -> dense [C, H, W] BEV canvas
    (reference PointPillarScatter)."""
    h, w = grid_hw
    c = pillar_feats.shape[1]
    valid = jnp.all(coords >= 0, axis=1)
    lin = jnp.where(valid, coords[:, 1] * w + coords[:, 2], h * w)
    canvas = jnp.zeros((h * w + 1, c), pillar_feats.dtype)
    canvas = canvas.at[lin].add(jnp.where(valid[:, None], pillar_feats, 0.0))
    return canvas[:-1].reshape(h, w, c).transpose(2, 0, 1)


class BaseBEVBackbone(nn.Module):
    """Dense multi-scale trunk (reference backbones_2d/base_bev_backbone.py):
    N downsampling stages, each upsampled back and concatenated."""
    layer_channels: Tuple[int, ...] = (64, 128, 256)
    layer_strides: Tuple[int, ...] = (2, 2, 2)
    upsample_channels: Tuple[int, ...] = (128, 128, 128)

    @nn.compact
    def __call__(self, x_chw: jax.Array) -> jax.Array:
        x = x_chw[None].transpose(0, 2, 3, 1)     # NHWC
        ups = []
        total_stride = 1
        for i, (ch, st) in enumerate(zip(self.layer_channels,
                                         self.layer_strides)):
            x = nn.Conv(ch, (3, 3), strides=st, padding="SAME",
                        name=f"down{i}")(x)
            x = nn.LayerNorm(name=f"ln{i}")(x)
            x = nn.relu(x)
            x = nn.Conv(ch, (3, 3), padding="SAME", name=f"conv{i}")(x)
            x = nn.LayerNorm(name=f"ln{i}b")(x)
            x = nn.relu(x)
            total_stride *= st
            up = nn.ConvTranspose(self.upsample_channels[i],
                                  (total_stride, total_stride),
                                  strides=(total_stride, total_stride),
                                  name=f"up{i}")(x)
            up = nn.relu(nn.LayerNorm(name=f"uln{i}")(up))
            if ups:
                # odd grids round up through strided convs (e.g. 500 -> 125
                # -> 63 -> x8 = 504); crop to the first level's resolution
                up = up[:, :ups[0].shape[1], :ups[0].shape[2], :]
            ups.append(up)
        out = jnp.concatenate(ups, axis=-1)
        return out[0].transpose(2, 0, 1)          # [C, H, W]


class _ResBlock2D(nn.Module):
    """BasicBlock (reference base_bev_backbone.py:207-249): two 3x3 convs +
    identity (1x1-projected when strided/channel-changing)."""
    channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        idn = x
        y = nn.Conv(self.channels, (3, 3), strides=self.stride,
                    padding="SAME", use_bias=False, name="conv1")(x)
        y = nn.relu(nn.LayerNorm(name="n1")(y))
        y = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False,
                    name="conv2")(y)
        y = nn.LayerNorm(name="n2")(y)
        if self.stride != 1 or x.shape[-1] != self.channels:
            idn = nn.Conv(self.channels, (1, 1), strides=self.stride,
                          use_bias=False, name="down")(x)
            idn = nn.LayerNorm(name="dn")(idn)
        return nn.relu(y + idn)


class BaseBEVResBackbone(nn.Module):
    """Residual multi-scale BEV trunk (reference
    base_bev_backbone.py:252-351 BaseBEVResBackbone): per level a strided
    _ResBlock2D then layer_nums[i] unit-stride ones; each level upsampled
    back and concatenated, exactly the BaseBEVBackbone topology with
    residual blocks."""
    layer_channels: Tuple[int, ...] = (64, 128, 256)
    layer_strides: Tuple[int, ...] = (2, 2, 2)
    layer_nums: Tuple[int, ...] = (1, 1, 1)
    upsample_channels: Tuple[int, ...] = (128, 128, 128)

    @nn.compact
    def __call__(self, x_chw: jax.Array) -> jax.Array:
        x = x_chw[None].transpose(0, 2, 3, 1)     # NHWC
        ups = []
        total_stride = 1
        for i, (ch, st, n) in enumerate(zip(self.layer_channels,
                                            self.layer_strides,
                                            self.layer_nums)):
            x = _ResBlock2D(ch, stride=st, name=f"res{i}_0")(x)
            for k in range(n):
                x = _ResBlock2D(ch, name=f"res{i}_{k + 1}")(x)
            total_stride *= st
            up = nn.ConvTranspose(self.upsample_channels[i],
                                  (total_stride, total_stride),
                                  strides=(total_stride, total_stride),
                                  use_bias=False, name=f"up{i}")(x)
            up = nn.relu(nn.LayerNorm(name=f"uln{i}")(up))
            if ups:
                up = up[:, :ups[0].shape[1], :ups[0].shape[2], :]
            ups.append(up)
        out = jnp.concatenate(ups, axis=-1)
        return out[0].transpose(2, 0, 1)          # [C, H, W]


class BaseBEVBackboneV1(nn.Module):
    """Two-level FPN-style BEV neck (reference base_bev_backbone.py:115-204
    BaseBEVBackboneV1): consumes a sparse trunk's multi-scale x_conv4 /
    x_conv5 dense maps, deconv-upsamples each to the x_conv4 resolution,
    concatenates, and refines with the level-0 conv stack."""
    num_filters: Tuple[int, int] = (128, 256)
    layer_nums: Tuple[int, int] = (5, 5)
    upsample_channels: Tuple[int, int] = (256, 256)
    upsample_strides: Tuple[int, int] = (1, 2)

    def _stack(self, x, ch, n, tag):
        for k in range(n + 1):
            x = nn.Conv(ch, (3, 3), padding="SAME", use_bias=False,
                        name=f"{tag}_conv{k}")(x)
            x = nn.relu(nn.LayerNorm(name=f"{tag}_ln{k}")(x))
        return x

    @nn.compact
    def __call__(self, x_conv4_chw: jax.Array,
                 x_conv5_chw: jax.Array) -> jax.Array:
        x4 = x_conv4_chw[None].transpose(0, 2, 3, 1)
        x5 = x_conv5_chw[None].transpose(0, 2, 3, 1)
        s0, s1 = self.upsample_strides
        up0 = nn.ConvTranspose(self.upsample_channels[0], (s0, s0),
                               strides=(s0, s0), use_bias=False,
                               name="de0")(x4)
        up0 = nn.relu(nn.LayerNorm(name="de0_ln")(up0))
        x5 = self._stack(x5, self.num_filters[1], self.layer_nums[1], "b1")
        up1 = nn.ConvTranspose(self.upsample_channels[1], (s1, s1),
                               strides=(s1, s1), use_bias=False,
                               name="de1")(x5)
        up1 = nn.relu(nn.LayerNorm(name="de1_ln")(up1))
        up1 = up1[:, :up0.shape[1], :up0.shape[2], :]
        x = jnp.concatenate([up0, up1], axis=-1)
        x = self._stack(x, sum(self.upsample_channels),
                        self.layer_nums[0], "b0")
        return x[0].transpose(2, 0, 1)


class DenseCenterHead(nn.Module):
    """Dense CenterPoint-style head (reference dense_heads/center_head.py):
    shared conv then hm/center/center_z/dim/rot branches."""
    num_classes: int
    shared_ch: int = 64

    @nn.compact
    def __call__(self, bev_chw: jax.Array) -> Dict[str, jax.Array]:
        x = bev_chw[None].transpose(0, 2, 3, 1)
        x = nn.relu(nn.LayerNorm(name="shared_ln")(
            nn.Conv(self.shared_ch, (3, 3), padding="SAME",
                    name="shared")(x)))

        def branch(name, ch, bias=0.0):
            y = nn.Conv(ch, (3, 3), padding="SAME",
                        bias_init=nn.initializers.constant(bias),
                        name=name)(x)
            return y[0].transpose(2, 0, 1)        # [ch, H, W]

        return {"hm": branch("hm", self.num_classes, bias=-4.6),
                "center": branch("center", 2),
                "center_z": branch("center_z", 1),
                "dim": branch("dim", 3),
                "rot": branch("rot", 2)}


def decode_dense(preds: Dict[str, jax.Array], det_cfg: VoxelNeXtConfig,
                 vox_cfg: VoxelizeConfig, stride: int) -> Detections:
    """Dense top-K decode + NMS (reference centernet_utils dense decode)."""
    hm = jax.nn.sigmoid(preds["hm"].astype(jnp.float32))  # [C, H, W]
    c, h, w = hm.shape
    flat = hm.reshape(-1)
    k = min(det_cfg.nms_pre_max, flat.shape[0])
    scores, idx = jax.lax.top_k(flat, k)
    label = (idx // (h * w)).astype(jnp.int32)
    yx = idx % (h * w)
    ys = (yx // w).astype(jnp.float32)
    xs = (yx % w).astype(jnp.float32)

    g = lambda name: preds[name].reshape(preds[name].shape[0], -1)[:, yx].T
    center, center_z = g("center"), g("center_z")
    dim = jnp.exp(jnp.clip(g("dim"), -5, 5))
    rot = g("rot")
    vx, vy = vox_cfg.voxel_size[0], vox_cfg.voxel_size[1]
    x0, y0 = vox_cfg.point_range[0], vox_cfg.point_range[1]
    x = (xs + center[:, 0]) * stride * vx + x0
    y = (ys + center[:, 1]) * stride * vy + y0
    heading = limit_period(jnp.arctan2(rot[:, 0], rot[:, 1]), 0.5,
                           2 * np.pi)
    boxes = jnp.stack([x, y, center_z[:, 0], dim[:, 0], dim[:, 1],
                       dim[:, 2], heading,
                       jnp.zeros_like(x), jnp.zeros_like(x)], axis=1)
    valid = scores > det_cfg.score_thresh
    keep, count, kscores = nms(boxes, scores,
                               iou_thresh=det_cfg.nms_iou_thresh,
                               pre_max=k, post_max=det_cfg.nms_post_max,
                               valid=valid)
    safe = jnp.maximum(keep, 0)
    return Detections(boxes=boxes[safe],
                      scores=jnp.where(keep >= 0, kscores, 0.0),
                      labels=jnp.where(keep >= 0, label[safe], -1),
                      count=count)


class PointPillarsDetector(nn.Module):
    """points -> detections, fully dense after the pillar scatter."""
    det_cfg: VoxelNeXtConfig
    vox_cfg: VoxelizeConfig
    pillar_ch: int = 64

    def voxel_grid(self) -> VoxelGrid:
        # pillars: single z bin over the full height range
        pr = self.vox_cfg.point_range
        vs = (self.vox_cfg.voxel_size[0], self.vox_cfg.voxel_size[1],
              pr[5] - pr[2])
        return VoxelGrid.create(pr, vs)

    @nn.compact
    def __call__(self, points: jax.Array, num_points: jax.Array):
        grid = self.voxel_grid()
        vox = voxelize(points, num_points, grid,
                       max_voxels=self.vox_cfg.max_voxels,
                       max_points_per_voxel=self.vox_cfg.max_points_per_voxel)
        pillars = PillarVFE(self.pillar_ch, self.vox_cfg,
                            name="vfe")(vox, grid)
        nx, ny, _ = grid.grid_size
        canvas = pillar_scatter(pillars, vox.coords, (ny, nx))
        bev = BaseBEVBackbone(name="backbone")(canvas)
        preds = DenseCenterHead(self.det_cfg.num_classes, name="head")(bev)
        return {"bev_dense": bev, "preds": preds}

    def detect(self, points, num_points) -> Detections:
        out = self(points, num_points)
        # the trunk's deconvs return every scale to the pillar-grid
        # resolution, so the decode stride is 1 pillar
        return decode_dense(out["preds"], self.det_cfg, self.vox_cfg,
                            stride=1)
