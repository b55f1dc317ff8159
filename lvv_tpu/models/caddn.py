"""CaDDN — monocular camera detector via categorical depth distributions.

Re-design of the reference CaDDN (pcdet detectors/caddn.py with
vfe/image_vfe.py: DepthFFN (image backbone -> depth-bin logits + image
features, ffn/depth_ffn.py) -> frustum features = feature x depth-prob
outer product -> FrustumToVoxel (voxel centers projected into the image,
trilinear sampling of the frustum volume — f2v/frustum_grid_generator.py
+ sampler.py, kornia-based) -> Conv2DCollapse map_to_bev ->
BaseBEVBackbone -> AnchorHeadSingle; depth supervised with LID-discretized
lidar depth maps, ffn/ddn_loss).

TPU-first: the kornia grid_sample becomes an explicit 8-corner trilinear
gather over the [D, Hf, Wf, C] frustum volume at the static [Z*Y*X] voxel
lattice; everything is one jit region with no dynamic shapes.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config.schema import VoxelizeConfig, VoxelNeXtConfig
from ..ops.voxelize import VoxelGrid
from .anchor_head import (AnchorHead, anchor_head_loss,
                          assign_anchor_targets, decode_anchor_preds)
from .pointpillars import BaseBEVBackbone
from .second import default_anchor_table
from .voxelnext import Detections


def bin_depths(depth: jax.Array, mode: str = "LID", depth_min: float = 2.0,
               depth_max: float = 46.8, num_bins: int = 80,
               clamp: bool = True) -> jax.Array:
    """Depth -> bin index (reference transform_utils.bin_depths). LID:
    linearly-increasing discretization; UD: uniform. Out-of-range depths
    map to num_bins (the "background" bin) when clamp."""
    if mode == "UD":
        idx_f = (depth - depth_min) / ((depth_max - depth_min) / num_bins)
    else:  # LID
        bin_size = 2 * (depth_max - depth_min) / (num_bins * (1 + num_bins))
        arg = 1 + 8 * (depth - depth_min) / bin_size
        idx_f = jnp.where(arg >= 0, -0.5 + 0.5 * jnp.sqrt(
            jnp.maximum(arg, 0.0)), -1.0)
    idx_f = jnp.floor(idx_f)
    bad = (idx_f < 0) | (idx_f >= num_bins) | ~jnp.isfinite(idx_f) \
        | ~jnp.isfinite(depth)
    idx = jnp.where(bad, num_bins if clamp else 0,
                    idx_f).astype(jnp.int32)
    return idx


def bin_centers(mode: str = "LID", depth_min: float = 2.0,
                depth_max: float = 46.8, num_bins: int = 80) -> np.ndarray:
    """Continuous depth of each bin center (for the frustum sampler)."""
    i = np.arange(num_bins, dtype=np.float32) + 0.5
    if mode == "UD":
        return depth_min + (depth_max - depth_min) / num_bins * i
    bin_size = 2 * (depth_max - depth_min) / (num_bins * (1 + num_bins))
    return depth_min + bin_size / 2 * i * (i + 1)


class DepthFFN(nn.Module):
    """Image backbone + depth-bin / feature heads (reference
    ffn/depth_ffn.py; the DeepLabV3 DDN becomes a strided conv pyramid —
    same contract: [3, H, W] -> depth logits [D+1, Hf, Wf] + features
    [C, Hf, Wf] at stride `downsample`)."""
    num_bins: int = 80
    channels: int = 64
    downsample: int = 4

    @nn.compact
    def __call__(self, img_chw: jax.Array) -> Tuple[jax.Array, jax.Array]:
        x = img_chw[None].transpose(0, 2, 3, 1)
        ch, s = 32, 1
        i = 0
        while s < self.downsample:
            x = nn.Conv(ch, (3, 3), strides=2, padding="SAME",
                        name=f"conv{i}")(x)
            x = nn.relu(nn.LayerNorm(name=f"ln{i}")(x))
            s *= 2
            ch = min(ch * 2, 128)
            i += 1
        x = nn.Conv(128, (3, 3), padding="SAME", name="trunk")(x)
        x = nn.relu(nn.LayerNorm(name="lnt")(x))
        depth_logits = nn.Conv(self.num_bins + 1, (1, 1),
                               name="depth")(x)[0]
        feats = nn.Conv(self.channels, (1, 1), name="feat")(x)[0]
        return (depth_logits.transpose(2, 0, 1),
                feats.transpose(2, 0, 1))


def frustum_features(depth_logits: jax.Array, feats: jax.Array
                     ) -> jax.Array:
    """[D+1, Hf, Wf] logits + [C, Hf, Wf] -> [D, Hf, Wf, C] frustum volume
    (reference depth_ffn.create_frustum_features: softmax over D+1, drop
    the background bin, outer product)."""
    prob = jax.nn.softmax(depth_logits.astype(jnp.float32), axis=0)[:-1]
    return prob[..., None] * feats.transpose(1, 2, 0)[None]


def sample_frustum(volume: jax.Array, u: jax.Array, v: jax.Array,
                   dbin: jax.Array) -> jax.Array:
    """Trilinear sample [D, Hf, Wf, C] at fractional (dbin, v, u) -> [N, C]
    (the kornia grid_sample in f2v/sampler.py, explicit on TPU).
    Out-of-range coordinates contribute zeros."""
    d_n, h_n, w_n, c = volume.shape

    def corner(di, vi, ui, wgt):
        ok = ((di >= 0) & (di < d_n) & (vi >= 0) & (vi < h_n)
              & (ui >= 0) & (ui < w_n))
        dis = jnp.clip(di, 0, d_n - 1)
        vis = jnp.clip(vi, 0, h_n - 1)
        uis = jnp.clip(ui, 0, w_n - 1)
        return jnp.where(ok[:, None], volume[dis, vis, uis], 0.0) \
            * wgt[:, None]

    d0 = jnp.floor(dbin).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    u0 = jnp.floor(u).astype(jnp.int32)
    fd, fv, fu = dbin - d0, v - v0, u - u0
    out = 0.0
    for dd in (0, 1):
        for dv in (0, 1):
            for du in (0, 1):
                w = (jnp.abs(1 - dd - fd) * jnp.abs(1 - dv - fv)
                     * jnp.abs(1 - du - fu))
                out = out + corner(d0 + dd, v0 + dv, u0 + du, w)
    return out


def conv2d_collapse(vox: jax.Array) -> jax.Array:
    """[C, Z, Y, X] -> [C*Z, Y, X] (reference map_to_bev/conv2d_collapse.py
    flattens z into channels; its 1x1 conv lives in the caller)."""
    c, z, y, x = vox.shape
    return vox.reshape(c * z, y, x)


class CaDDNDetector(nn.Module):
    """images + calib -> BEV -> anchor detections (monocular)."""
    det_cfg: VoxelNeXtConfig
    vox_cfg: VoxelizeConfig
    num_depth_bins: int = 40
    depth_min: float = 2.0
    depth_max: float = 46.8
    cam_channels: int = 32
    z_bins: int = 4           # voxel grid z resolution for the 3D volume
    img_downsample: int = 4

    def voxel_grid(self) -> VoxelGrid:
        return VoxelGrid.create(self.vox_cfg.point_range,
                                self.vox_cfg.voxel_size)

    @nn.compact
    def __call__(self, image: jax.Array, intrinsics: jax.Array,
                 lidar2cam: jax.Array) -> Dict[str, jax.Array]:
        """image [3, H, W]; intrinsics [3, 3]; lidar2cam [4, 4]."""
        depth_logits, feats = DepthFFN(
            num_bins=self.num_depth_bins, channels=self.cam_channels,
            downsample=self.img_downsample, name="ffn")(image)
        volume = frustum_features(depth_logits, feats)   # [D, Hf, Wf, C]

        grid = self.voxel_grid()
        pr = self.vox_cfg.point_range
        # voxel-center lattice at a coarse z (CaDDN voxel grid)
        xs = jnp.linspace(pr[0], pr[3], grid.grid_size[0],
                          endpoint=False) + grid.voxel_size[0] / 2
        ys = jnp.linspace(pr[1], pr[4], grid.grid_size[1],
                          endpoint=False) + grid.voxel_size[1] / 2
        zs = jnp.linspace(pr[2], pr[5], self.z_bins, endpoint=False) \
            + (pr[5] - pr[2]) / self.z_bins / 2
        zz, yy, xx = jnp.meshgrid(zs, ys, xs, indexing="ij")
        lattice = jnp.stack([xx, yy, zz,
                             jnp.ones_like(xx)], axis=-1)   # [Z, Y, X, 4]
        flat = lattice.reshape(-1, 4)
        cam = flat @ lidar2cam.T                            # [N, 4]
        depth = cam[:, 2]
        eps = 1e-3
        u = (intrinsics[0, 0] * cam[:, 0] / jnp.maximum(depth, eps)
             + intrinsics[0, 2]) / self.img_downsample - 0.5
        v = (intrinsics[1, 1] * cam[:, 1] / jnp.maximum(depth, eps)
             + intrinsics[1, 2]) / self.img_downsample - 0.5
        # continuous (fractional) LID bin coordinate
        bin_size = 2 * (self.depth_max - self.depth_min) / \
            (self.num_depth_bins * (1 + self.num_depth_bins))
        dbin = -0.5 + 0.5 * jnp.sqrt(
            1 + 8 * jnp.maximum(depth - self.depth_min, 0.0) / bin_size)
        dbin = jnp.where(depth > eps, dbin, -10.0)          # behind: miss
        sampled = sample_frustum(volume, u, v, dbin)        # [N, C]
        vox = sampled.reshape(self.z_bins, grid.grid_size[1],
                              grid.grid_size[0],
                              self.cam_channels).transpose(3, 0, 1, 2)
        bev = conv2d_collapse(vox)
        # stem to the anchor stride (the BEV trunk preserves resolution)
        x = bev[None].transpose(0, 2, 3, 1)
        s, i = 1, 0
        while s < self.det_cfg.spatial_stride:
            x = nn.Conv(64, (3, 3), strides=2, padding="SAME",
                        name=f"stem{i}")(x)
            x = nn.relu(nn.LayerNorm(name=f"stem_ln{i}")(x))
            s *= 2
            i += 1
        bev = x[0].transpose(2, 0, 1)
        bev = BaseBEVBackbone(layer_channels=(64, 128),
                              layer_strides=(1, 2),
                              upsample_channels=(64, 64),
                              name="backbone2d")(bev)
        anchors, acls, n_sizes = default_anchor_table(self.det_cfg,
                                                      self.vox_cfg)
        preds = AnchorHead(num_classes=self.det_cfg.num_classes,
                           anchors_per_cell=n_sizes * 2, name="head")(bev)
        return {"preds": preds, "anchors": jnp.asarray(anchors),
                "anchor_cls": jnp.asarray(acls), "bev_dense": bev,
                "depth_logits": depth_logits}

    def detect(self, image, intrinsics, lidar2cam) -> Detections:
        out = self(image, intrinsics, lidar2cam)
        return decode_anchor_preds(out["preds"], out["anchors"],
                                   out["anchor_cls"], self.det_cfg)

    def loss(self, out, gt_boxes, gt_labels, gt_mask,
             lidar_depth_map: jax.Array | None = None):
        """RPN loss + depth-distribution CE against LID-binned lidar depth
        (reference ddn_loss: focal CE over bins; pixels with no lidar
        return are ignored)."""
        total, stats = anchor_head_loss(
            out["preds"],
            assign_anchor_targets(out["anchors"], out["anchor_cls"],
                                  gt_boxes, gt_labels, gt_mask),
            self.det_cfg.num_classes)
        if lidar_depth_map is not None:
            tgt = bin_depths(lidar_depth_map, depth_min=self.depth_min,
                             depth_max=self.depth_max,
                             num_bins=self.num_depth_bins)
            logits = out["depth_logits"].transpose(1, 2, 0)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            has = lidar_depth_map > 0
            ce = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
            depth_loss = jnp.sum(ce * has) / jnp.maximum(jnp.sum(has), 1)
            total = total + depth_loss
            stats = {**stats, "depth_loss": depth_loss}
        return total, stats
