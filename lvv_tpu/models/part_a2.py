"""PartA2 — part-aware & part-aggregation detector (UNetV2 backbone).

Re-design of the reference PartA2Net (pcdet detectors/PartA2_net.py:
MeanVFE -> UNetV2 -> HeightCompression -> BaseBEVBackbone ->
AnchorHeadSingle RPN + PointIntraPartOffsetHead on the UNet decoder's
per-voxel features + PartA2FCHead RoI refinement over RoI-aware-pooled
part/seg features; backbone at backbones_3d/spconv_unet.py:49-220,
point head at dense_heads/point_intra_part_offset_head.py, RoI head at
roi_heads/partA2_head.py).

TPU-first shape discipline: the UNet decoder restores features onto the
ENCODER's saved active sets via ops.sparse.inverse_conv (the transposed
rulebook — spconv's indice_key mechanism expressed as pure index algebra),
so every stage keeps a static capacity. Part targets (is-foreground +
intra-part canonical offsets, the paper's part locations) come from
ops.pool.points_in_rotated_boxes over voxel centers — fixed [V, G] masks.

Deviation noted: the reference's conv_out z-only strided conv
(spconv_unet.py:99-107) is replaced by height_compression on the stride-8
stage; capacity/stride contracts are identical downstream.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config.schema import VoxelizeConfig, VoxelNeXtConfig
from ..ops.pool import roiaware_pool3d
from ..ops.sparse import SparseTensor, from_voxels, inverse_conv
from ..ops.voxelize import VoxelGrid, voxelize_mean
from .anchor_head import (AnchorHead, anchor_head_loss,
                          assign_anchor_targets, decode_anchor_preds)
from .centerpoint import height_compression
from .layers import Dense
from .pointpillars import BaseBEVBackbone
from .second import default_anchor_table
from ..ops.sparse import build_subm_rulebook
from .voxelnext import Detections, SparseBasicBlock, SparseConvLayer


class InverseConvLayer(nn.Module):
    """inverse conv + LN + ReLU onto a target active set."""
    out_ch: int
    kernel: int = 3
    stride: int = 2

    @nn.compact
    def __call__(self, st: SparseTensor, target: SparseTensor
                 ) -> SparseTensor:
        k = self.kernel ** 3
        cin = st.features.shape[-1]
        w = self.param("kernel", nn.initializers.he_normal(
            in_axis=(0, 1), out_axis=2), (k, cin, self.out_ch))
        b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        out = inverse_conv(st, target.ids, target.grid, w, b,
                           kernel=self.kernel, stride=self.stride)
        scale = self.param("ln_scale", nn.initializers.ones, (self.out_ch,))
        bias = self.param("ln_bias", nn.initializers.zeros, (self.out_ch,))
        f = out.features.astype(jnp.float32)
        mean = f.mean(-1, keepdims=True)
        var = f.var(-1, keepdims=True)
        f = nn.relu((f - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias)
        f = jnp.where(out.valid[:, None], f, 0.0).astype(out.features.dtype)
        return SparseTensor(out.ids, f, out.grid)


def channel_reduction(st: SparseTensor, out_ch: int) -> SparseTensor:
    """[V, C] -> [V, out_ch] by grouped sum (reference
    UNetV2.channel_reduction: view(n, out, -1).sum(2))."""
    v, c = st.features.shape
    assert c % out_ch == 0
    f = st.features.reshape(v, out_ch, c // out_ch).sum(axis=2)
    return SparseTensor(st.ids, f, st.grid)


class SparseUNet(nn.Module):
    """UNetV2: 4-stage sparse encoder + UR-block decoder back to the input
    resolution (reference spconv_unet.py:49-220)."""
    channels: Tuple[int, ...] = (16, 32, 64, 64)
    capacity: int = 0      # stage-1 capacity; 0 -> input capacity

    @nn.compact
    def __call__(self, st: SparseTensor) -> Dict[str, SparseTensor]:
        chs = self.channels
        cap = self.capacity or st.ids.shape[0]
        rb = build_subm_rulebook(st)
        x = SparseConvLayer(chs[0], name="conv_input")(st, rb)
        x1 = SparseConvLayer(chs[0], name="conv1")(x, rb)
        laterals = [x1]
        x = x1
        for i, ch in enumerate(chs[1:], start=1):
            cap = max(cap * 3 // 4, 1024)
            x = SparseConvLayer(ch, subm=False, stride=2, out_capacity=cap,
                                name=f"down{i}")(x)
            rb = build_subm_rulebook(x)
            x = SparseConvLayer(ch, name=f"subm{i}a")(x, rb)
            x = SparseConvLayer(ch, name=f"subm{i}b")(x, rb)
            laterals.append(x)
        x1, x2, x3, x4 = laterals

        def ur_block(lateral, bottom, out_ch, target, idx):
            """UR block (reference UR_block_forward:137-146): lateral
            residual transform, concat with bottom, subm merge, grouped-sum
            shortcut, then inverse conv onto `target`'s active set (None ->
            stay at this resolution with a subm conv)."""
            t = SparseBasicBlock(lateral.features.shape[-1],
                                 name=f"up_t{idx}")(lateral)
            cat = SparseTensor(t.ids, jnp.concatenate(
                [bottom.features, t.features], axis=-1), t.grid)
            m = SparseConvLayer(lateral.features.shape[-1],
                                name=f"up_m{idx}")(cat)
            red = channel_reduction(cat, m.features.shape[-1])
            merged = SparseTensor(m.ids, m.features + red.features, m.grid)
            if target is None:
                return SparseConvLayer(out_ch, name=f"up_out{idx}")(merged)
            return InverseConvLayer(out_ch, name=f"inv{idx}")(merged, target)

        up4 = ur_block(x4, x4, chs[2], x3, idx=4)
        up3 = ur_block(x3, up4, chs[1], x2, idx=3)
        up2 = ur_block(x2, up3, chs[0], x1, idx=2)
        up1 = ur_block(x1, up2, chs[0], None, idx=1)
        return {"encoded": x4, "point_feats": up1}


def part_targets(centers: jax.Array, valid: jax.Array, gt_boxes: jax.Array,
                 gt_labels: jax.Array, gt_mask: jax.Array):
    """Per-voxel segmentation + intra-part-offset targets (reference
    point_intra_part_offset_head.assign_targets: points inside a gt box are
    foreground with part location = canonical box coords in [0, 1]).

    centers [V, 3]; returns {seg [V] int32 (-1 pad, 0 bg, 1..C fg),
    part [V, 3] in [0,1]}."""
    # vectorized [V, G] membership; first matching box wins (reference
    # points_in_boxes semantics)
    d = centers[:, None, :] - gt_boxes[None, :, :3]           # [V, G, 3]
    c = jnp.cos(-gt_boxes[:, 6])[None, :]
    s = jnp.sin(-gt_boxes[:, 6])[None, :]
    u = c * d[..., 0] - s * d[..., 1]
    v = s * d[..., 0] + c * d[..., 1]
    inside = (gt_mask[None, :]
              & (jnp.abs(u) <= gt_boxes[None, :, 3] / 2)
              & (jnp.abs(v) <= gt_boxes[None, :, 4] / 2)
              & (jnp.abs(d[..., 2]) <= gt_boxes[None, :, 5] / 2))
    has = jnp.any(inside, axis=1)
    first = jnp.argmax(inside, axis=1)                        # [V]
    seg = jnp.where(has, gt_labels[first] + 1, 0)
    pick = lambda t: jnp.take_along_axis(t, first[:, None], 1)[:, 0]
    dims = jnp.maximum(gt_boxes[first, 3:6], 1e-3)
    # canonical part location in [0, 1] (paper eq. 1)
    part = jnp.stack([
        jnp.clip(pick(u) / dims[:, 0] + 0.5, 0, 1),
        jnp.clip(pick(v) / dims[:, 1] + 0.5, 0, 1),
        jnp.clip(pick(d[..., 2]) / dims[:, 2] + 0.5, 0, 1)], axis=1)
    part = jnp.where(has[:, None], part, 0.0)
    seg = jnp.where(valid, seg, -1).astype(jnp.int32)
    return {"seg": seg, "part": part}


class PointIntraPartOffsetHead(nn.Module):
    """Per-voxel seg logits + part-offset regression (reference
    dense_heads/point_intra_part_offset_head.py)."""
    num_classes: int
    hidden: int = 32

    @nn.compact
    def __call__(self, feats: jax.Array) -> Dict[str, jax.Array]:
        h = nn.relu(Dense(self.hidden, name="fc1")(feats))
        seg = Dense(self.num_classes, name="seg",
                    bias_init=nn.initializers.constant(-4.6))(h)
        part = Dense(3, name="part")(h)
        return {"seg": seg, "part": part}


def point_part_loss(preds: Dict, targets: Dict) -> Tuple[jax.Array, Dict]:
    """Focal-ish seg BCE + fg-only part BCE (reference get_loss)."""
    seg_t, part_t = targets["seg"], targets["part"]
    valid = seg_t >= 0
    fg = seg_t > 0
    onehot = jax.nn.one_hot(jnp.clip(seg_t - 1, 0, None),
                            preds["seg"].shape[-1]) * fg[:, None]
    logits = preds["seg"].astype(jnp.float32)
    ce = jnp.maximum(logits, 0) - logits * onehot + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    n_fg = jnp.maximum(jnp.sum(fg), 1)
    seg_loss = jnp.sum(ce * valid[:, None]) / n_fg
    part_logit = preds["part"].astype(jnp.float32)
    pce = jnp.maximum(part_logit, 0) - part_logit * part_t + \
        jnp.log1p(jnp.exp(-jnp.abs(part_logit)))
    part_loss = jnp.sum(pce * fg[:, None]) / n_fg
    total = seg_loss + part_loss
    return total, {"seg_loss": seg_loss, "part_loss": part_loss}


class PartA2RoIHead(nn.Module):
    """Part-aggregation refinement (reference roi_heads/partA2_head.py):
    RoI-aware pool the decoder's per-voxel (seg-prob + part + feature)
    vectors into a grid per RoI, flatten through FCs, predict cls + residual
    box refinement."""
    grid: int = 6
    hidden: int = 128

    @nn.compact
    def __call__(self, centers, feats, rois, valid) -> Dict[str, jax.Array]:
        pooled = roiaware_pool3d(centers, feats, rois[:, :7], self.grid,
                                 mode="max", valid_points=valid)
        m = pooled.shape[0]
        h = pooled.reshape(m, -1)
        h = nn.relu(Dense(self.hidden, name="fc1")(h))
        h = nn.relu(Dense(self.hidden, name="fc2")(h))
        return {"cls": Dense(1, name="cls")(h)[:, 0],
                "reg": Dense(7, name="reg")(h)}


class PartA2Detector(nn.Module):
    det_cfg: VoxelNeXtConfig
    vox_cfg: VoxelizeConfig
    roi_grid: int = 6

    def voxel_grid(self) -> VoxelGrid:
        return VoxelGrid.create(self.vox_cfg.point_range,
                                self.vox_cfg.voxel_size)

    @nn.compact
    def __call__(self, points: jax.Array, num_points: jax.Array):
        grid = self.voxel_grid()
        vox = voxelize_mean(points, num_points, grid,
                            max_voxels=self.vox_cfg.max_voxels)
        st = from_voxels(vox.coords, vox.features, grid.grid_size)
        unet = SparseUNet(channels=tuple(self.det_cfg.channels[:4]),
                          capacity=self.vox_cfg.max_voxels,
                          name="unet")(st)
        bev = height_compression(unet["encoded"])
        bev = BaseBEVBackbone(layer_channels=(64, 128),
                              layer_strides=(1, 2),
                              upsample_channels=(64, 64),
                              name="backbone2d")(bev)
        anchors, acls, n_sizes = default_anchor_table(self.det_cfg,
                                                      self.vox_cfg)
        preds = AnchorHead(num_classes=self.det_cfg.num_classes,
                           anchors_per_cell=n_sizes * 2, name="head")(bev)

        point_preds = PointIntraPartOffsetHead(
            self.det_cfg.num_classes, name="point_head")(
            unet["point_feats"].features)
        # voxel centers in metric space for targets / pooling
        from ..ops.sparse import delinearize
        coords = delinearize(unet["point_feats"].ids,
                             unet["point_feats"].grid)
        vs = jnp.asarray(grid.voxel_size, jnp.float32)
        origin = jnp.asarray(self.vox_cfg.point_range[:3], jnp.float32)
        centers = (coords[:, ::-1].astype(jnp.float32) + 0.5) * vs + origin
        centers_valid = unet["point_feats"].valid

        # stage 2: decode proposals, part-aggregate, refine in-line
        # (reference PartA2_net forward runs roi_head in the module chain)
        proposals = decode_anchor_preds(preds, jnp.asarray(anchors),
                                        jnp.asarray(acls), self.det_cfg)
        seg_prob = jax.nn.sigmoid(point_preds["seg"].astype(jnp.float32))
        part = jax.nn.sigmoid(point_preds["part"].astype(jnp.float32))
        agg = jnp.concatenate(
            [seg_prob, part,
             unet["point_feats"].features.astype(jnp.float32)], axis=1)
        roi_preds = PartA2RoIHead(grid=self.roi_grid, name="roi_head")(
            centers, agg, proposals.boxes[:, :7], centers_valid)
        conf = jax.nn.sigmoid(roi_preds["cls"])
        from .roi_head import canonical_decode
        refined = canonical_decode(roi_preds["reg"],
                                   proposals.boxes[:, :7])
        boxes9 = jnp.concatenate(
            [refined, jnp.zeros((refined.shape[0], 2))], axis=1)
        detections = Detections(boxes=boxes9,
                                scores=conf * proposals.scores,
                                labels=proposals.labels,
                                count=proposals.count)
        return {"preds": preds, "anchors": jnp.asarray(anchors),
                "anchor_cls": jnp.asarray(acls), "bev_dense": bev,
                "point_preds": point_preds, "centers": centers,
                "centers_valid": centers_valid,
                "point_feats": unet["point_feats"].features,
                "proposals": proposals, "roi_preds": roi_preds,
                "detections": detections}

    def detect(self, points, num_points) -> Detections:
        return self(points, num_points)["detections"]

    def loss(self, out, gt_boxes, gt_labels, gt_mask):
        rpn_loss, rpn_stats = anchor_head_loss(
            out["preds"],
            assign_anchor_targets(out["anchors"], out["anchor_cls"],
                                  gt_boxes, gt_labels, gt_mask),
            self.det_cfg.num_classes)
        tgt = part_targets(out["centers"], out["centers_valid"],
                           gt_boxes, gt_labels, gt_mask)
        pt_loss, pt_stats = point_part_loss(out["point_preds"], tgt)
        return rpn_loss + pt_loss, {**rpn_stats, **pt_stats}
