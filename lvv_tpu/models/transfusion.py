"""TransFusion-style query-based detection head.

Re-design of the reference TransFusionHead (pcdet/models/dense_heads/
transfusion_head.py + target_assigner/hungarian_assigner.py): heatmap-
initialized object queries cross-attend to BEV features through transformer
decoder layers; each query predicts class scores + a box; training matches
queries to gts one-to-one.

TPU-first differences: query initialization takes the top-K heatmap peaks
(as the reference does) but the one-to-one assignment is an auction-style
greedy matcher expressed as K fixed matrix steps (the reference's scipy
Hungarian runs on host and breaks the jit boundary; greedy matching on the
same cost matrix is within-jit and, with well-separated queries, nearly
always identical). NMS-free decode.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config.schema import VoxelizeConfig, VoxelNeXtConfig
from ..ops.boxes import iou_aabb_bev
from .anchor_head import smooth_l1
from .layers import MLP, Dense, LayerNorm, MultiHeadAttention
from .voxelnext import Detections


class TransFusionDecoderLayer(nn.Module):
    num_heads: int = 4

    @nn.compact
    def __call__(self, queries, bev_tokens):
        q = queries + MultiHeadAttention(self.num_heads, name="self_attn")(
            LayerNorm(name="ln1")(queries))
        q = q + MultiHeadAttention(self.num_heads, name="cross_attn")(
            LayerNorm(name="ln2")(q), bev_tokens)
        q = q + MLP(4 * q.shape[-1], name="mlp")(LayerNorm(name="ln3")(q))
        return q


class TransFusionHead(nn.Module):
    """BEV [C, H, W] -> num_queries object predictions."""
    num_classes: int
    num_queries: int = 200
    d_model: int = 128
    num_layers: int = 2
    num_heads: int = 4

    @nn.compact
    def __call__(self, bev_chw: jax.Array) -> Dict[str, jax.Array]:
        c, h, w = bev_chw.shape
        tokens = bev_chw.reshape(c, h * w).T[None]          # [1, HW, C]
        tokens = Dense(self.d_model, name="in_proj")(tokens)

        # heatmap-initialized queries (reference: class heatmap top-K peaks)
        hm = nn.Conv(self.num_classes, (3, 3), padding="SAME",
                     bias_init=nn.initializers.constant(-4.6),
                     name="hm")(bev_chw[None].transpose(0, 2, 3, 1))[0]
        peak = jnp.max(jax.nn.sigmoid(hm.astype(jnp.float32)), axis=-1)
        # never more queries than BEV cells (tiny test grids)
        _, top_idx = jax.lax.top_k(peak.reshape(-1),
                                   min(self.num_queries, h * w))
        q_init = tokens[0, top_idx][None]                   # [1, Q, D]
        q_pos = jnp.stack([(top_idx % w).astype(jnp.float32),
                           (top_idx // w).astype(jnp.float32)], axis=-1)
        pos_emb = Dense(self.d_model, name="pos_emb")(
            q_pos / jnp.asarray([w, h], jnp.float32))[None]
        q = q_init + pos_emb

        for i in range(self.num_layers):
            q = TransFusionDecoderLayer(self.num_heads, name=f"layer_{i}")(
                q, tokens)
        q = q[0]
        cls = Dense(self.num_classes,
                    bias_init=nn.initializers.constant(-4.6),
                    name="cls")(q)
        box = Dense(8, name="box")(q)  # dxy offset, z, log dims, sin, cos
        return {"cls": cls, "box": box, "query_yx": q_pos[:, ::-1],
                "hm": hm}


def decode_queries(preds: Dict, det_cfg: VoxelNeXtConfig,
                   vox_cfg: VoxelizeConfig, stride: int) -> Detections:
    """NMS-free decode: each query emits at most one box."""
    scores_all = jax.nn.sigmoid(preds["cls"].astype(jnp.float32))
    score = jnp.max(scores_all, axis=-1)
    label = jnp.argmax(scores_all, axis=-1).astype(jnp.int32)
    b = preds["box"].astype(jnp.float32)
    yx = preds["query_yx"]
    vx, vy = vox_cfg.voxel_size[0], vox_cfg.voxel_size[1]
    x0, y0 = vox_cfg.point_range[0], vox_cfg.point_range[1]
    x = (yx[:, 1] + b[:, 0]) * stride * vx + x0
    y = (yx[:, 0] + b[:, 1]) * stride * vy + y0
    dims = jnp.exp(jnp.clip(b[:, 3:6], -5, 5))
    heading = jnp.arctan2(b[:, 6], b[:, 7])
    boxes = jnp.stack([x, y, b[:, 2], dims[:, 0], dims[:, 1], dims[:, 2],
                       heading, jnp.zeros_like(x), jnp.zeros_like(x)],
                      axis=1)
    k = min(det_cfg.nms_post_max, boxes.shape[0])
    top, idx = jax.lax.top_k(score, k)
    valid = top > det_cfg.score_thresh
    return Detections(boxes=boxes[idx],
                      scores=jnp.where(valid, top, 0.0),
                      labels=jnp.where(valid, label[idx], -1),
                      count=jnp.sum(valid.astype(jnp.int32)))


def greedy_one_to_one(cost: jax.Array, gt_mask: jax.Array):
    """Greedy one-to-one matching on a [Q, G] cost matrix (in-jit stand-in
    for the reference's host-side Hungarian). Returns (gt_of_query [Q],
    matched mask [Q]): iteratively take the global minimum cost pair, G
    fixed steps."""
    q_num, g_num = cost.shape
    big = 1e9
    cost = jnp.where(gt_mask[None, :], cost, big)

    def body(_, state):
        c, gt_of_q = state
        flat = jnp.argmin(c)
        qi, gi = flat // g_num, flat % g_num
        take = c[qi, gi] < big
        gt_of_q = jnp.where(take, gt_of_q.at[qi].set(gi), gt_of_q)
        c = jnp.where(take, c.at[qi, :].set(big).at[:, gi].set(big), c)
        return c, gt_of_q

    gt_of_q = jnp.full((q_num,), -1, jnp.int32)
    _, gt_of_q = jax.lax.fori_loop(0, g_num, body, (cost, gt_of_q))
    return gt_of_q, gt_of_q >= 0


def hungarian_one_to_one(cost: jax.Array, gt_mask: jax.Array):
    """EXACT one-to-one assignment (reference target_assigner/
    hungarian_assigner.py runs scipy linear_sum_assignment on the host).

    jax.pure_callback ships the [Q, G] cost matrix to the host, solves it
    exactly with scipy, and returns fixed-shape (gt_of_query [Q], matched
    [Q]). Assignment picks targets only (no gradients flow through it), so
    a host round trip per step is semantically free; swap in
    greedy_one_to_one when the callback overhead matters more than the
    assignment optimality."""
    q_num, g_num = cost.shape
    big = 1e9
    cost = jnp.where(gt_mask[None, :], cost.astype(jnp.float32), big)
    # scipy raises on NaN/inf (which a diverging step can produce and the
    # greedy matcher tolerated) — sanitize to the padding cost
    cost = jnp.where(jnp.isfinite(cost), jnp.clip(cost, -big, big), big)

    def _solve(c):
        from scipy.optimize import linear_sum_assignment
        c = np.asarray(c, np.float64)
        rows, cols = linear_sum_assignment(c)
        out = np.full((q_num,), -1, np.int32)
        for r, g in zip(rows, cols):
            if c[r, g] < big / 2:      # skip pads matched by necessity
                out[r] = g
        return out

    gt_of_q = jax.pure_callback(
        _solve, jax.ShapeDtypeStruct((q_num,), jnp.int32), cost,
        vmap_method="sequential")
    return gt_of_q, gt_of_q >= 0


def transfusion_loss(preds: Dict, gt_boxes, gt_labels, gt_mask,
                     det_cfg: VoxelNeXtConfig, vox_cfg: VoxelizeConfig,
                     stride: int, cls_weight: float = 1.0,
                     reg_weight: float = 0.5, matcher: str = "hungarian"):
    """Match-then-supervise (reference get_targets + loss). `matcher`:
    'hungarian' = exact host-callback assignment (reference semantics),
    'greedy' = in-jit approximation."""
    dets = decode_queries(preds, det_cfg, vox_cfg, stride)
    # cost: -IoU + center distance + class mismatch
    iou = iou_aabb_bev(dets.boxes[:, :7], gt_boxes[:, :7])
    dist = jnp.linalg.norm(dets.boxes[:, None, :2] - gt_boxes[None, :, :2],
                           axis=-1)
    cost = dist - 5.0 * iou
    match_fn = hungarian_one_to_one if matcher == "hungarian" \
        else greedy_one_to_one
    gt_of_q, matched = match_fn(jax.lax.stop_gradient(cost), gt_mask)
    safe = jnp.maximum(gt_of_q, 0)

    logits = preds["cls"].astype(jnp.float32)
    onehot = jax.nn.one_hot(jnp.clip(gt_labels[safe], 0,
                                     det_cfg.num_classes - 1),
                            det_cfg.num_classes) * matched[:, None]
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * onehot + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * onehot + (1 - p) * (1 - onehot)
    focal = 0.25 * (1 - p_t) ** 2 * ce
    n_pos = jnp.maximum(jnp.sum(matched), 1)
    cls_loss = jnp.sum(focal) / n_pos

    # box loss in decoded space (L1 on matched queries)
    diff = dets.boxes[:, :7] - gt_boxes[safe][:, :7]
    reg_loss = jnp.sum(jnp.sum(smooth_l1(diff), axis=1) * matched) / n_pos
    total = cls_weight * cls_loss + reg_weight * reg_loss
    return total, {"tf_cls_loss": cls_loss, "tf_reg_loss": reg_loss}


class TransFusionDetector(nn.Module):
    """Standalone LiDAR-only TransFusion assembly (reference
    detectors/transfusion.py + tools/cfgs/nuscenes_models/
    transfusion_lidar.yaml: MeanVFE -> VoxelResBackBone8x ->
    HeightCompression -> BaseBEVBackbone -> TransFusionHead, NMS-free).

    Reuses the framework's sparse res trunk (CenterPointBackbone3D covers
    the VoxelResBackBone8x shape) and the query head above; the decode is
    query-per-box, no NMS (reference POST_PROCESSING consumes the head's
    own final_box_dicts)."""
    det_cfg: VoxelNeXtConfig
    vox_cfg: VoxelizeConfig
    num_queries: int = 200

    def voxel_grid(self):
        from ..ops.voxelize import VoxelGrid
        return VoxelGrid.create(self.vox_cfg.point_range,
                                self.vox_cfg.voxel_size)

    @nn.compact
    def __call__(self, points: jax.Array, num_points: jax.Array):
        from ..ops.sparse import from_voxels
        from ..ops.voxelize import voxelize_mean
        from .centerpoint import CenterPointBackbone3D, height_compression
        from .pointpillars import BaseBEVBackbone
        grid = self.voxel_grid()
        vox = voxelize_mean(points, num_points, grid,
                            max_voxels=self.vox_cfg.max_voxels)
        st = from_voxels(vox.coords, vox.features, grid.grid_size)
        st = CenterPointBackbone3D(self.det_cfg, self.vox_cfg.max_voxels,
                                   name="backbone3d")(st)
        bev = height_compression(st)
        # transfusion_lidar.yaml BACKBONE_2D: strides (1, 2), up (1, 2)
        bev = BaseBEVBackbone(layer_channels=(64, 128),
                              layer_strides=(1, 2),
                              upsample_channels=(64, 64),
                              name="backbone2d")(bev)
        preds = TransFusionHead(num_classes=self.det_cfg.num_classes,
                                num_queries=self.num_queries,
                                name="head")(bev)
        return {"bev_dense": bev, "preds": preds}

    def detect(self, points, num_points) -> Detections:
        out = self(points, num_points)
        return decode_queries(out["preds"], self.det_cfg, self.vox_cfg,
                              stride=self.det_cfg.spatial_stride)
