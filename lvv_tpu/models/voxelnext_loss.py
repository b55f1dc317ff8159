"""VoxelNeXt training targets + losses, fixed-shape.

Re-design of the reference's sparse target assignment and losses
(voxelnext_head.py:107-112 loss wiring, :185-240 sparse-voxel gaussian
heatmap targets; pcdet/utils/loss_utils.py focal/L1 sparse variants):

- heatmap targets live ONLY on active sparse sites (the head can't predict
  elsewhere): for every gt box, a gaussian bump evaluated at each active
  site, max-combined per class channel;
- regression targets attach to each gt's nearest active site within its
  gaussian radius; L1 on [dx_offset, dy_offset, z, log-dims, sin, cos, vx,
  vy] (code_size 9, nuScenes);
- gaussian focal loss (CenterNet-style) over active sites.

All shapes static: gts padded to MAX_GT with a mask.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.schema import VoxelNeXtConfig, VoxelizeConfig
from ..ops.sparse import SparseTensor, delinearize


def gaussian_radius(dx: jax.Array, dy: jax.Array,
                    min_overlap: float = 0.5) -> jax.Array:
    """CenterNet radius heuristic (reference centernet_utils.gaussian_radius),
    reduced to the stable r1 root."""
    a1 = 1.0
    b1 = dy + dx
    c1 = dx * dy * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.maximum(b1 ** 2 - 4 * a1 * c1, 0.0))
    return jnp.maximum((b1 + sq1) / 2, 1.0)


def assign_targets(bev: SparseTensor, gt_boxes: jax.Array,
                   gt_labels: jax.Array, gt_mask: jax.Array,
                   det_cfg: VoxelNeXtConfig, vox_cfg: VoxelizeConfig,
                   stride: int):
    """-> dict of per-site targets.

    gt_boxes [G, 9] (x,y,z,dx,dy,dz,heading,vx,vy), gt_labels [G] int32,
    gt_mask [G] bool. Returns:
      hm_tgt   [V, C] gaussian heatmap
      reg_tgt  [V, 8] regression targets at assigned sites
      reg_mask [V] bool (site is some gt's center site)
    """
    vx, vy = vox_cfg.voxel_size[0], vox_cfg.voxel_size[1]
    x0, y0 = vox_cfg.point_range[0], vox_cfg.point_range[1]
    coords = delinearize(bev.ids, bev.grid)          # (0, y, x)
    site_y = coords[:, 1].astype(jnp.float32)
    site_x = coords[:, 2].astype(jnp.float32)
    valid_site = bev.valid

    # gt centers in stride-grid units
    gx = (gt_boxes[:, 0] - x0) / (vx * stride)
    gy = (gt_boxes[:, 1] - y0) / (vy * stride)
    gdx = gt_boxes[:, 3] / (vx * stride)
    gdy = gt_boxes[:, 4] / (vy * stride)
    radius = gaussian_radius(gdx, gdy)               # [G]
    sigma2 = (2 * radius / 6.0) ** 2 * 2.0

    # distance of every site to every gt center: [V, G]
    d2 = ((site_x[:, None] - gx[None, :]) ** 2
          + (site_y[:, None] - gy[None, :]) ** 2)
    bump = jnp.exp(-d2 / jnp.maximum(sigma2[None, :], 1e-6))
    bump = jnp.where(gt_mask[None, :] & valid_site[:, None], bump, 0.0)

    c = det_cfg.num_classes
    onehot = jax.nn.one_hot(jnp.clip(gt_labels, 0, c - 1), c)  # [G, C]
    onehot = onehot * gt_mask[:, None]
    hm_tgt = jnp.max(bump[:, :, None] * onehot[None, :, :], axis=1)  # [V, C]

    # nearest active site per gt = its "center site"
    d2_masked = jnp.where(valid_site[:, None], d2, 1e12)
    center_site = jnp.argmin(d2_masked, axis=0)      # [G]
    near_enough = jnp.take_along_axis(
        d2_masked, center_site[None, :], axis=0)[0] < (radius ** 2 + 1.0)
    assign = gt_mask & near_enough

    # the center site is an exact positive (the reference draws the gaussian
    # then pins the peak to 1, centernet_utils.draw_gaussian_to_heatmap);
    # without this, off-grid centers yield zero focal positives
    safe_center = jnp.where(assign, center_site, bev.ids.shape[0] - 1)
    peak = jax.nn.one_hot(jnp.clip(gt_labels, 0, c - 1), c) * assign[:, None]
    hm_tgt = hm_tgt.at[safe_center].max(peak)
    hm_tgt = hm_tgt * valid_site[:, None]

    reg_tgt = jnp.zeros((bev.ids.shape[0], 8), jnp.float32)
    reg_mask = jnp.zeros((bev.ids.shape[0],), bool)
    tgt_rows = jnp.stack([
        gx - site_x[center_site], gy - site_y[center_site],
        gt_boxes[:, 2],
        jnp.log(jnp.clip(gt_boxes[:, 3], 1e-3)),
        jnp.log(jnp.clip(gt_boxes[:, 4], 1e-3)),
        jnp.log(jnp.clip(gt_boxes[:, 5], 1e-3)),
        jnp.sin(gt_boxes[:, 6]), jnp.cos(gt_boxes[:, 6]),
    ], axis=1)                                       # [G, 8]
    safe_site = jnp.where(assign, center_site, bev.ids.shape[0] - 1)
    reg_tgt = reg_tgt.at[safe_site].set(
        jnp.where(assign[:, None], tgt_rows, 0.0))
    reg_mask = reg_mask.at[safe_site].set(assign)
    # ensure padding row never used
    reg_mask = reg_mask & valid_site
    return {"hm": hm_tgt, "reg": reg_tgt, "reg_mask": reg_mask}


def gaussian_focal_loss(pred_logits: jax.Array, target: jax.Array,
                        valid: jax.Array, alpha: float = 2.0,
                        beta: float = 4.0) -> jax.Array:
    """CenterNet focal loss over active sites (reference
    loss_utils.FocalLossSparse)."""
    p = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    p = jnp.clip(p, 1e-6, 1 - 1e-6)
    pos = (target > 0.999).astype(jnp.float32)
    neg_weight = jnp.power(1 - target, beta)
    pos_loss = -jnp.log(p) * jnp.power(1 - p, alpha) * pos
    neg_loss = -jnp.log(1 - p) * jnp.power(p, alpha) * neg_weight * (1 - pos)
    m = valid[:, None].astype(jnp.float32)
    num_pos = jnp.maximum(jnp.sum(pos * m), 1.0)
    return jnp.sum((pos_loss + neg_loss) * m) / num_pos


def reg_l1_loss(preds: Dict[str, SparseTensor], targets: Dict,
                code_weights=None) -> jax.Array:
    """L1 over assigned sites; channel order [center(2), z(1), dim(3),
    rot(2)] (reference RegLossSparse)."""
    pred_vec = jnp.concatenate([
        preds["center"].features, preds["center_z"].features,
        preds["dim"].features, preds["rot"].features], axis=1
    ).astype(jnp.float32)                            # [V, 8]
    diff = jnp.abs(pred_vec - targets["reg"])
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights)[None, :]
    m = targets["reg_mask"][:, None].astype(jnp.float32)
    return jnp.sum(diff * m) / jnp.maximum(jnp.sum(m), 1.0)


def voxelnext_loss(preds: Dict[str, SparseTensor], bev: SparseTensor,
                   gt_boxes, gt_labels, gt_mask,
                   det_cfg: VoxelNeXtConfig, vox_cfg: VoxelizeConfig,
                   stride: int, hm_weight: float = 1.0,
                   reg_weight: float = 2.0) -> Tuple[jax.Array, Dict]:
    targets = assign_targets(bev, gt_boxes, gt_labels, gt_mask, det_cfg,
                             vox_cfg, stride)
    hm_loss = gaussian_focal_loss(preds["hm"].features, targets["hm"],
                                  bev.valid)
    reg_loss = reg_l1_loss(preds, targets)
    total = hm_weight * hm_loss + reg_weight * reg_loss
    return total, {"hm_loss": hm_loss, "reg_loss": reg_loss,
                   "loss": total}


def dense_center_loss(preds: Dict[str, jax.Array], gt_boxes, gt_labels,
                      gt_mask, det_cfg: VoxelNeXtConfig,
                      vox_cfg: VoxelizeConfig, stride: int | None = None,
                      hm_weight: float = 1.0,
                      reg_weight: float = 2.0) -> Tuple[jax.Array, Dict]:
    """CenterHead loss on DENSE BEV maps (reference dense_heads/
    center_head.py assign_targets + centernet_utils.draw_gaussian_to_heatmap
    + loss path :227-264): reuses the sparse target assigner on an
    all-active pseudo-sparse tensor, so dense families (PointPillars,
    CenterPoint, PillarNet) train through the same machinery.

    preds: {"hm" [C, H, W], "center" [2, H, W], "center_z" [1, H, W],
    "dim" [3, H, W], "rot" [2, H, W]} (DenseCenterHead layout). `stride`
    defaults to grid_ny // H — the head's actual BEV downsampling, whatever
    the trunk did (PointPillars deconvs back to stride 1; sparse trunks sit
    at spatial_stride)."""
    hm = preds["hm"]
    c, h, w = hm.shape
    grid_ny = int(round((vox_cfg.point_range[4] - vox_cfg.point_range[1])
                        / vox_cfg.voxel_size[1]))
    if stride is None:
        stride = max(grid_ny // h, 1)
    bev = SparseTensor(ids=jnp.arange(h * w, dtype=jnp.int32),
                       features=jnp.zeros((h * w, 1), jnp.float32),
                       grid=(w, h, 1))
    targets = assign_targets(bev, gt_boxes, gt_labels, gt_mask, det_cfg,
                             vox_cfg, stride)

    def flat(m):
        return m.reshape(m.shape[0], -1).T           # [HW, ch]

    hm_loss = gaussian_focal_loss(flat(hm), targets["hm"], bev.valid)
    pred_vec = jnp.concatenate(
        [flat(preds["center"]), flat(preds["center_z"]),
         flat(preds["dim"]), flat(preds["rot"])], axis=1).astype(jnp.float32)
    diff = jnp.abs(pred_vec - targets["reg"])
    m = targets["reg_mask"][:, None].astype(jnp.float32)
    reg_loss = jnp.sum(diff * m) / jnp.maximum(jnp.sum(m), 1.0)
    total = hm_weight * hm_loss + reg_weight * reg_loss
    return total, {"hm_loss": hm_loss, "reg_loss": reg_loss, "loss": total}
