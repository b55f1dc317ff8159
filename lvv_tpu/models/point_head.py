"""Point heads: per-point foreground segmentation + box regression.

Re-design of the reference's point heads (pcdet/models/dense_heads/
point_head_simple.py PointHeadSimple — per-point fg/bg used by PV-RCNN's
keypoint weighting; point_head_box.py PointHeadBox — PointRCNN's per-point
proposal regression; point_intra_part_offset_head.py's part labels are a
config variant of the same trunk):

- targets: points inside a gt box are foreground; box targets encode the
  owning box relative to the point (PointResidualCoder semantics);
- losses: focal cls + smooth-L1 reg on fg points.
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.pool import assign_points_to_boxes
from .anchor_head import smooth_l1


class PointHead(nn.Module):
    """Shared MLP trunk + cls / optional box branches."""
    num_classes: int = 1
    box_code: int = 8         # x,y,z offsets + log dims + sin/cos
    predict_boxes: bool = False
    fc_channels: Sequence[int] = (128, 128)

    @nn.compact
    def __call__(self, point_feats: jax.Array) -> Dict[str, jax.Array]:
        x = point_feats
        for i, ch in enumerate(self.fc_channels):
            x = nn.Dense(ch, name=f"fc{i}")(x)
            x = nn.LayerNorm(name=f"ln{i}")(x)
            x = nn.relu(x)
        out = {"cls": nn.Dense(self.num_classes,
                               bias_init=nn.initializers.constant(-4.6),
                               name="cls")(x)}
        if self.predict_boxes:
            out["box"] = nn.Dense(self.box_code, name="box")(x)
        return out


def point_targets(points: jax.Array, gt_boxes: jax.Array,
                  gt_labels: jax.Array, gt_mask: jax.Array,
                  valid_points: jax.Array | None = None) -> Dict:
    """-> {cls [N] int32 (-1 bg, else class), box [N, 8], fg [N]}.

    Box targets: offsets to the owning box center, log dims, sin/cos yaw
    (PointResidualCoder shape)."""
    boxes = gt_boxes[:, :7]
    owner = assign_points_to_boxes(points[:, :3], boxes, valid_points)
    # mask out invalid gts
    owner_ok = (owner >= 0) & gt_mask[jnp.maximum(owner, 0)]
    safe = jnp.maximum(owner, 0)
    ob = boxes[safe]
    tgt = jnp.concatenate([
        ob[:, :3] - points[:, :3],
        jnp.log(jnp.clip(ob[:, 3:6], 1e-3)),
        jnp.sin(ob[:, 6:7]), jnp.cos(ob[:, 6:7]),
    ], axis=1)
    cls = jnp.where(owner_ok, gt_labels[safe], -1).astype(jnp.int32)
    return {"cls": cls, "box": tgt, "fg": owner_ok}


def point_head_loss(preds: Dict, targets: Dict, num_classes: int,
                    reg_weight: float = 1.0,
                    valid_points: jax.Array | None = None):
    logits = preds["cls"].astype(jnp.float32)
    fg = targets["fg"]
    valid = jnp.ones(fg.shape, bool) if valid_points is None else valid_points
    onehot = jax.nn.one_hot(jnp.clip(targets["cls"], 0, num_classes - 1),
                            num_classes) * fg[:, None]
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * onehot + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * onehot + (1 - p) * (1 - onehot)
    focal = 0.25 * ((1 - p_t) ** 2) * ce
    n_fg = jnp.maximum(jnp.sum(fg & valid), 1)
    cls_loss = jnp.sum(focal * valid[:, None]) / n_fg
    total = cls_loss
    aux = {"point_cls_loss": cls_loss}
    if "box" in preds:
        diff = preds["box"].astype(jnp.float32) - targets["box"]
        reg = jnp.sum(jnp.sum(smooth_l1(diff), axis=1)
                      * (fg & valid)) / n_fg
        aux["point_reg_loss"] = reg
        total = total + reg_weight * reg
    return total, aux
