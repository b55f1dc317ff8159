"""Waymo detection evaluation (native AP / APH port).

Re-design of the reference's Waymo evaluation hook
(pcdet/datasets/waymo/waymo_eval.py — a wrapper over the waymo-open-
dataset TensorFlow metric op). The TF op is unavailable here, so this
implements the metric DEFINITION natively:

- per-class 3D-IoU matching thresholds: Vehicle 0.7, Pedestrian 0.5,
  Cyclist 0.5, Sign 0.5 (the official detection_metrics config);
- two difficulty buckets: LEVEL_1 = boxes with >5 lidar points (or
  annotated difficulty 1), LEVEL_2 = everything (L2 includes L1);
- AP: area under the 101-point max-interpolated PR curve;
- APH: same accumulation with every true positive weighted by heading
  accuracy 1 - min(|dtheta|, 2pi - |dtheta|) / pi (the official
  heading-error weighting).

Greedy score-ordered matching, host-side numpy. The rotated 3D IoU comes
from ops.boxes (exact Sutherland-Hodgman BEV polygon clip x z overlap).
Boxes are pcdet layout [x, y, z, dx, dy, dz, heading].
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

IOU_THRESHOLD = {"Vehicle": 0.7, "Pedestrian": 0.5, "Cyclist": 0.5,
                 "Sign": 0.5}
CLASSES = ("Vehicle", "Pedestrian", "Cyclist")


def iou3d(gt: np.ndarray, pred: np.ndarray) -> np.ndarray:
    if len(gt) == 0 or len(pred) == 0:
        return np.zeros((len(gt), len(pred)), np.float32)
    import jax.numpy as jnp
    from ..ops.boxes import iou_3d as _iou3d
    return np.asarray(_iou3d(jnp.asarray(gt, jnp.float32),
                             jnp.asarray(pred, jnp.float32)))


def heading_accuracy(gt_yaw: float, pred_yaw: float) -> float:
    d = abs(gt_yaw - pred_yaw) % (2 * np.pi)
    d = min(d, 2 * np.pi - d)
    return max(0.0, 1.0 - d / np.pi)


def match_sample(gt_boxes, pred_boxes, pred_scores, iou_thresh,
                 gt_counted=None):
    """Greedy score-ordered matching. `gt_counted` marks gts that count at
    this difficulty level; predictions matched to a NOT-counted gt are
    ignored (neither TP nor FP — the official eval does not penalize
    detections of harder-level boxes). Returns (tp, heading_acc, ignored)
    per prediction."""
    order = np.argsort(-pred_scores)
    taken = np.zeros(len(gt_boxes), bool)
    iou = iou3d(gt_boxes, pred_boxes)
    tp = np.zeros(len(pred_boxes), bool)
    ignored = np.zeros(len(pred_boxes), bool)
    hacc = np.zeros(len(pred_boxes), np.float32)
    if gt_counted is None:
        gt_counted = np.ones(len(gt_boxes), bool)
    for j in order:
        if len(gt_boxes) == 0:
            break
        cand = np.where(~taken & (iou[:, j] >= iou_thresh))[0]
        if len(cand) == 0:
            continue
        best = cand[np.argmax(iou[cand, j])]
        taken[best] = True
        if gt_counted[best]:
            tp[j] = True
            hacc[j] = heading_accuracy(gt_boxes[best, 6], pred_boxes[j, 6])
        else:
            ignored[j] = True
    return tp, hacc, ignored


def _ap_from_pr(scores, tp_weights, tp_flags, n_gt) -> Tuple[float, float]:
    """-> (AP, APH) via 101-point max-interpolated PR."""
    if n_gt == 0 or len(scores) == 0:
        return 0.0, 0.0
    order = np.argsort(-scores)
    tp = np.cumsum(tp_flags[order].astype(np.float64))
    tph = np.cumsum(tp_weights[order].astype(np.float64))
    fp = np.cumsum((~tp_flags[order]).astype(np.float64))
    recall = tp / n_gt
    prec = tp / np.maximum(tp + fp, 1e-9)
    prec_h = tph / np.maximum(tp + fp, 1e-9)
    grid = np.linspace(0, 1, 101)
    ap = aph = 0.0
    for r in grid:
        m = recall >= r
        ap += prec[m].max() if m.any() else 0.0
        aph += prec_h[m].max() if m.any() else 0.0
    return float(ap / 101), float(aph / 101)


# official breakdown shards by box-center range (metrics/config:
# RANGE breakdown generator — [0, 30), [30, 50), [50, +inf))
RANGE_BUCKETS = ((0.0, 30.0), (30.0, 50.0), (50.0, float("inf")))


def evaluate(gt_annos: Sequence[Dict], pred_annos: Sequence[Dict],
             classes: Sequence[str] = CLASSES,
             range_breakdowns: bool = False) -> Dict[str, float]:
    """annos per sample: gt {name [G], gt_boxes_lidar [G, 7],
    num_points_in_gt [G]}; pred {name [P], boxes_lidar [P, 7], score [P]}.
    -> {<cls>/L1 AP, <cls>/L1 APH, <cls>/L2 ..., mAP/L*, mAPH/L*};
    with range_breakdowns also `<cls>/L<l> AP [lo, hi)` per RANGE_BUCKETS
    (both gts and dets sharded by box-center range, like the official
    RANGE breakdown generator)."""
    out: Dict[str, float] = {}
    if range_breakdowns:
        for lo, hi in RANGE_BUCKETS:
            def shard(annos, box_key):
                shd = []
                for a in annos:
                    b = np.asarray(a[box_key], np.float32)
                    b = b.reshape(-1, b.shape[-1] if b.size else 7)
                    r = np.hypot(b[:, 0], b[:, 1]) if len(b) else                         np.zeros(0)
                    keep = (r >= lo) & (r < hi)
                    c = {k: (np.asarray(v)[keep] if k in
                             ("name", box_key, "score",
                              "num_points_in_gt") and
                             np.asarray(v).shape[:1] == keep.shape
                             else v) for k, v in a.items()}
                    shd.append(c)
                return shd
            sub = evaluate(shard(gt_annos, "gt_boxes_lidar"),
                           shard(pred_annos, "boxes_lidar"), classes)
            tag = f"[{lo:g}, {hi:g})"
            out.update({f"{k} {tag}": v for k, v in sub.items()})
    for level in (1, 2):
        aps, aphs = [], []
        for cls in classes:
            thr = IOU_THRESHOLD.get(cls, 0.5)
            scores, tps, haccs = [], [], []
            n_gt = 0
            for g, p in zip(gt_annos, pred_annos):
                g_names = np.asarray(g["name"])
                raw = np.asarray(g["gt_boxes_lidar"], np.float32)
                gb = raw.reshape(-1, raw.shape[-1] if raw.size else 7)
                npts = np.asarray(g.get("num_points_in_gt",
                                        np.full(len(g_names), 99)))
                keep = g_names == cls
                gb = gb[keep][:, :7]
                counted = np.ones(len(gb), bool)
                if level == 1:
                    counted = npts[keep] > 5
                n_gt += int(counted.sum())
                p_names = np.asarray(p["name"])
                pk = p_names == cls
                raw_p = np.asarray(p["boxes_lidar"], np.float32)
                pb = raw_p.reshape(len(p_names), -1)[pk][:, :7] \
                    if raw_p.size else np.zeros((0, 7), np.float32)
                ps = np.asarray(p["score"], np.float32)[pk]
                tp, hacc, ign = match_sample(gb, pb, ps, thr, counted)
                scores.append(ps[~ign])
                tps.append(tp[~ign])
                haccs.append(hacc[~ign])
            ap, aph = _ap_from_pr(np.concatenate(scores) if scores else
                                  np.zeros(0),
                                  np.concatenate(haccs) if haccs else
                                  np.zeros(0),
                                  np.concatenate(tps) if tps else
                                  np.zeros(0, bool), n_gt)
            out[f"{cls}/L{level} AP"] = ap
            out[f"{cls}/L{level} APH"] = aph
            aps.append(ap)
            aphs.append(aph)
        out[f"mAP/L{level}"] = float(np.mean(aps)) if aps else 0.0
        out[f"mAPH/L{level}"] = float(np.mean(aphs)) if aphs else 0.0
    return out


