"""Waymo detection evaluation (native AP / APH port).

Re-design of the reference's Waymo evaluation hook
(pcdet/datasets/waymo/waymo_eval.py — a wrapper over the waymo-open-
dataset TensorFlow metric op). The TF op is unavailable here, so this
implements the metric DEFINITION natively, two ways:

`evaluate` — fast greedy path:
- per-class 3D-IoU matching thresholds: Vehicle 0.7, Pedestrian 0.5,
  Cyclist 0.5, Sign 0.5 (the official detection_metrics config);
- two difficulty buckets: LEVEL_1 = boxes with >5 lidar points (or
  annotated difficulty 1), LEVEL_2 = everything (L2 includes L1);
- AP: area under the 101-point max-interpolated PR curve over the
  CONTINUOUS (every-prediction-a-cutoff) curve, greedy score-ordered
  matching;
- APH: same accumulation with every true positive weighted by heading
  accuracy 1 - min(|dtheta|, 2pi - |dtheta|) / pi (the official
  heading-error weighting).

`evaluate_official` — faithful re-implementation of the official metric
AS THE REFERENCE CONFIGURES IT (waymo_eval.py:92-112 build_config):
- 101 fixed score cutoffs 0.00, 0.01, ..., 0.99, 1.0
  (`config.score_cutoffs`);
- TYPE_HUNGARIAN matching per frame at each cutoff (exact Hungarian over
  the IoU matrix, pairs below the class threshold forbidden), via
  scipy.optimize.linear_sum_assignment;
- one PR point per cutoff, AP/APH by 101-point max-interpolation over
  those sampled points.
The measured greedy-vs-official delta on randomized scenes is recorded in
benchmarks/waymo_eval_delta.json and quantified in PARITY.md; the golden
hand-derived fixtures live in tests/test_waymo_golden.py.

Host-side numpy. The rotated 3D IoU comes from ops.boxes (exact
Sutherland-Hodgman BEV polygon clip x z overlap). Boxes are pcdet layout
[x, y, z, dx, dy, dz, heading].
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
                # zero-point gts are dropped outright (reference
                # waymo_eval.py:46-48 nonzero_mask)
                keep = (g_names == cls) & (npts > 0)
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


# --------------------------------------------------------- official mode

# the reference's exact cutoff schedule (waymo_eval.py:108-110):
# 0.00, 0.01, ..., 0.99, then 1.0
OFFICIAL_SCORE_CUTOFFS = np.concatenate(
    [np.arange(100) * 0.01, [1.0]]).astype(np.float64)


def hungarian_match(iou: np.ndarray, thr: float) -> List[Tuple[int, int]]:
    """Exact Hungarian assignment over an IoU matrix [G, P], maximizing
    total matched IoU with pairs below `thr` forbidden (the official
    TYPE_HUNGARIAN matcher; reference config waymo_eval.py:99).
    Returns the list of matched (gt, pred) index pairs."""
    if iou.size == 0:
        return []
    from scipy.optimize import linear_sum_assignment
    cost = np.where(iou >= thr, -iou, 1.0)   # forbidden pairs cost > 0
    rows, cols = linear_sum_assignment(cost)
    return [(int(r), int(c)) for r, c in zip(rows, cols)
            if iou[r, c] >= thr]


def _frame_pr_terms(gb, counted, pb, ps, thr,
                    cutoffs) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-frame (tp, tph, fp) at each score cutoff; Hungarian matching is
    recomputed for every DISTINCT surviving-prediction set (the official
    op matches per cutoff; sets only change at the frame's own scores)."""
    n_cut = len(cutoffs)
    tp = np.zeros(n_cut)
    tph = np.zeros(n_cut)
    fp = np.zeros(n_cut)
    # cutoff -> surviving pred set is monotone; group cutoffs by the set.
    # A prediction survives cutoff c when score >= c.
    order = np.argsort(-ps)
    ps_sorted = ps[order]
    ks = np.searchsorted(-ps_sorted, -cutoffs, side="right")
    iou_full = iou3d(gb, pb[order])   # one IoU eval per frame; slice per k
    cache = {}
    for ci, k in enumerate(ks):
        k = int(k)
        if k not in cache:
            sel = order[:k]
            pairs = hungarian_match(iou_full[:, :k], thr)
            t = h = ig = 0
            for gi, pj in pairs:
                if counted[gi]:
                    t += 1
                    h += heading_accuracy(gb[gi, 6], pb[sel[pj], 6])
                else:
                    ig += 1
            cache[k] = (t, h, k - t - ig)
        tp[ci], tph[ci], fp[ci] = cache[k]
    return tp, tph, fp


def _ap_from_points(recall, prec, prec_h) -> Tuple[float, float]:
    """AP/APH by 101-point max-interpolation over sampled PR points."""
    grid = np.linspace(0, 1, 101)
    ap = aph = 0.0
    for r in grid:
        m = recall >= r
        ap += prec[m].max() if m.any() else 0.0
        aph += prec_h[m].max() if m.any() else 0.0
    return float(ap / 101), float(aph / 101)


def evaluate_official(gt_annos: Sequence[Dict], pred_annos: Sequence[Dict],
                      classes: Sequence[str] = CLASSES,
                      cutoffs: np.ndarray = OFFICIAL_SCORE_CUTOFFS
                      ) -> Dict[str, float]:
    """Official-semantics evaluation: Hungarian matching per frame at each
    of the reference's 101 fixed score cutoffs (waymo_eval.py:92-112),
    PR point per cutoff, 101-point max-interpolated AP/APH. Same anno
    format and output keys as `evaluate`. Zero-point gts are dropped
    (reference waymo_eval.py:46-48 nonzero_mask)."""
    cutoffs = np.asarray(cutoffs, np.float64)
    out: Dict[str, float] = {}
    for level in (1, 2):
        aps, aphs = [], []
        for cls in classes:
            thr = IOU_THRESHOLD.get(cls, 0.5)
            tp = np.zeros(len(cutoffs))
            tph = np.zeros(len(cutoffs))
            fp = np.zeros(len(cutoffs))
            n_gt = 0
            for g, p in zip(gt_annos, pred_annos):
                g_names = np.asarray(g["name"])
                raw = np.asarray(g["gt_boxes_lidar"], np.float32)
                gb = raw.reshape(-1, raw.shape[-1] if raw.size else 7)
                npts = np.asarray(g.get("num_points_in_gt",
                                        np.full(len(g_names), 99)))
                keep = (g_names == cls) & (npts > 0)
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
                if len(pb) == 0 and len(gb) == 0:
                    continue
                t, h, f = _frame_pr_terms(gb, counted, pb, ps, thr,
                                          cutoffs)
                tp += t
                tph += h
                fp += f
            denom = np.maximum(tp + fp, 1e-9)
            recall = tp / max(n_gt, 1e-9)
            prec = tp / denom
            prec_h = tph / denom
            ap, aph = (_ap_from_points(recall, prec, prec_h)
                       if n_gt else (0.0, 0.0))
            out[f"{cls}/L{level} AP"] = ap
            out[f"{cls}/L{level} APH"] = aph
            aps.append(ap)
            aphs.append(aph)
        out[f"mAP/L{level}"] = float(np.mean(aps)) if aps else 0.0
        out[f"mAPH/L{level}"] = float(np.mean(aphs)) if aphs else 0.0
    return out


