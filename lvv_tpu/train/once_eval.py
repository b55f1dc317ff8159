"""ONCE detection evaluation (native port).

Re-design of the reference's ONCE benchmark scorer
(pcdet/datasets/once/once_eval/evaluation.py:26-419 + eval_utils.py),
keeping its exact semantics:

- per-class IoU thresholds (Vehicle/Car/Bus/Truck 0.7, Pedestrian 0.3,
  Cyclist 0.5), optional Car+Bus+Truck -> Vehicle superclass merge;
- 3D IoU with heading gating (pairs misaligned by more than 90 deg are
  unmatchable, iou3d_kernel_with_heading:346-381);
- KITTI-style 50-point recall-threshold sweep (get_thresholds:153-174),
  greedy highest-score-first matching with ignore flags
  (accumulate_scores / compute_statistics:177-256);
- difficulty modes overall / 0-30m / 30-50m / 50m-inf (distance filters,
  eval_utils.py:20-53); AP = mean of the right-maximized precision curve.

numba-free: the greedy matchers are plain numpy loops (host-side eval),
the rotated-BEV intersection reuses ops.boxes.pairwise_overlap_bev.

Box layout: [x, y, z, w, l, h, rot] per the ONCE devkit (only columns
0/1/3/4/6 feed the rotated-rectangle overlap, so the w/l order convention
passes through unchanged).
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

IOU_THRESHOLD = {"Car": 0.7, "Bus": 0.7, "Truck": 0.7,
                 "Pedestrian": 0.3, "Cyclist": 0.5, "Vehicle": 0.7}
DIFFICULTY_TYPES = ("overall", "0-30m", "30-50m", "50m-inf")


def iou3d_with_heading(gt: np.ndarray, pred: np.ndarray,
                       with_heading: bool = True) -> np.ndarray:
    """[N, 7] x [M, 7] -> [N, M] 3D IoU, zeroed for >90deg heading gaps."""
    if len(gt) == 0 or len(pred) == 0:
        return np.zeros((len(gt), len(pred)), np.float32)
    import jax.numpy as jnp
    from ..ops.boxes import pairwise_overlap_bev
    inter2d = np.asarray(pairwise_overlap_bev(jnp.asarray(gt, jnp.float32),
                                              jnp.asarray(pred,
                                                          jnp.float32)))
    gt_hi = gt[:, [2]] + gt[:, [5]] * 0.5
    gt_lo = gt[:, [2]] - gt[:, [5]] * 0.5
    pr_hi = pred[:, [2]] + pred[:, [5]] * 0.5
    pr_lo = pred[:, [2]] - pred[:, [5]] * 0.5
    inter_h = np.clip(np.minimum(gt_hi, pr_hi.T)
                      - np.maximum(gt_lo, pr_lo.T), 0, None)
    inter = inter2d * inter_h
    vol_g = np.prod(gt[:, 3:6], axis=1, keepdims=True)
    vol_p = np.prod(pred[:, 3:6], axis=1, keepdims=True)
    iou = inter / np.maximum(vol_g + vol_p.T - inter, 1e-9)
    if with_heading:
        d = np.abs(gt[:, [6]] - pred[:, [6]].T)
        d = np.where(d >= np.pi, 2 * np.pi - d, d)
        iou = np.where(d > np.pi / 2, 0.0, iou)
    return iou.astype(np.float32)


def get_thresholds(scores: np.ndarray, num_gt: int,
                   num_pr_points: int = 50) -> List[float]:
    """Score thresholds at evenly spaced recall points (reference
    get_thresholds:153-174, including its epsilon duplicate handling)."""
    eps = 1e-6
    scores = np.sort(scores)[::-1]
    recall_level = 0.0
    thresholds: List[float] = []
    for i, score in enumerate(scores):
        l_recall = (i + 1) / num_gt
        r_recall = (i + 2) / num_gt if i < len(scores) - 1 else l_recall
        if (r_recall + l_recall < 2 * recall_level) and i < len(scores) - 1:
            continue
        thresholds.append(float(score))
        recall_level += 1 / num_pr_points
        while r_recall + l_recall + eps > 2 * recall_level:
            thresholds.append(float(score))
            recall_level += 1 / num_pr_points
    return thresholds


def accumulate_scores(iou, pred_scores, gt_flag, pred_flag, iou_threshold):
    """TP scores for threshold selection (reference :177-208)."""
    num_gt, num_pred = iou.shape
    assigned = np.zeros(num_pred, bool)
    out = []
    for i in range(num_gt):
        if gt_flag[i] == -1:
            continue
        det_idx, det_score = -1, -1.0
        for j in range(num_pred):
            if pred_flag[j] == -1 or assigned[j]:
                continue
            if iou[i, j] > iou_threshold and pred_scores[j] > det_score:
                det_idx, det_score = j, float(pred_scores[j])
        if det_score == -1.0:
            continue
        if gt_flag[i] == 1 or pred_flag[det_idx] == 1:
            assigned[det_idx] = True
        else:
            out.append(det_score)
            assigned[det_idx] = True
    return np.asarray(out, np.float32)


def compute_statistics(iou, pred_scores, gt_flag, pred_flag,
                       score_threshold, iou_threshold):
    """(tp, fp, fn) at one score threshold (reference :211-256)."""
    num_gt, num_pred = iou.shape
    assigned = np.zeros(num_pred, bool)
    under = pred_scores < score_threshold
    tp = fp = fn = 0
    for i in range(num_gt):
        if gt_flag[i] == -1:
            continue
        det_idx, detected = -1, False
        best_iou, to_ignore = 0.0, False
        for j in range(num_pred):
            if pred_flag[j] == -1 or assigned[j] or under[j]:
                continue
            iou_ij = iou[i, j]
            if iou_ij > iou_threshold and \
                    (iou_ij > best_iou or to_ignore) and pred_flag[j] == 0:
                best_iou, det_idx, detected, to_ignore = iou_ij, j, True, \
                    False
            elif iou_ij > iou_threshold and not detected and \
                    pred_flag[j] == 1:
                det_idx, detected, to_ignore = j, True, True
        if not detected and gt_flag[i] == 0:
            fn += 1
        elif detected and (gt_flag[i] == 1 or pred_flag[det_idx] == 1):
            assigned[det_idx] = True
        elif detected:
            tp += 1
            assigned[det_idx] = True
    for j in range(num_pred):
        if not (assigned[j] or pred_flag[j] != 0 or under[j]):
            fp += 1
    return tp, fp, fn


def _distance_ignore(boxes: np.ndarray, level: int) -> np.ndarray:
    """overall_distance_filter (eval_utils.py:38-53): level 0 keeps all,
    1/2/3 keep 0-30 / 30-50 / 50+ m."""
    dist = np.linalg.norm(boxes[:, :3], axis=1)
    if level == 0:
        keep = np.ones(len(boxes), bool)
    elif level == 1:
        keep = dist < 30
    elif level == 2:
        keep = (dist >= 30) & (dist < 50)
    else:
        keep = dist >= 50
    return ~keep


def filter_data(gt_anno, pred_anno, level, class_name, use_superclass):
    """-1 wrong class / 1 ignored (difficulty) / 0 counted (ref :258-314)."""
    def flags(anno):
        names = np.asarray(anno["name"])
        f = np.zeros(len(names), np.int64)
        if use_superclass and class_name == "Vehicle":
            reject = (names == "Pedestrian") | (names == "Cyclist")
        else:
            reject = names != class_name
        f[reject] = -1
        boxes = np.asarray(anno["boxes_3d"], np.float32).reshape(-1, 7)
        # reference order: the difficulty ignore OVERWRITES class rejection
        # (filter_data:300-311 assigns flag 1 after the -1 pass)
        f[_distance_ignore(boxes, level)] = 1
        return f
    return flags(gt_anno), flags(pred_anno)


def get_evaluation_results(gt_annos: Sequence[Dict],
                           pred_annos: Sequence[Dict],
                           classes: Sequence[str],
                           use_superclass: bool = True,
                           iou_thresholds: Dict[str, float] | None = None,
                           num_pr_points: int = 50,
                           ap_with_heading: bool = True
                           ) -> Tuple[str, Dict[str, float]]:
    """annos: per sample {name [G], boxes_3d [G, 7], score [G] (preds)}.
    -> (printable table, {AP_<cls>/<difficulty>, AP_mean/<difficulty>})."""
    assert len(gt_annos) == len(pred_annos)
    iou_thresholds = iou_thresholds or IOU_THRESHOLD
    classes = list(classes)
    if use_superclass:
        classes = [c for c in classes if c not in ("Car", "Bus", "Truck")]
        classes.insert(0, "Vehicle")
    ious = [iou3d_with_heading(
        np.asarray(g["boxes_3d"], np.float32).reshape(-1, 7),
        np.asarray(p["boxes_3d"], np.float32).reshape(-1, 7),
        ap_with_heading) for g, p in zip(gt_annos, pred_annos)]

    n_diff = len(DIFFICULTY_TYPES)
    precision = np.zeros((len(classes), n_diff, num_pr_points + 1))
    for ci, cls in enumerate(classes):
        thr = iou_thresholds.get(cls, 0.5)
        for di in range(n_diff):
            flags = [filter_data(g, p, di, cls, use_superclass)
                     for g, p in zip(gt_annos, pred_annos)]
            num_valid_gt = sum(int((gf == 0).sum()) for gf, _ in flags)
            if num_valid_gt == 0:
                continue
            scores = np.concatenate([
                accumulate_scores(iou, np.asarray(p["score"], np.float32),
                                  gf, pf, thr)
                for iou, p, (gf, pf) in zip(ious, pred_annos, flags)])
            thresholds = get_thresholds(scores, num_valid_gt, num_pr_points)
            cm = np.zeros((len(thresholds), 3))
            for iou, p, (gf, pf) in zip(ious, pred_annos, flags):
                ps = np.asarray(p["score"], np.float32)
                for ti, s_th in enumerate(thresholds):
                    tp, fp, fn = compute_statistics(iou, ps, gf, pf, s_th,
                                                    thr)
                    cm[ti] += (tp, fp, fn)
            for ti in range(len(thresholds)):
                precision[ci, di, ti] = cm[ti, 0] / max(
                    cm[ti, 0] + cm[ti, 1], 1e-9)
            # right-maximization (reference :113-118)
            for ti in range(len(thresholds)):
                precision[ci, di, ti] = precision[ci, di, ti:].max()
    ap = precision[..., 1:].sum(-1) / num_pr_points * 100

    ret: Dict[str, float] = {}
    lines = [f"|AP@{num_pr_points:<9}|" + "".join(
        f"{d:<12}|" for d in DIFFICULTY_TYPES)]
    for ci, cls in enumerate(classes):
        row = f"|{cls:<12}|"
        for di, d in enumerate(DIFFICULTY_TYPES):
            ret[f"AP_{cls}/{d}"] = float(ap[ci, di])
            row += f"{ap[ci, di]:<12.2f}|"
        lines.append(row)
    for di, d in enumerate(DIFFICULTY_TYPES):
        ret[f"AP_mean/{d}"] = float(ap[:, di].mean())
    lines.append("|{:<12}|".format("mAP") + "".join(
        f"{ap[:, di].mean():<12.2f}|" for di in range(n_diff)))
    return "\n".join(lines), ret
