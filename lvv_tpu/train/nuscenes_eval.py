"""nuScenes-style detection evaluation (mAP / NDS), host-side.

Re-design of the evaluation the reference delegates to the official devkit
(`detection_cvpr_2019` config at pcdet nuscenes_dataset.py:256-310): center
-distance matching at thresholds {0.5, 1, 2, 4} m, per-class AP as the
normalized area under the precision-recall curve above (0.1 recall, 0.1
precision), plus the five TP error metrics (ATE/ASE/AOE/AVE/AAE) averaged
into NDS = (5*mAP + sum(1 - min(err, 1))) / 10.

Pure numpy so it runs in the eval harness without the devkit; accepts
plain arrays, not devkit tables.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

DIST_THRESHOLDS = (0.5, 1.0, 2.0, 4.0)
TP_METRICS = ("trans_err", "scale_err", "orient_err", "vel_err")


def _center_dist(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.linalg.norm(a[:, None, :2] - b[None, :, :2], axis=-1)


def _scale_iou(pred: np.ndarray, gt: np.ndarray) -> float:
    """Aligned 3D IoU of sizes only (devkit scale_iou)."""
    inter = np.prod(np.minimum(pred[3:6], gt[3:6]))
    union = np.prod(pred[3:6]) + np.prod(gt[3:6]) - inter
    return float(inter / max(union, 1e-7))


def _yaw_diff(a: float, b: float) -> float:
    d = (a - b) % (2 * np.pi)
    return float(min(d, 2 * np.pi - d))


def accumulate_class(preds: List[Dict], gts: List[Dict],
                     dist_th: float) -> Dict:
    """One (class, threshold) accumulation over all samples.

    preds/gts: per-sample dicts {boxes [N, >=7(+2 vel)], scores (preds)}.
    Returns raw match arrays for AP + TP metrics.
    """
    all_scores, all_tp, all_fp = [], [], []
    tp_errs = {m: [] for m in TP_METRICS}
    n_gt = 0
    for p, g in zip(preds, gts):
        pb = np.asarray(p["boxes"], np.float32).reshape(-1, p["boxes"].shape[-1]) \
            if len(p["boxes"]) else np.zeros((0, 9), np.float32)
        ps = np.asarray(p.get("scores", np.ones(len(pb))), np.float32)
        gb = np.asarray(g["boxes"], np.float32) if len(g["boxes"]) else \
            np.zeros((0, 9), np.float32)
        n_gt += len(gb)
        if len(pb) == 0:
            continue
        order = np.argsort(-ps)
        pb, ps = pb[order], ps[order]
        taken = np.zeros(len(gb), bool)
        dists = _center_dist(pb, gb) if len(gb) else \
            np.full((len(pb), 0), 1e9)
        for i in range(len(pb)):
            best, best_d = -1, dist_th
            for j in range(len(gb)):
                if not taken[j] and dists[i, j] < best_d:
                    best, best_d = j, dists[i, j]
            all_scores.append(ps[i])
            if best >= 0:
                taken[best] = True
                all_tp.append(1.0)
                all_fp.append(0.0)
                tp_errs["trans_err"].append(best_d)
                tp_errs["scale_err"].append(1 - _scale_iou(pb[i], gb[best]))
                tp_errs["orient_err"].append(_yaw_diff(pb[i][6], gb[best][6]))
                if pb.shape[1] >= 9 and gb.shape[1] >= 9:
                    tp_errs["vel_err"].append(float(np.linalg.norm(
                        pb[i][7:9] - gb[best][7:9])))
            else:
                all_tp.append(0.0)
                all_fp.append(1.0)
    return {"scores": np.asarray(all_scores), "tp": np.asarray(all_tp),
            "fp": np.asarray(all_fp), "n_gt": n_gt, "tp_errs": tp_errs}


def average_precision(acc: Dict, min_recall: float = 0.1,
                      min_precision: float = 0.1) -> float:
    """Devkit-style AP: area under interpolated PR above the min operating
    point, normalized."""
    if acc["n_gt"] == 0 or len(acc["scores"]) == 0:
        return 0.0
    order = np.argsort(-acc["scores"])
    tp = np.cumsum(acc["tp"][order])
    fp = np.cumsum(acc["fp"][order])
    recall = tp / acc["n_gt"]
    precision = tp / np.maximum(tp + fp, 1e-9)
    # devkit interpolation: np.interp over the RAW PR curve on a 101-point
    # recall grid (right=0 beyond max recall) — NOT a monotone max-envelope,
    # which slightly inflates AP relative to detection_cvpr_2019 calc_ap.
    grid = np.linspace(0, 1, 101)
    interp = np.interp(grid, recall, precision, right=0)
    # devkit calc_ap: mean clipped precision over recall > min_recall,
    # renormalized by (1 - min_precision)
    tail = interp[grid > min_recall]
    clipped = np.clip(tail - min_precision, 0, None)
    return float(min(np.mean(clipped) / (1.0 - min_precision), 1.0))


def evaluate(preds_by_class: Dict[str, List[Dict]],
             gts_by_class: Dict[str, List[Dict]],
             classes: Sequence[str]) -> Dict:
    """-> {per_class: {ap@th, tp errors}, mAP, NDS}."""
    per_class: Dict[str, Dict] = {}
    aps, tp_err_means = [], {m: [] for m in TP_METRICS}
    for cls in classes:
        preds = preds_by_class.get(cls, [])
        gts = gts_by_class.get(cls, [])
        cls_aps = {}
        acc_2m = None
        for th in DIST_THRESHOLDS:
            acc = accumulate_class(preds, gts, th)
            cls_aps[th] = average_precision(acc)
            if th == 2.0:
                acc_2m = acc
        ap_mean = float(np.mean(list(cls_aps.values())))
        errs = {}
        for m in TP_METRICS:
            vals = acc_2m["tp_errs"][m] if acc_2m else []
            errs[m] = float(np.mean(vals)) if vals else 1.0
            tp_err_means[m].append(errs[m])
        per_class[cls] = {"ap": ap_mean, "ap_by_threshold": cls_aps, **errs}
        aps.append(ap_mean)
    m_ap = float(np.mean(aps)) if aps else 0.0
    tp_scores = [1 - min(float(np.mean(v)), 1.0)
                 for v in tp_err_means.values() if v]
    nds = (5 * m_ap + sum(tp_scores)) / (5 + len(tp_scores)) \
        if tp_scores else m_ap
    return {"per_class": per_class, "mAP": m_ap, "NDS": float(nds)}
