"""Argoverse 2 detection evaluation, host-side numpy.

The reference delegates to the av2 devkit
(pcdet/datasets/argo2/argo2_dataset.py:416-476: av2.evaluation.detection
``DetectionCfg`` + ``evaluate``). This module implements the av2 sensor
detection protocol natively:

- matching by 3D center distance at affinity thresholds
  (0.5, 1.0, 2.0, 4.0) m, greedy over descending score, one gt per det;
- AP per threshold from the interpolated precision/recall curve
  (monotone precision envelope sampled on a 100-point recall grid, the
  av2 ``compute_average_precision`` scheme); class AP = mean over the
  four thresholds;
- true-positive errors at the 2.0 m threshold: ATE (3D center distance,
  m), ASE (1 - aligned-scale 3D IoU), AOE (minimal yaw difference,
  rad in [0, pi]);
- CDS (composite detection score) = AP * mean over the three normalized
  TP complements (1 - ATE/2.0 m, 1 - ASE, 1 - AOE/pi) — av2's ranking
  metric.

Inputs mirror the loaders' record format: per-sample dicts with
{name [G], gt_boxes_lidar/boxes [G, 7]} for gts and
{name [P], boxes_lidar/boxes [P, 7], score [P]} for detections.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

AFFINITY_THRESHOLDS_M = (0.5, 1.0, 2.0, 4.0)
TP_THRESHOLD_M = 2.0
NORM_ATE, NORM_ASE, NORM_AOE = 2.0, 1.0, float(np.pi)


def _scale_iou(pred: np.ndarray, gt: np.ndarray) -> float:
    """Aligned-box 3D IoU from dims only (av2 / nuScenes scale metric)."""
    inter = np.prod(np.minimum(pred[3:6], gt[3:6]))
    union = np.prod(pred[3:6]) + np.prod(gt[3:6]) - inter
    return float(inter / max(union, 1e-9))


def _yaw_err(a: float, b: float) -> float:
    """Minimal absolute yaw difference folded into [0, pi]."""
    return float(abs((a - b + np.pi) % (2.0 * np.pi) - np.pi))


def _interp_ap(scores: np.ndarray, tp: np.ndarray, n_gt: int,
               n_samples: int = 100) -> float:
    """av2 compute_average_precision: monotone precision envelope
    interpolated on a uniform recall grid."""
    if n_gt == 0 or len(scores) == 0:
        return 0.0
    order = np.argsort(-scores)
    tp_c = np.cumsum(tp[order])
    fp_c = np.cumsum(~tp[order])
    recall = tp_c / n_gt
    precision = tp_c / np.maximum(tp_c + fp_c, 1e-9)
    precision = np.maximum.accumulate(precision[::-1])[::-1]
    grid = np.linspace(0.0, 1.0, n_samples + 1)[1:]
    return float(np.interp(grid, recall, precision, right=0.0).mean())


def _class_arrays(annos: Dict, cls: str, box_keys) -> np.ndarray:
    names = np.asarray(annos["name"])
    for k in box_keys:
        if k in annos:
            b = np.asarray(annos[k], np.float64)
            b = b.reshape(len(names), -1) if b.size else \
                np.zeros((len(names), 7))
            return names == cls, b[:, :7]
    return names == cls, np.zeros((len(names), 7))


def _match(gt_boxes: np.ndarray, pred_boxes: np.ndarray,
           scores: np.ndarray, thresh: float):
    """Greedy score-ordered 3D-center-distance matching.

    -> (order, tp flags in score order, matched gt index or -1)."""
    order = np.argsort(-scores)
    tp = np.zeros(len(pred_boxes), bool)
    match_idx = np.full(len(pred_boxes), -1, np.int64)
    if len(gt_boxes) and len(pred_boxes):
        dist = np.linalg.norm(
            pred_boxes[order][:, None, :3] - gt_boxes[None, :, :3],
            axis=-1)
        taken = np.zeros(len(gt_boxes), bool)
        for i in range(len(pred_boxes)):
            cand = np.nonzero(~taken & (dist[i] < thresh))[0]
            if len(cand):
                j = cand[np.argmin(dist[i, cand])]
                taken[j] = True
                tp[i] = True
                match_idx[i] = j
    return order, tp, match_idx


def evaluate(gt_annos: Sequence[Dict], pred_annos: Sequence[Dict],
             classes: Sequence[str]) -> Dict[str, float]:
    """-> `<cls>_AP / _ATE / _ASE / _AOE / _CDS` per class plus
    mAP / mATE / mASE / mAOE / mCDS over classes that have gts."""
    out: Dict[str, float] = {}
    agg: Dict[str, List[float]] = {k: [] for k in
                                   ("AP", "ATE", "ASE", "AOE", "CDS")}
    for cls in classes:
        per_thresh_ap: List[float] = []
        ate: List[float] = []
        ase: List[float] = []
        aoe: List[float] = []
        total_gt = 0
        for thresh in AFFINITY_THRESHOLDS_M:
            scores_l, tp_l = [], []
            n_gt = 0
            for g, p in zip(gt_annos, pred_annos):
                gk, gb = _class_arrays(g, cls, ("gt_boxes_lidar", "boxes"))
                gb = gb[gk]
                n_gt += int(gk.sum())
                pk, pb = _class_arrays(p, cls, ("boxes_lidar", "boxes"))
                pb = pb[pk]
                ps = np.asarray(p["score"], np.float64)[pk]
                order, tp, midx = _match(gb, pb, ps, thresh)
                scores_l.append(ps[order])
                tp_l.append(tp)
                if thresh == TP_THRESHOLD_M:
                    for i in np.nonzero(tp)[0]:
                        pbox, gbox = pb[order][i], gb[midx[i]]
                        ate.append(float(np.linalg.norm(
                            pbox[:3] - gbox[:3])))
                        ase.append(1.0 - _scale_iou(pbox, gbox))
                        aoe.append(_yaw_err(pbox[6], gbox[6]))
            total_gt = n_gt
            per_thresh_ap.append(_interp_ap(
                np.concatenate(scores_l) if scores_l else np.zeros(0),
                np.concatenate(tp_l) if tp_l else np.zeros(0, bool),
                n_gt))
        if total_gt == 0:
            continue
        ap = float(np.mean(per_thresh_ap))
        # no true positives at 2 m -> worst-case errors (av2 assigns the
        # metric's maximum when a class has no TPs)
        m_ate = float(np.mean(ate)) if ate else NORM_ATE
        m_ase = float(np.mean(ase)) if ase else NORM_ASE
        m_aoe = float(np.mean(aoe)) if aoe else NORM_AOE
        cds = ap * float(np.mean([
            max(1.0 - m_ate / NORM_ATE, 0.0),
            max(1.0 - m_ase / NORM_ASE, 0.0),
            max(1.0 - m_aoe / NORM_AOE, 0.0)]))
        out[f"{cls}_AP"] = ap
        out[f"{cls}_ATE"] = m_ate
        out[f"{cls}_ASE"] = m_ase
        out[f"{cls}_AOE"] = m_aoe
        out[f"{cls}_CDS"] = cds
        for k, v in zip(("AP", "ATE", "ASE", "AOE", "CDS"),
                        (ap, m_ate, m_ase, m_aoe, cds)):
            agg[k].append(v)
    for k, vals in agg.items():
        out[f"m{k}"] = float(np.mean(vals)) if vals else 0.0
    return out
