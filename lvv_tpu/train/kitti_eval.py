"""KITTI-style 3D / BEV AP evaluation (R40), host-side numpy.

Re-design of the reference's KITTI evaluator
(pcdet/datasets/kitti/kitti_object_eval_python/eval.py + the numba rotated
IoU in rotate_iou.py): per-class AP over 40 recall positions with
IoU-threshold matching (0.7 car-style, 0.5 pedestrian-style), in 3D or BEV.
The rotated-overlap math reuses lvv_tpu.ops.boxes (the same exact polygon
clipping the CUDA kernel implements); difficulty bucketing is delegated to
the caller's filter (image-plane truncation/occlusion data is KITTI-label
specific and arrives with the dataset port).
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def _pair_iou(pred: np.ndarray, gt: np.ndarray, mode: str) -> np.ndarray:
    import jax.numpy as jnp
    from ..ops.boxes import iou_3d, iou_bev
    if len(pred) == 0 or len(gt) == 0:
        return np.zeros((len(pred), len(gt)), np.float32)
    fn = iou_3d if mode == "3d" else iou_bev
    return np.asarray(fn(jnp.asarray(pred[:, :7]), jnp.asarray(gt[:, :7])))


def match_sample(pred_boxes, pred_scores, gt_boxes, iou_thresh: float,
                 mode: str = "3d"):
    """Greedy score-ordered matching -> (tp flags, matched-gt count)."""
    order = np.argsort(-np.asarray(pred_scores))
    pred_boxes = np.asarray(pred_boxes)[order]
    scores = np.asarray(pred_scores)[order]
    iou = _pair_iou(pred_boxes, np.asarray(gt_boxes), mode)
    taken = np.zeros(len(gt_boxes), bool)
    tp = np.zeros(len(pred_boxes), bool)
    for i in range(len(pred_boxes)):
        best, best_iou = -1, iou_thresh
        for j in range(len(gt_boxes)):
            if not taken[j] and iou[i, j] >= best_iou:
                best, best_iou = j, iou[i, j]
        if best >= 0:
            taken[best] = True
            tp[i] = True
    return scores, tp, len(gt_boxes)


def ap_r40(all_scores: np.ndarray, all_tp: np.ndarray, n_gt: int) -> float:
    """40-recall-point AP (reference eval.py get_mAP_R40 semantics)."""
    if n_gt == 0 or len(all_scores) == 0:
        return 0.0
    order = np.argsort(-all_scores)
    tp = np.cumsum(all_tp[order])
    fp = np.cumsum(~all_tp[order])
    recall = tp / n_gt
    precision = tp / np.maximum(tp + fp, 1e-9)
    ap = 0.0
    for r in np.linspace(1 / 40, 1.0, 40):
        mask = recall >= r
        ap += (precision[mask].max() if mask.any() else 0.0) / 40
    return float(ap)


def evaluate_kitti(preds: Sequence[Dict], gts: Sequence[Dict],
                   classes: Sequence[str],
                   iou_thresholds: Dict[str, float] | None = None,
                   mode: str = "3d") -> Dict:
    """preds/gts: per-sample {class_name: {boxes, scores?}} dicts.

    iou_thresholds defaults to KITTI's 0.7 for 'car'-like, 0.5 otherwise.
    """
    iou_thresholds = iou_thresholds or {}
    out: Dict[str, float] = {}
    for cls in classes:
        th = iou_thresholds.get(cls, 0.7 if cls in ("car", "Car") else 0.5)
        scores_l, tp_l, n_gt = [], [], 0
        for p, g in zip(preds, gts):
            pc = p.get(cls, {"boxes": np.zeros((0, 7)), "scores": []})
            gc = g.get(cls, {"boxes": np.zeros((0, 7))})
            s, tp, n = match_sample(
                np.asarray(pc["boxes"], np.float32),
                np.asarray(pc.get("scores", np.ones(len(pc["boxes"])))),
                np.asarray(gc["boxes"], np.float32), th, mode)
            scores_l.append(s)
            tp_l.append(tp)
            n_gt += n
        scores = np.concatenate(scores_l) if scores_l else np.zeros(0)
        tps = np.concatenate(tp_l) if tp_l else np.zeros(0, bool)
        out[f"{cls}_ap_{mode}_R40"] = ap_r40(scores, tps, n_gt)
    out[f"mAP_{mode}_R40"] = float(np.mean(
        [v for k, v in out.items() if k.endswith("_R40")
         and not k.startswith("mAP")])) if classes else 0.0
    return out
