"""Lyft detection mAP (native port).

Re-design of the reference's Lyft evaluator
(pcdet/datasets/lyft/lyft_mAP_eval/lyft_eval.py:243-372, the official
lyft-dataset-devkit mAP): per class, VOC-style average precision —
score-sorted greedy matching against per-sample ground truths with a
checked-flag per IoU threshold, sentinel-padded PR envelope
(get_ap:243-266), averaged over the 10 IoU thresholds 0.5:0.95.

Boxes use the pcdet layout [x, y, z, dx, dy, dz, yaw]; 3D IoU comes from
ops.boxes.iou_3d (the devkit's Box3D.get_iou equivalent).
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

DEFAULT_IOU_THRESHOLDS = tuple(np.round(np.arange(0.5, 1.0, 0.05), 2))


def _iou3d(gt: np.ndarray, pred: np.ndarray) -> np.ndarray:
    if len(gt) == 0 or len(pred) == 0:
        return np.zeros((len(gt), len(pred)), np.float32)
    import jax.numpy as jnp
    from ..ops.boxes import iou_3d
    return np.asarray(iou_3d(jnp.asarray(gt, jnp.float32),
                             jnp.asarray(pred, jnp.float32)))


def get_ap(recalls: np.ndarray, precisions: np.ndarray) -> float:
    """VOC AP with sentinel + monotone envelope (reference get_ap)."""
    r = np.concatenate(([0.0], recalls, [1.0]))
    p = np.concatenate(([0.0], precisions, [0.0]))
    for i in range(len(p) - 2, -1, -1):
        p[i] = max(p[i], p[i + 1])
    idx = np.where(r[1:] != r[:-1])[0]
    return float(np.sum((r[idx + 1] - r[idx]) * p[idx + 1]))


def class_average_precision(gt_by_sample: Dict[str, np.ndarray],
                            preds: List[Dict],
                            iou_thresholds: Sequence[float]) -> np.ndarray:
    """One class -> AP per IoU threshold (reference recall_precision)."""
    num_gts = sum(len(b) for b in gt_by_sample.values())
    if num_gts == 0:
        return np.full(len(iou_thresholds), -1.0)
    checked = {tok: np.zeros((len(b), len(iou_thresholds)), bool)
               for tok, b in gt_by_sample.items()}
    order = sorted(range(len(preds)), key=lambda i: -preds[i]["score"])
    tp = np.zeros((len(preds), len(iou_thresholds)))
    fp = np.zeros((len(preds), len(iou_thresholds)))
    for rank, pi in enumerate(order):
        p = preds[pi]
        gts = gt_by_sample.get(p["sample_token"],
                               np.zeros((0, 7), np.float32))
        if len(gts):
            overlaps = _iou3d(gts, np.asarray(p["box"],
                                              np.float32)[None])[:, 0]
            jmax = int(np.argmax(overlaps))
            max_overlap = float(overlaps[jmax])
        else:
            jmax, max_overlap = -1, -np.inf
        for ti, thr in enumerate(iou_thresholds):
            if max_overlap > thr:
                flags = checked[p["sample_token"]]
                if not flags[jmax, ti]:
                    tp[rank, ti] = 1.0
                    flags[jmax, ti] = True
                else:
                    fp[rank, ti] = 1.0
            else:
                fp[rank, ti] = 1.0
    tp = np.cumsum(tp, axis=0)
    fp = np.cumsum(fp, axis=0)
    recalls = tp / float(num_gts)
    precisions = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
    return np.asarray([get_ap(recalls[:, i], precisions[:, i])
                       for i in range(len(iou_thresholds))])


def evaluate(gt_annos: Sequence[Dict], pred_annos: Sequence[Dict],
             classes: Sequence[str],
             iou_thresholds: Sequence[float] = DEFAULT_IOU_THRESHOLDS
             ) -> Dict[str, float]:
    """annos per sample: gt {name [G], boxes [G, 7], sample_token}; preds
    additionally {score [P]}. -> {<cls>/AP, mAP} (AP = threshold mean;
    classes with no gt are skipped like the reference's -1 filter)."""
    out: Dict[str, float] = {}
    aps = []
    for cls in classes:
        gt_by_sample: Dict[str, np.ndarray] = {}
        preds: List[Dict] = []
        for g, p in zip(gt_annos, pred_annos):
            tok = str(g.get("sample_token", id(g)))
            names = np.asarray(g["name"])
            boxes = np.asarray(g["boxes"], np.float32).reshape(-1, 7)
            gt_by_sample[tok] = boxes[names == cls]
            pn = np.asarray(p["name"])
            pb = np.asarray(p["boxes"], np.float32).reshape(-1, 7)
            ps = np.asarray(p["score"], np.float32)
            for b, s in zip(pb[pn == cls], ps[pn == cls]):
                preds.append({"sample_token": tok, "box": b,
                              "score": float(s)})
        ap_t = class_average_precision(gt_by_sample, preds, iou_thresholds)
        if (ap_t < 0).all():
            continue
        ap = float(ap_t.mean())
        out[f"{cls}/AP"] = ap
        aps.append(ap)
    out["mAP"] = float(np.mean(aps)) if aps else 0.0
    return out
