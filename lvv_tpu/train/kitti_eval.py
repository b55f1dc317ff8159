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


def get_thresholds(scores: np.ndarray, num_gt: int,
                   num_sample_pts: int = 41) -> np.ndarray:
    """Exact port of the official score-threshold sampler
    (reference kitti_object_eval_python/eval.py:10-27): walk the
    descending TP scores, emitting one threshold per ~1/40 recall step,
    preferring the side of each recall interval nearer the sample point."""
    scores = np.sort(np.asarray(scores, np.float64))[::-1]
    current_recall = 0.0
    thresholds = []
    for i, score in enumerate(scores):
        l_recall = (i + 1) / num_gt
        r_recall = (i + 2) / num_gt if i < len(scores) - 1 else l_recall
        if ((r_recall - current_recall) < (current_recall - l_recall)
                and i < len(scores) - 1):
            continue
        thresholds.append(score)
        current_recall += 1.0 / (num_sample_pts - 1.0)
    return np.asarray(thresholds)


def ap_r40_official(all_scores: np.ndarray, all_tp: np.ndarray, n_gt: int,
                    weights: np.ndarray | None = None,
                    num_sample_pts: int = 41) -> float:
    """Official AP_R40: precision evaluated only at the recall-sampled
    score thresholds (41 sample points; unreached points stay 0), then the
    right-max monotone envelope, then the mean over points 1..40
    (reference eval.py eval_class:476-545 + get_mAP_R40:701-704). With
    `weights` the numerator becomes the weighted sum (AOS, eval.py:263-270).

    Identical to the continuous-PR ap_r40 once n_gt >> 40; on tiny scenes
    it is strictly the official (smaller) value since only len(thresholds)
    of the 41 sample points carry precision."""
    if n_gt == 0 or len(all_scores) == 0:
        return 0.0
    order = np.argsort(-np.asarray(all_scores, np.float64))
    s = np.asarray(all_scores, np.float64)[order]
    t = np.asarray(all_tp, bool)[order]
    w = np.asarray(weights, np.float64)[order] if weights is not None \
        else t.astype(np.float64)
    thresholds = get_thresholds(s[t], n_gt, num_sample_pts)
    prec = np.zeros(num_sample_pts)
    cum_w = np.cumsum(w)
    for i, th in enumerate(thresholds):
        k = int(np.sum(s >= th))        # dets below the threshold vanish
        prec[i] = cum_w[k - 1] / max(k, 1) if k else 0.0
    for i in range(num_sample_pts):
        prec[i] = prec[i:].max()
    return float(prec[1:].sum() / (num_sample_pts - 1))


def ap_r40(all_scores: np.ndarray, all_tp: np.ndarray, n_gt: int) -> float:
    """40-recall-point AP over the continuous PR curve (reference
    eval.py get_mAP_R40 semantics in the n_gt >> 40 regime; see
    ap_r40_official for the exact sampled formulation)."""
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


# ---------------------------------------------------------------- official
# Difficulty + ignored-box semantics of the official devkit
# (reference kitti_object_eval_python/eval.py clean_data:84-130):
# per-difficulty thresholds on 2D-bbox height / occlusion / truncation,
# "similar class" gts (Van for Car, Person_sitting for Pedestrian) ignored
# rather than penalized, and gts beyond the difficulty counted as ignored
# so detections matched to them are neither TP nor FP.

MIN_HEIGHT = (40.0, 25.0, 25.0)
MAX_OCCLUSION = (0, 1, 2)
MAX_TRUNCATION = (0.15, 0.30, 0.50)
DIFFICULTY_NAMES = ("easy", "moderate", "hard")
SIMILAR = {"Car": ("Van",), "Pedestrian": ("Person_sitting",),
           "car": ("van",), "pedestrian": ("person_sitting",)}


def _bbox_height(d: Dict, n: int) -> np.ndarray:
    """2D box height in pixels; falls back to 'always tall enough'."""
    if "bbox" in d and len(np.asarray(d["bbox"]).reshape(-1, 4)) == n:
        bb = np.asarray(d["bbox"], np.float64).reshape(-1, 4)
        return np.abs(bb[:, 3] - bb[:, 1])
    return np.asarray(d.get("bbox_height", np.full(n, 1000.0)), np.float64)


def clean_data(gt: Dict, cls: str, difficulty: int):
    """-> gt flags: 0 counted / 1 ignored / -1 rejected (clean_data port).

    gt: {name [G], boxes [G, 7], occluded [G], truncated [G],
    bbox [G, 4] or bbox_height [G]} (image-plane fields default to easy
    when absent)."""
    names = np.asarray(gt["name"])
    g = len(names)
    occ = np.asarray(gt.get("occluded", np.zeros(g)))
    trunc = np.asarray(gt.get("truncated", np.zeros(g)))
    height = _bbox_height(gt, g)
    flags = np.full(g, -1, np.int64)
    same = names == cls
    similar = np.isin(names, SIMILAR.get(cls, ()))
    beyond = ((occ > MAX_OCCLUSION[difficulty])
              | (trunc > MAX_TRUNCATION[difficulty])
              | (height <= MIN_HEIGHT[difficulty]))
    flags[same & ~beyond] = 0
    flags[same & beyond] = 1
    flags[similar] = 1
    return flags


def clean_dets(pred: Dict, cls: str, difficulty: int) -> np.ndarray:
    """Detection flags (reference clean_data:70-82): 0 valid / 1 ignored
    (right class, 2D box too short for the difficulty) / -1 wrong class."""
    names = np.asarray(pred["name"])
    p = len(names)
    height = _bbox_height(pred, p)
    flags = np.full(p, -1, np.int64)
    flags[height < MIN_HEIGHT[difficulty]] = 1
    flags[(names == cls) & (height >= MIN_HEIGHT[difficulty])] = 0
    return flags


def image_box_overlap(a: np.ndarray, b: np.ndarray,
                      criterion: int = -1) -> np.ndarray:
    """2D [x1,y1,x2,y2] overlap (reference eval.py image_box_overlap):
    criterion -1 = IoU, 0 = intersection / area(a) (DontCare rule)."""
    a = np.asarray(a, np.float64).reshape(-1, 4)
    b = np.asarray(b, np.float64).reshape(-1, 4)
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float64)
    ix = (np.minimum(a[:, None, 2], b[None, :, 2])
          - np.maximum(a[:, None, 0], b[None, :, 0])).clip(min=0)
    iy = (np.minimum(a[:, None, 3], b[None, :, 3])
          - np.maximum(a[:, None, 1], b[None, :, 1])).clip(min=0)
    inter = ix * iy
    area_a = ((a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1]))[:, None]
    area_b = ((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]))[None, :]
    if criterion == 0:
        denom = area_a * np.ones_like(area_b)
    else:
        denom = area_a + area_b - inter
    return inter / np.maximum(denom, 1e-9)


def ap_r40_weighted(all_scores: np.ndarray, all_tp: np.ndarray,
                    all_w: np.ndarray, n_gt: int) -> float:
    """AP_R40 with per-TP weights in the numerator — the official AOS
    formula (reference eval.py:263-270: similarity replaces the tp count
    in the precision numerator)."""
    if n_gt == 0 or len(all_scores) == 0:
        return 0.0
    order = np.argsort(-all_scores)
    tp = np.cumsum(all_tp[order])
    fp = np.cumsum(~all_tp[order])
    w = np.cumsum(all_w[order])
    recall = tp / n_gt
    prec = w / np.maximum(tp + fp, 1e-9)
    ap = 0.0
    for r in np.linspace(1 / 40, 1.0, 40):
        mask = recall >= r
        ap += (prec[mask].max() if mask.any() else 0.0) / 40
    return float(ap)


def evaluate_kitti_official(gts: Sequence[Dict], preds: Sequence[Dict],
                            classes: Sequence[str],
                            iou_thresholds: Dict[str, float] | None = None,
                            mode: str = "3d",
                            compute_aos: bool = False,
                            score_sampling: bool = True
                            ) -> Dict[str, float]:
    """Official-style per-difficulty AP_R40 (reference eval.py eval_class +
    compute_statistics_jit). Modes: '3d' / 'bev' (rotated LiDAR IoU on
    boxes [G, 7]) / 'bbox' (image-plane IoU on bbox [G, 4], with DontCare
    regions absorbing unmatched detections). `compute_aos` adds the
    orientation-similarity AP (needs 'alpha' on gts and preds; official
    devkit pairs it with the bbox metric).

    gts per sample: {name, boxes [G, 7] (lidar), bbox [G, 4]?, occluded,
    truncated, alpha [G]?}; preds: {name, boxes, score, bbox?, alpha?}.
    -> {<cls>_<difficulty>_ap_<mode>_R40, mAP_<difficulty>[, aos keys]}."""
    iou_thresholds = iou_thresholds or {}
    out: Dict[str, float] = {}
    for difficulty in range(3):
        aps, aoss = [], []
        for cls in classes:
            th = iou_thresholds.get(
                cls, 0.7 if cls.lower() == "car" else 0.5)
            scores_l, tp_l, sim_l, n_gt = [], [], [], 0
            for g, p in zip(gts, preds):
                flags = clean_data(g, cls, difficulty)
                gnames = np.asarray(g["name"])
                pn = np.asarray(p["name"])
                dt_flags_all = clean_dets(p, cls, difficulty)
                keep_p = pn == cls
                dt_flags = dt_flags_all[keep_p]
                ps = np.asarray(p["score"], np.float32)[keep_p]
                counted = flags == 0
                considered = flags >= 0
                n_gt += int(counted.sum())
                order = np.argsort(-ps)
                if mode == "bbox":
                    gb = np.asarray(g.get("bbox", np.zeros((len(gnames), 4))),
                                    np.float64).reshape(-1, 4)
                    pb = np.asarray(p.get("bbox", np.zeros((len(pn), 4))),
                                    np.float64).reshape(-1, 4)[keep_p]
                    iou = image_box_overlap(pb[order], gb[considered])
                else:
                    gb = np.asarray(g["boxes"], np.float32).reshape(-1, 7)
                    pb = np.asarray(p["boxes"],
                                    np.float32).reshape(-1, 7)[keep_p]
                    iou = _pair_iou(pb[order], gb[considered], mode)
                galpha = np.asarray(g.get("alpha",
                                          np.zeros(len(gnames))), np.float64)
                palpha = np.asarray(p.get("alpha", np.zeros(len(pn))),
                                    np.float64)[keep_p][order]
                dt_flags = dt_flags[order]
                idx_map = np.nonzero(considered)[0]
                taken = np.zeros(len(idx_map), bool)
                tp = np.zeros(len(pb), bool)
                sim = np.zeros(len(pb), np.float64)
                drop = np.zeros(len(pb), bool)
                for i in range(len(pb)):
                    if dt_flags[i] < 0:
                        drop[i] = True        # wrong class: never scored
                        continue
                    cand = np.nonzero(~taken & (iou[i] >= th))[0]
                    if len(cand) == 0:
                        if dt_flags[i] == 1:
                            drop[i] = True    # too-short det, not an FP
                        continue
                    best = cand[np.argmax(iou[i, cand])]
                    taken[best] = True
                    gi = idx_map[best]
                    if counted[gi] and dt_flags[i] == 0:
                        tp[i] = True
                        sim[i] = (1.0 + np.cos(galpha[gi] - palpha[i])) / 2.0
                    else:
                        drop[i] = True        # ignored gt or ignored det
                if mode == "bbox":
                    # unmatched dets inside DontCare regions vanish
                    # (reference eval.py:250-262: inter/det-area > thresh)
                    dc = np.asarray(
                        [np.asarray(g["bbox"], np.float64).reshape(-1, 4)[j]
                         for j in range(len(gnames))
                         if gnames[j] == "DontCare" and "bbox" in g],
                        np.float64).reshape(-1, 4)
                    if len(dc):
                        ov = image_box_overlap(pb[order], dc, criterion=0)
                        in_dc = (ov.max(axis=1) > th) & ~tp & ~drop
                        drop |= in_dc
                scores_l.append(ps[order][~drop])
                tp_l.append(tp[~drop])
                sim_l.append(sim[~drop])
            scores = np.concatenate(scores_l) if scores_l else np.zeros(0)
            tps = np.concatenate(tp_l) if tp_l else np.zeros(0, bool)
            sims = np.concatenate(sim_l) if sim_l else np.zeros(0)
            # score_sampling=True is the official devkit formulation
            # (41 recall-sampled thresholds); False keeps the continuous
            # PR curve, which matches it when n_gt >> 40 and is the
            # intuitive value on toy scenes.
            ap = ap_r40_official(scores, tps, n_gt) if score_sampling \
                else ap_r40(scores, tps, n_gt)
            out[f"{cls}_{DIFFICULTY_NAMES[difficulty]}_ap_{mode}_R40"] = ap
            aps.append(ap)
            if compute_aos:
                aos = ap_r40_official(scores, tps, n_gt, weights=sims) \
                    if score_sampling else \
                    ap_r40_weighted(scores, tps, sims, n_gt)
                out[f"{cls}_{DIFFICULTY_NAMES[difficulty]}_aos_R40"] = aos
                aoss.append(aos)
        out[f"mAP_{mode}_{DIFFICULTY_NAMES[difficulty]}"] = \
            float(np.mean(aps)) if aps else 0.0
        if compute_aos:
            out[f"mAOS_{DIFFICULTY_NAMES[difficulty]}"] = \
                float(np.mean(aoss)) if aoss else 0.0
    return out


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
