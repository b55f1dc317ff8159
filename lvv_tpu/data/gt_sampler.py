"""Ground-truth database sampling ("gt-paste" augmentation).

Re-design of the reference sampler
(pcdet/datasets/augmentor/database_sampler.py:1-502): build a database of
gt boxes + their interior points from a dataset pass, then paste random
database objects into training scenes until per-class quotas are met,
rejecting pastes that collide (BEV IoU) with existing boxes. Host-side
numpy (runs in the input pipeline, like the reference).
"""
from __future__ import annotations

import pathlib
import pickle
from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np


def build_gt_database(dataset, out_path: str, class_names: Sequence[str],
                      min_points: int = 5, limit: int = 0) -> Dict:
    """Pass over `dataset` (DetectionDatasetBase protocol) collecting
    {class: [{box, points}]}; points stored relative to the box center."""
    import jax.numpy as jnp
    from ..ops.pool import points_in_rotated_boxes

    db: Dict[str, List[dict]] = defaultdict(list)
    n = len(dataset) if not limit else min(limit, len(dataset))
    for i in range(n):
        s = dataset[i]
        g = int(np.asarray(s["gt_mask"]).sum())
        if g == 0:
            continue
        pts = np.asarray(s["points"][: int(s["num_points"])])
        boxes = np.asarray(s["gt_boxes"][:g])
        labels = np.asarray(s["gt_labels"][:g])
        inside = np.asarray(points_in_rotated_boxes(
            jnp.asarray(pts[:, :3]), jnp.asarray(boxes[:, :7])))
        for j in range(g):
            obj_pts = pts[inside[:, j]]
            if len(obj_pts) < min_points:
                continue
            rel = obj_pts.copy()
            rel[:, :3] -= boxes[j, :3]
            db[class_names[labels[j]]].append(
                {"box": boxes[j].copy(), "points": rel})
    out = {"classes": dict(db), "min_points": min_points}
    pathlib.Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "wb") as f:
        pickle.dump(out, f)
    return out


def build_gt_database_from_infos(dataset_cls, dataroot, infos, classes,
                                 out_path, point_range, max_points,
                                 min_points: int = 5) -> None:
    """Shared CLI-side gt-paste database build over decoded infos
    (reference create_groundtruth_database flows; used by
    tools/create_{waymo,once}_infos.py --with-gt-db)."""
    ds = dataset_cls(dataroot=str(dataroot), infos=infos,
                     point_range=point_range, max_points=max_points,
                     max_gt=256)
    db = build_gt_database(ds, str(out_path), list(classes),
                           min_points=min_points)
    for k, v in sorted(db["classes"].items()):
        print(f"gt database {k}: {len(v)}")


class GTSampler:
    """Paste database objects into a scene (reference sample_with_fixed_number
    + put_boxes_on_road behavior simplified to ground-plane preservation:
    pasted objects keep their recorded z)."""

    def __init__(self, db_path: str, quotas: Dict[str, int],
                 class_names: Sequence[str], seed: int = 0,
                 max_trials: int = 10):
        with open(db_path, "rb") as f:
            self.db = pickle.load(f)["classes"]
        self.quotas = quotas
        self.class_names = list(class_names)
        self.rng = np.random.default_rng(seed)
        self.max_trials = max_trials

    def __call__(self, points: np.ndarray, gt_boxes: np.ndarray,
                 gt_labels: np.ndarray):
        """-> (points', gt_boxes', gt_labels') with pasted objects."""
        import jax.numpy as jnp
        from ..ops.boxes import iou_aabb_bev

        boxes = list(gt_boxes)
        labels = list(gt_labels)
        new_points = [points]
        for cname, quota in self.quotas.items():
            pool = self.db.get(cname, [])
            if not pool:
                continue
            want = max(quota - int((gt_labels ==
                                    self.class_names.index(cname)).sum()), 0)
            for _ in range(want):
                for _trial in range(self.max_trials):
                    obj = pool[self.rng.integers(len(pool))]
                    cand = obj["box"].copy()
                    if boxes:
                        iou = np.asarray(iou_aabb_bev(
                            jnp.asarray(cand[None, :7]),
                            jnp.asarray(np.stack(boxes)[:, :7])))
                        if iou.max() > 1e-3:
                            continue  # collision: retry
                    pts = obj["points"].copy()
                    pts[:, :3] += cand[:3]
                    new_points.append(pts)
                    boxes.append(cand)
                    labels.append(self.class_names.index(cname))
                    break
        return (np.concatenate(new_points, axis=0),
                np.stack(boxes) if boxes else gt_boxes,
                np.asarray(labels, np.int32))
