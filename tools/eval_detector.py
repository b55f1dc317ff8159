#!/usr/bin/env python
"""Detector evaluation CLI (reference src/lidar-encoder/tools/test.py:
eval one checkpoint — or watch a directory of them — against dataset
metrics + recall statistics).

Works against the fixed-shape detection datasets ("Custom" folder of
.pcd.bin/.npy [+ .boxes.npy gts] or nuScenes when the devkit is present).
"""
from __future__ import annotations

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import argparse
import json
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--detector", default="VoxelNeXt")
    p.add_argument("--dataset", default="Custom")
    p.add_argument("--data-root", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--config", default=None)
    p.add_argument("--set", action="append", default=[], dest="overrides")
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--watch", action="store_true",
                   help="re-evaluate as new checkpoints appear "
                        "(reference repeat_eval_ckpt)")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from lvv_tpu import config as C
    from lvv_tpu.data.detection_dataset import build_dataset
    from lvv_tpu.models.registry import build_detector
    from lvv_tpu.train.detector import recall_stats
    from lvv_tpu.train.nuscenes_eval import evaluate

    cfg = (C.load(C.VQAConfig, args.config, args.overrides) if args.config
           else C.apply_overrides(C.default_config(), args.overrides))
    det = build_detector(args.detector, cfg.model.voxelnext, cfg.voxelize)
    ds = build_dataset(args.dataset, root=args.data_root,
                       point_range=cfg.voxelize.point_range,
                       max_points=cfg.voxelize.max_points)

    n = len(ds) if not args.limit else min(args.limit, len(ds))
    sample0 = ds[0]
    params = det.init(jax.random.PRNGKey(0),
                      jnp.asarray(sample0["points"]),
                      jnp.asarray(sample0["num_points"]))
    seen = set()

    def load_ckpt():
        if not args.checkpoint:
            return False
        from lvv_tpu.train.checkpoints import CheckpointManager
        mgr = CheckpointManager(args.checkpoint)
        nonlocal params
        restored, step = mgr.try_restore_newest(params)
        if restored is not None and step not in seen:
            seen.add(step)
            params = restored
            print(f"[eval] loaded checkpoint step {step}")
            return True
        return False

    detect = jax.jit(lambda p, pts, np_: det.apply(
        p, pts, np_, method=type(det).detect))

    def run_eval():
        classes = list(cfg.model.voxelnext.class_names)
        recalls, preds_by_cls, gts_by_cls, times = [], {}, {}, []
        for i in range(n):
            s = ds[i]
            t0 = time.perf_counter()
            d = detect(params, jnp.asarray(s["points"]),
                       jnp.asarray(s["num_points"]))
            cnt = int(d.count)
            boxes = np.asarray(d.boxes[:cnt])
            times.append(time.perf_counter() - t0)
            labels = np.asarray(d.labels[:cnt])
            scores = np.asarray(d.scores[:cnt])
            gt_n = int(s["gt_mask"].sum())
            gt = np.asarray(s["gt_boxes"][:gt_n])
            gl = np.asarray(s["gt_labels"][:gt_n])
            recalls.append(recall_stats(boxes, cnt, gt))
            for ci, cname in enumerate(classes):
                preds_by_cls.setdefault(cname, []).append(
                    {"boxes": boxes[labels == ci],
                     "scores": scores[labels == ci]})
                gts_by_cls.setdefault(cname, []).append(
                    {"boxes": gt[gl == ci]})
        agg = {}
        if recalls:
            for k in recalls[0]:
                agg[k] = float(np.mean([r[k] for r in recalls]))
        agg.update(evaluate(preds_by_cls, gts_by_cls, classes))
        agg["sec_per_example"] = float(np.mean(times[1:])) if len(times) > 1 \
            else float(times[0])
        return agg

    load_ckpt()
    result = run_eval()
    out = {k: v for k, v in result.items() if k != "per_class"}
    print(json.dumps(out, indent=2, default=str))
    if args.out:
        _pathlib.Path(args.out).write_text(
            json.dumps(result, indent=2, default=str))
    while args.watch:
        time.sleep(30)
        if load_ckpt():
            print(json.dumps({k: v for k, v in run_eval().items()
                              if k != "per_class"}, indent=2, default=str))


if __name__ == "__main__":
    main()
