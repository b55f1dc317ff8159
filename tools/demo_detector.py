#!/usr/bin/env python
"""Detector demo: run a detector on a folder of point clouds and visualize
the predictions (reference src/lidar-encoder/tools/demo.py — which opens an
open3d/mayavi window; here the sink is rerun when importable, else a
viz-compatible .npz per frame that lvv_tpu.viz.stream_predictions or the
reference's viz_seq_dataset_with_boxes.py can replay).

    python tools/demo_detector.py --data-root scenes/ --detector VoxelNeXt \
        --checkpoint runs/det --out demo_out/            # .npz dump
    python tools/demo_detector.py --data-root scenes/ --rrd demo.rrd
"""
from __future__ import annotations

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True,
                   help="folder of .pcd.bin/.npy point files (Custom layout)")
    p.add_argument("--detector", default=None)
    p.add_argument("--config", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--set", action="append", default=[], dest="overrides")
    p.add_argument("--score-thresh", type=float, default=0.3)
    p.add_argument("--topk", type=int, default=0, help="0 = no cap")
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--out", default=None,
                   help="directory for per-frame .npz dumps")
    p.add_argument("--rrd", default=None,
                   help="persist the rerun stream to this .rrd file")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from lvv_tpu import config as C
    from lvv_tpu.data.detection_dataset import build_dataset
    from lvv_tpu.models.registry import build_detector

    cfg = (C.load(C.VQAConfig, args.config, args.overrides) if args.config
           else C.apply_overrides(C.default_config(), args.overrides))
    detector = args.detector or (
        C.load_file(args.config).get("_detector") if args.config else None
    ) or "VoxelNeXt"
    det = build_detector(detector, cfg.model.voxelnext, cfg.voxelize)
    ds = build_dataset("Custom", root=args.data_root,
                       point_range=cfg.voxelize.point_range,
                       max_points=cfg.voxelize.max_points)
    n = len(ds) if not args.limit else min(args.limit, len(ds))
    if n == 0:
        raise SystemExit(f"no point files under {args.data_root}")

    s0 = ds[0]
    params = det.init(jax.random.PRNGKey(0), jnp.asarray(s0["points"]),
                      jnp.asarray(s0["num_points"]))
    if args.checkpoint:
        from lvv_tpu.train.checkpoints import CheckpointManager
        restored, step = CheckpointManager(
            args.checkpoint).try_restore_newest(params)
        if restored is not None:
            params = restored
            print(f"[demo] loaded checkpoint step {step}")

    detect = jax.jit(lambda p_, pts, np_: det.apply(
        p_, pts, np_, method=type(det).detect))

    def frames():
        for i in range(n):
            s = ds[i]
            d = detect(params, jnp.asarray(s["points"][:, :4]),
                       jnp.asarray(s["num_points"]))
            cnt = int(d.count)
            yield {"points": np.asarray(s["points"]),
                   "boxes": np.asarray(d.boxes[:cnt]),
                   "scores": np.asarray(d.scores[:cnt]),
                   "labels": np.asarray(d.labels[:cnt]),
                   "token": s.get("token", str(i)), "t": i * 0.1}

    filt = dict(score_thresh=args.score_thresh,
                top_k=args.topk or None)
    if args.out:
        outd = _pathlib.Path(args.out)
        outd.mkdir(parents=True, exist_ok=True)
        from lvv_tpu.viz.rerun_viz import filter_predictions
        count = 0
        for f in frames():
            boxes, scores, labels = filter_predictions(
                f["boxes"], f["scores"], f["labels"], **filt)
            np.savez(outd / f"{f['token']}.npz", points=f["points"],
                     boxes=boxes, scores=scores, labels=labels)
            count += 1
        print(json.dumps({"frames": count, "out": str(outd)}))
    else:
        from lvv_tpu.viz.rerun_viz import stream_predictions
        count = stream_predictions(frames(), rrd_path=args.rrd, **filt)
        print(json.dumps({"frames": count, "rrd": args.rrd}))


if __name__ == "__main__":
    main()
