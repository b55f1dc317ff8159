#!/usr/bin/env python
"""Detector training CLI (reference src/lidar-encoder/tools/train.py:68-229).

Trains any registered detector family (see lvv_tpu.models.registry — 16
assemblies from VoxelNeXt to BEVFusion) on real datasets or synthetic
scenes: each step loads point clouds + gt boxes, runs the jit'd train
step, logs meters, checkpoints on an interval.

Real data: --dataset <registry name> + --dataroot/--info-path select any
ported suite (NuScenes / Kitti / Waymo / ONCE / Lyft / Pandaset / Argo2 /
Custom); ingestion is devkit-free via the tools/create_*_infos.py CLIs.
--synthetic runs the full loop on generated scenes (smoke / benchmark).
"""
from __future__ import annotations

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import argparse
import json
import time

import numpy as np


def synthetic_mppnet_batch(rng, b, n_frames, n_pts, n_gt, n_rois,
                           point_range):
    """Multi-frame MPPNet batch: ego-aligned frame stacks + noisy-gt
    proposals (the synthetic stand-in for the reference's precomputed
    ROI_BOXES_PATH CenterPoint boxes)."""
    base = synthetic_batch(rng, b, n_pts, n_gt, point_range)
    fp = rng.uniform(point_range[0], point_range[3],
                     (b, n_frames, n_pts, 4)).astype(np.float32)
    fp[..., 2] = rng.uniform(point_range[2], point_range[5],
                             (b, n_frames, n_pts))
    pb = np.zeros((b, n_rois, 9), np.float32)
    pb[:, :n_gt] = base["gt_boxes"] + rng.normal(
        0, 0.3, (b, n_gt, 9)).astype(np.float32)
    pb[:, n_gt:, :2] = rng.uniform(point_range[0] * 0.8,
                                   point_range[3] * 0.8,
                                   (b, n_rois - n_gt, 2))
    pb[:, n_gt:, 3:6] = rng.uniform(1.0, 4.0, (b, n_rois - n_gt, 3))
    return {
        "frame_points": fp,
        "frame_counts": np.full((b, n_frames), n_pts, np.int32),
        "prop_boxes": pb,
        "prop_scores": np.full((b, n_rois), 0.5, np.float32),
        "prop_labels": np.zeros((b, n_rois), np.int32),
        "prop_count": np.full((b,), n_rois, np.int32),
        "gt_boxes": base["gt_boxes"], "gt_mask": base["gt_mask"],
    }


def synthetic_batch(rng, b, n_pts, n_gt, point_range):
    pts = rng.uniform(point_range[0], point_range[3],
                      (b, n_pts, 4)).astype(np.float32)
    pts[..., 2] = rng.uniform(point_range[2], point_range[5], (b, n_pts))
    boxes = np.zeros((b, n_gt, 9), np.float32)
    boxes[..., :2] = rng.uniform(point_range[0] * 0.8, point_range[3] * 0.8,
                                 (b, n_gt, 2))
    boxes[..., 2] = -1.0
    boxes[..., 3:6] = rng.uniform(1.0, 4.0, (b, n_gt, 3))
    boxes[..., 6] = rng.uniform(-np.pi, np.pi, (b, n_gt))
    labels = rng.integers(0, 3, (b, n_gt)).astype(np.int32)
    return {"points": pts, "num_points": np.full((b,), n_pts, np.int32),
            "gt_boxes": boxes, "gt_labels": labels,
            "gt_mask": np.ones((b, n_gt), bool)}


def run_mppnet(args, cfg, det, rng) -> None:
    """MPPNet training loop (reference tools/train.py over
    detectors/mppnet.py): multi-frame batches + precomputed proposals.

    --synthetic fabricates frame stacks and noisy-gt proposals; real data
    uses a sequence-mode dataset (--seq-offsets) with --proposals (npz
    keyed by token; jittered-gt fallback for smoke runs)."""
    import jax
    import jax.numpy as jnp
    import optax
    from lvv_tpu.train.checkpoints import CheckpointManager
    from lvv_tpu.train.detector import make_mppnet_train_step

    n_frames = det.num_frames
    max_per_frame = cfg.voxelize.max_points // max(n_frames, 1)
    n_rois = 32

    if args.synthetic:
        fixed = synthetic_mppnet_batch(
            rng, args.batch, n_frames, max_per_frame, 8, n_rois,
            cfg.voxelize.point_range)

        def batch_stream():
            while True:
                yield fixed
    else:
        from lvv_tpu.data.detection_dataset import (build_dataset,
                                                    stack_sequence_frames)
        offsets = args.seq_offsets or [-(i + 1)
                                       for i in range(n_frames - 1)]
        ds = build_dataset(args.dataset, dataroot=args.dataroot,
                           info_path=args.info_path,
                           point_range=cfg.voxelize.point_range,
                           max_points=cfg.voxelize.max_points,
                           max_gt=args.max_gt,
                           sequence_offsets=offsets)
        if len(ds) == 0:
            raise SystemExit("dataset is empty — check --info-path")
        props = np.load(args.proposals) if args.proposals else None
        if props is None:
            print("[mppnet] no --proposals; jittered-gt proposals "
                  "(smoke mode — the reference trains on precomputed "
                  "CenterPoint boxes, ROI_BOXES_PATH)")

        def one(i):
            s = ds[int(i)]
            fp, fc = stack_sequence_frames(s["points"], s["frame_counts"],
                                           max_per_frame)
            if fp.shape[0] < n_frames:      # short sequences pad with empty
                pad = np.zeros((n_frames - fp.shape[0],) + fp.shape[1:],
                               fp.dtype)
                fp = np.concatenate([fp, pad])
                fc = np.concatenate(
                    [fc, np.zeros(n_frames - len(fc), np.int32)])
            fp, fc = fp[:n_frames], fc[:n_frames]
            pb = np.zeros((n_rois, 9), np.float32)
            if props is not None and s["token"] in props:
                got = np.asarray(props[s["token"]], np.float32)
                pb[:min(n_rois, len(got)), :got.shape[1]] = \
                    got[:n_rois, :9]
            else:
                g = np.asarray(s["gt_boxes"], np.float32)
                m = np.asarray(s["gt_mask"], bool)
                g = g[m][:n_rois]
                pb[:len(g)] = g + rng.normal(0, 0.3, g.shape)
            return {"frame_points": fp, "frame_counts": fc,
                    "prop_boxes": pb,
                    "prop_scores": np.full((n_rois,), 0.5, np.float32),
                    "prop_labels": np.zeros((n_rois,), np.int32),
                    "prop_count": np.int32(n_rois),
                    "gt_boxes": s["gt_boxes"], "gt_mask": s["gt_mask"]}

        def batch_stream():
            while True:
                order = rng.permutation(len(ds))
                for st in range(0, len(order) - args.batch + 1, args.batch):
                    rows = [one(i) for i in order[st:st + args.batch]]
                    yield {k: np.stack([r[k] for r in rows])
                           for k in rows[0]}

    stream = batch_stream()
    batch = next(stream)
    from lvv_tpu.models.voxelnext import Detections
    proposals0 = Detections(boxes=jnp.asarray(batch["prop_boxes"][0]),
                            scores=jnp.asarray(batch["prop_scores"][0]),
                            labels=jnp.asarray(batch["prop_labels"][0]),
                            count=jnp.asarray(batch["prop_count"][0]))
    params = det.init(jax.random.PRNGKey(0),
                      jnp.asarray(batch["frame_points"][0]),
                      jnp.asarray(batch["frame_counts"][0]), proposals0)
    sched = optax.warmup_cosine_decay_schedule(
        args.lr / 10, args.lr, max(args.steps // 10, 1), args.steps)
    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.adamw(sched))
    step = make_mppnet_train_step(det, tx)
    state = (params, tx.init(params))
    ckpt = CheckpointManager(args.out + "/checkpoints")
    key = jax.random.PRNGKey(11)
    for i in range(args.steps):
        t0 = time.perf_counter()
        key, sub = jax.random.split(key)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        jb["rng"] = sub
        state, metrics = step(state, jb)
        if i + 1 < args.steps:
            batch = next(stream)
        dt = time.perf_counter() - t0
        if i % args.log_every == 0 or i == args.steps - 1:
            extras = " ".join(
                f"{k} {float(v):.4f}" for k, v in sorted(metrics.items())
                if k != "loss")
            print(f"[{i}] loss {float(metrics['loss']):.4f} {extras} "
                  f"{dt * 1e3:.0f} ms")
        if args.save_every and (i + 1) % args.save_every == 0:
            ckpt.save(state[0], step=i + 1, cfg=cfg)
    ckpt.save(state[0], step=args.steps, cfg=cfg)
    print(json.dumps({"steps": args.steps,
                      "final_loss": float(metrics["loss"])}))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--detector", default=None,
                   help="registry family; defaults to the preset's "
                        "_detector meta key, else VoxelNeXt")
    p.add_argument("--config", default=None)
    p.add_argument("--set", action="append", default=[], dest="overrides")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="tiny_config shapes (CPU smoke on real data)")
    p.add_argument("--dataset", default="NuScenes",
                   help="registry dataset name (real-data mode)")
    p.add_argument("--dataroot", default=None)
    p.add_argument("--info-path", default=None,
                   help="info pickle from tools/create_*_infos.py")
    p.add_argument("--max-gt", type=int, default=128)
    p.add_argument("--augment", action="store_true",
                   help="world flip/rot/scale augmentation")
    p.add_argument("--gt-db", default=None,
                   help="gt-paste database pickle (from the "
                        "create_*_infos --with-gt-db step)")
    p.add_argument("--gt-quota", action="append", default=[],
                   help="class=N paste quota, repeatable (reference "
                        "SAMPLE_GROUPS); default 2 per dataset class")
    p.add_argument("--cbgs", action="store_true",
                   help="class-balanced resampling (nuScenes CBGS)")
    p.add_argument("--proposals", default=None,
                   help="MPPNet: .npz of precomputed first-stage boxes "
                        "keyed by sample token (reference ROI_BOXES_PATH); "
                        "absent -> jittered-gt proposals (smoke mode)")
    p.add_argument("--seq-offsets", type=int, nargs="*", default=None,
                   help="MPPNet real data: previous-frame offsets for the "
                        "sequence dataset mode, e.g. --seq-offsets -1 -2 -3")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--log-every", type=int, default=1)
    p.add_argument("--save-every", type=int, default=0,
                   help="intra-run checkpoint interval (0 = end only)")
    p.add_argument("--out", default="runs/detector")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from lvv_tpu import config as C
    from lvv_tpu.models.registry import build_detector
    from lvv_tpu.train.checkpoints import CheckpointManager
    from lvv_tpu.train.detector import make_detector_train_step

    cfg = (C.load(C.VQAConfig, args.config, args.overrides) if args.config
           else C.apply_overrides(
               C.tiny_config() if (args.synthetic or args.tiny)
               else C.default_config(), args.overrides))
    detector = args.detector or (
        C.load_file(args.config).get("_detector") if args.config else None
    ) or "VoxelNeXt"
    det = build_detector(detector, cfg.model.voxelnext, cfg.voxelize)

    rng = np.random.default_rng(0)
    if detector in ("MPPNet", "MPPNetE2E"):
        run_mppnet(args, cfg, det, rng)
        return
    if args.synthetic:
        fixed = synthetic_batch(rng, args.batch,
                                cfg.voxelize.max_points // 4, 8,
                                cfg.voxelize.point_range)

        def batch_stream():
            while True:
                yield fixed
    else:
        from lvv_tpu.data.detection_dataset import (DetectionDatasetBase,
                                                    build_dataset)
        ds_kw = dict(point_range=cfg.voxelize.point_range,
                     max_points=cfg.voxelize.max_points,
                     max_gt=args.max_gt, augment=args.augment)
        if args.dataset in ("Custom", "Kitti"):
            ds_kw["root"] = args.dataroot
        else:
            ds_kw["dataroot"] = args.dataroot
            if args.info_path:
                ds_kw["info_path"] = args.info_path
        if args.cbgs:
            ds_kw["balanced_resampling"] = True
        ds = build_dataset(args.dataset, **ds_kw)
        if args.gt_db:
            from lvv_tpu.data.gt_sampler import GTSampler
            classes = list(getattr(ds, "CLASSES",
                                   cfg.model.voxelnext.class_names))
            quotas = {c: 2 for c in classes}
            for q in args.gt_quota:
                c, n = q.split("=")
                quotas[c] = int(n)
            ds.gt_sampler = GTSampler(args.gt_db, quotas, classes)
            print(f"[data] gt-paste sampler: {quotas}")
        if len(ds) == 0:
            raise SystemExit("dataset is empty — check --info-path")
        if args.batch > len(ds):
            print(f"[data] batch {args.batch} > {len(ds)} samples; "
                  f"clamping to {len(ds)}")
            args.batch = len(ds)
        print(f"[data] {args.dataset}: {len(ds)} samples")

        def batch_stream():
            while True:                      # epoch loop
                order = rng.permutation(len(ds))
                for s in range(0, len(order) - args.batch + 1, args.batch):
                    idx = order[s:s + args.batch]
                    yield DetectionDatasetBase.collate(
                        [ds[int(i)] for i in idx])

    stream = batch_stream()
    batch = next(stream)

    params = det.init(jax.random.PRNGKey(0),
                      jnp.asarray(batch["points"][0]),
                      jnp.asarray(batch["num_points"][0]))
    # one-cycle-style schedule (reference adam_onecycle,
    # train_utils/optimization) approximated by warmup-cosine
    sched = optax.warmup_cosine_decay_schedule(
        args.lr / 10, args.lr, max(args.steps // 10, 1), args.steps)
    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.adamw(sched))
    step = make_detector_train_step(det, tx, cfg.model.voxelnext,
                                    cfg.voxelize)
    state = (params, tx.init(params["params"]))
    ckpt = CheckpointManager(args.out + "/checkpoints")

    train_keys = ("points", "num_points", "gt_boxes", "gt_labels",
                  "gt_mask")
    for i in range(args.steps):
        t0 = time.perf_counter()
        jb = {k: jnp.asarray(batch[k]) for k in train_keys}
        state, metrics = step(state, jb)
        if i + 1 < args.steps:
            batch = next(stream)             # host load overlaps the step
        dt = time.perf_counter() - t0
        if i % args.log_every == 0 or i == args.steps - 1:
            # families emit different aux keys (hm/reg for center heads,
            # cls/box/dir for anchor heads, rpn/roi for two-stage)
            extras = " ".join(
                f"{k} {float(v):.4f}" for k, v in sorted(metrics.items())
                if k not in ("loss", "grad_norm"))
            print(f"[{i}] loss {float(metrics['loss']):.4f} {extras} "
                  f"{dt * 1e3:.0f} ms")
        if args.save_every and (i + 1) % args.save_every == 0:
            ckpt.save(state[0], step=i + 1, cfg=cfg)
    ckpt.save(state[0], step=args.steps, cfg=cfg)
    print(json.dumps({"steps": args.steps,
                      "final_loss": float(metrics["loss"])}))


if __name__ == "__main__":
    main()
