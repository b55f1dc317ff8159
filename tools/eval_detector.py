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
    p.add_argument("--detector", default=None,
                   help="registry family; defaults to the preset's "
                        "_detector meta key, else VoxelNeXt")
    p.add_argument("--dataset", default="Custom")
    p.add_argument("--data-root", required=True)
    p.add_argument("--info-path", default=None,
                   help="info pickle for info-driven datasets "
                        "(Waymo/ONCE/Lyft/Pandaset/Argo2/NuScenes)")
    p.add_argument("--metric", default="nuscenes",
                   choices=["nuscenes", "kitti", "kitti_official", "waymo",
                            "waymo_official", "once", "lyft", "argo2"],
                   help="which evaluation suite scores the detections")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--config", default=None)
    p.add_argument("--set", action="append", default=[], dest="overrides")
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--watch", action="store_true",
                   help="re-evaluate as new checkpoints appear "
                        "(reference repeat_eval_ckpt)")
    p.add_argument("--out", default=None)
    p.add_argument("--tiny", action="store_true",
                   help="tiny_config shapes (CPU smoke on real data)")
    p.add_argument("--submission", default=None,
                   help="write suite-native submission artifacts here "
                        "(nuScenes results.json / KITTI label txts / "
                        "Argo2 feather / Pandaset prediction pkls; "
                        "others: detections JSON)")
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
           else C.apply_overrides(C.tiny_config() if args.tiny
                                  else C.default_config(), args.overrides))
    detector = args.detector or (
        C.load_file(args.config).get("_detector") if args.config else None
    ) or "VoxelNeXt"
    det = build_detector(detector, cfg.model.voxelnext, cfg.voxelize)
    ds_kw = dict(point_range=cfg.voxelize.point_range,
                 max_points=cfg.voxelize.max_points)
    if args.dataset in ("Custom", "Kitti"):
        ds_kw["root"] = args.data_root
    else:
        ds_kw["dataroot"] = args.data_root
        if args.info_path:
            ds_kw["info_path"] = args.info_path
    ds = build_dataset(args.dataset, **ds_kw)

    n = len(ds) if not args.limit else min(args.limit, len(ds))
    sample0 = ds[0]
    # full feature width, matching what tools/train_detector.py trains
    # with — otherwise trained checkpoints could never restore here
    params = det.init(jax.random.PRNGKey(0),
                      jnp.asarray(sample0["points"]),
                      jnp.asarray(sample0["num_points"]))
    seen = set()

    def load_ckpt(required: bool = False):
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
        if required and not seen:
            raise SystemExit(
                f"--checkpoint {args.checkpoint} could not be restored "
                "(shape mismatch or no checkpoint found) — refusing to "
                "score random-init params")
        return False

    detect = jax.jit(lambda p, pts, np_: det.apply(
        p, pts, np_, method=type(det).detect))

    def run_eval():
        classes = list(getattr(ds, "CLASSES",
                               cfg.model.voxelnext.class_names))
        recalls, records, times = [], [], []
        for i in range(n):
            s = ds[i]
            t0 = time.perf_counter()
            d = detect(params, jnp.asarray(s["points"]),
                       jnp.asarray(s["num_points"]))
            cnt = int(d.count)
            boxes = np.asarray(d.boxes[:cnt])
            times.append(time.perf_counter() - t0)
            gt_n = int(s["gt_mask"].sum())
            rec = {"boxes": boxes,
                   "labels": np.asarray(d.labels[:cnt]),
                   "scores": np.asarray(d.scores[:cnt]),
                   "gt_boxes": np.asarray(s["gt_boxes"][:gt_n]),
                   "gt_labels": np.asarray(s["gt_labels"][:gt_n]),
                   "token": s.get("token", str(i))}
            records.append(rec)
            recalls.append(recall_stats(boxes, cnt, rec["gt_boxes"]))
        agg = {}
        if recalls:
            for k in recalls[0]:
                agg[k] = float(np.mean([r[k] for r in recalls]))
        agg.update(score_records(records, classes, args.metric))
        agg["sec_per_example"] = float(np.mean(times[1:])) if len(times) > 1 \
            else float(times[0])
        return agg, records

    def score_records(records, classes, metric):
        """Adapt per-sample detections to the chosen suite's anno format
        (nuScenes mAP/NDS, KITTI R40 [+official difficulty], Waymo AP/APH,
        ONCE benchmark, Lyft devkit mAP)."""
        names = np.asarray(classes)

        def nm(lbl):
            if len(lbl) == 0:
                return np.asarray([], dtype=names.dtype)
            return names[np.clip(lbl, 0, len(names) - 1)]

        if metric == "nuscenes":
            preds_by_cls, gts_by_cls = {}, {}
            for r in records:
                for ci, cname in enumerate(classes):
                    preds_by_cls.setdefault(cname, []).append(
                        {"boxes": r["boxes"][r["labels"] == ci],
                         "scores": r["scores"][r["labels"] == ci]})
                    gts_by_cls.setdefault(cname, []).append(
                        {"boxes": r["gt_boxes"][r["gt_labels"] == ci]})
            return evaluate(preds_by_cls, gts_by_cls, classes)
        if metric == "kitti":
            from lvv_tpu.train.kitti_eval import evaluate_kitti
            preds = [{c: {"boxes": r["boxes"][r["labels"] == ci][:, :7],
                          "scores": r["scores"][r["labels"] == ci]}
                      for ci, c in enumerate(classes)} for r in records]
            gts = [{c: {"boxes": r["gt_boxes"][r["gt_labels"] == ci][:, :7]}
                    for ci, c in enumerate(classes)} for r in records]
            return evaluate_kitti(preds, gts, classes)
        if metric == "kitti_official":
            from lvv_tpu.train.kitti_eval import evaluate_kitti_official
            gts = [{"name": nm(r["gt_labels"]),
                    "boxes": r["gt_boxes"][:, :7]} for r in records]
            preds = [{"name": nm(r["labels"]), "boxes": r["boxes"][:, :7],
                      "score": r["scores"]} for r in records]
            out = evaluate_kitti_official(gts, preds, classes)
            out.update(evaluate_kitti_official(gts, preds, classes,
                                               mode="bev"))
            return out
        if metric in ("waymo", "waymo_official"):
            # waymo: fast greedy/continuous curve (watch loops).
            # waymo_official: Hungarian matching at the reference's 101
            # fixed score cutoffs (waymo_eval.py:92-112) — use for
            # reported numbers. Measured greedy-vs-official delta:
            # mean |dAP| 0.0023, max 0.024 on randomized scenes
            # (benchmarks/waymo_eval_delta.json).
            from lvv_tpu.train.waymo_eval import evaluate as waymo_eval
            from lvv_tpu.train.waymo_eval import evaluate_official
            gts = [{"name": nm(r["gt_labels"]),
                    "gt_boxes_lidar": r["gt_boxes"][:, :7]}
                   for r in records]
            preds = [{"name": nm(r["labels"]),
                      "boxes_lidar": r["boxes"][:, :7],
                      "score": r["scores"]} for r in records]
            fn = (evaluate_official if metric == "waymo_official"
                  else waymo_eval)
            return fn(gts, preds, classes)
        if metric == "argo2":
            from lvv_tpu.train.argo2_eval import evaluate as argo2_eval
            gts = [{"name": nm(r["gt_labels"]),
                    "gt_boxes_lidar": r["gt_boxes"][:, :7]}
                   for r in records]
            preds = [{"name": nm(r["labels"]),
                      "boxes_lidar": r["boxes"][:, :7],
                      "score": r["scores"]} for r in records]
            return argo2_eval(gts, preds, classes)
        if metric == "once":
            from lvv_tpu.train.once_eval import get_evaluation_results
            gts = [{"name": nm(r["gt_labels"]),
                    "boxes_3d": r["gt_boxes"][:, :7]} for r in records]
            preds = [{"name": nm(r["labels"]),
                      "boxes_3d": r["boxes"][:, :7],
                      "score": r["scores"]} for r in records]
            table, res = get_evaluation_results(gts, preds, list(classes),
                                                use_superclass=False)
            print(table)
            return res
        from lvv_tpu.train.lyft_eval import evaluate as lyft_eval
        gts = [{"sample_token": r["token"], "name": nm(r["gt_labels"]),
                "boxes": r["gt_boxes"][:, :7]} for r in records]
        preds = [{"sample_token": r["token"], "name": nm(r["labels"]),
                  "boxes": r["boxes"][:, :7], "score": r["scores"]}
                 for r in records]
        return lyft_eval(gts, preds, classes)

    def write_submission(records, sub_dir):
        """Suite-native submission artifacts (reference
        generate_prediction_dicts / format_results per dataset)."""
        classes = list(getattr(ds, "CLASSES",
                               cfg.model.voxelnext.class_names))
        names = np.asarray(classes)
        sub = _pathlib.Path(sub_dir)
        sub.mkdir(parents=True, exist_ok=True)

        def select(r):
            """Keep only dets whose label maps to a dataset class —
            clipping would silently mislabel submission boxes."""
            keep = (r["labels"] >= 0) & (r["labels"] < len(names))
            return (names[r["labels"][keep]], r["boxes"][keep],
                    r["scores"][keep])

        if args.dataset == "NuScenes":
            from lvv_tpu.data.dataset import make_nusc_handle
            from lvv_tpu.data.nuscenes_utils import write_nusc_results
            nusc = make_nusc_handle(args.data_root)
            if nusc is None:
                print("[submission] no nuScenes tables; skipping")
                return
            dets = []
            for r in records:
                nms_, boxes_, scores_ = select(r)
                dets.append({"token": r["token"], "boxes_lidar": boxes_,
                             "score": scores_, "name": nms_})
            write_nusc_results(dets, nusc, sub / "results_nusc.json")
            print(f"[submission] {sub / 'results_nusc.json'}")
        elif args.dataset == "Kitti":
            from lvv_tpu.data.kitti_dataset import (parse_calib,
                                                    write_kitti_results)
            root = _pathlib.Path(args.data_root)
            for r in records:
                calib_path = root / "calib" / f"{r['token']}.txt"
                if not calib_path.exists():
                    continue
                nms_, boxes_, scores_ = select(r)
                write_kitti_results(r["token"], boxes_[:, :7], scores_,
                                    nms_, parse_calib(calib_path), sub)
            print(f"[submission] label txts under {sub}")
        elif args.dataset == "Argo2":
            from lvv_tpu.data.argo2_decode import format_results
            outputs = []
            for r in records:
                nms_, boxes_, scores_ = select(r)
                outputs.append({"name": nms_, "boxes": boxes_[:, :7],
                                "score": scores_})
            format_results(outputs, ds.infos[:len(outputs)],
                           out_path=sub / "argo2_dts.feather")
            print(f"[submission] {sub / 'argo2_dts.feather'}")
        elif args.dataset == "Pandaset":
            from lvv_tpu.data.pandaset_decode import (export_predictions,
                                                      pose_to_matrix)
            for r, info in zip(records, ds.infos):
                pose_vec = info.get("pose")
                if pose_vec is None:
                    continue
                pose = dict(position=dict(x=pose_vec[0], y=pose_vec[1],
                                          z=pose_vec[2]),
                            heading=dict(w=pose_vec[3], x=pose_vec[4],
                                         y=pose_vec[5], z=pose_vec[6]))
                seq = str(info.get("sequence", "000"))
                fid = int(info.get("frame_idx", 0))
                nms_, boxes_, scores_ = select(r)
                export_predictions(
                    boxes_[:, :7], scores_, nms_,
                    pose, float(info.get("zrot_world_to_ego", 0.0)),
                    save_path=sub / seq / "predictions" / "cuboids"
                    / f"{fid:02d}.pkl.gz")
            print(f"[submission] prediction pkls under {sub}")
        else:
            payload = []
            for r in records:
                nms_, boxes_, scores_ = select(r)
                payload.append({"token": r["token"],
                                "boxes": boxes_.tolist(),
                                "scores": scores_.tolist(),
                                "name": nms_.tolist()})
            (sub / "detections.json").write_text(json.dumps(payload))
            print(f"[submission] {sub / 'detections.json'}")

    load_ckpt(required=True)
    result, records = run_eval()
    out = {k: v for k, v in result.items() if k != "per_class"}
    print(json.dumps(out, indent=2, default=str))
    if args.out:
        _pathlib.Path(args.out).write_text(
            json.dumps(result, indent=2, default=str))
    if args.submission:
        write_submission(records, args.submission)
    while args.watch:
        time.sleep(30)
        if load_ckpt():
            print(json.dumps({k: v for k, v in run_eval()[0].items()
                              if k != "per_class"}, indent=2, default=str))


if __name__ == "__main__":
    main()
