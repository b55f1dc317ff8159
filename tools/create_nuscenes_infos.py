#!/usr/bin/env python
"""Create nuScenes info files + gt database (the reference's
`python -m pcdet.datasets.nuscenes.nuscenes_dataset --func
create_nuscenes_infos` equivalent, nuscenes_dataset.py:357-434).

Writes `nuscenes_infos_{N}sweeps_{train,val}.pkl` under --save-dir and,
with --with-gt-db, the per-box point-cluster database for the gt-paste
augmentor (lvv_tpu.data.gt_sampler).

Runs with the nuscenes devkit when present, else devkit-free over the
raw JSON tables (lvv_tpu.data.nuscenes_tables.TableNuScenes — everything
underneath lvv_tpu.data.nuscenes_utils is duck-typed and unit-tested on
fabricated tables). Without the devkit the official trainval scene-name
split is not available; pass --scene-splits (a JSON file
{"train": [...scene names...], "val": [...]}) — v1.0-mini's split is
built in.
"""
from __future__ import annotations

import argparse
import json
import pathlib
import pickle
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# devkit nuscenes/utils/splits.py mini lists (10 scenes; the full
# trainval lists are 850 names — supply them via --scene-splits)
MINI_TRAIN = ["scene-0061", "scene-0553", "scene-0655", "scene-0757",
              "scene-0796", "scene-1077", "scene-1094", "scene-1100"]
MINI_VAL = ["scene-0103", "scene-0916"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataroot", required=True)
    ap.add_argument("--version", default="v1.0-trainval",
                    choices=["v1.0-trainval", "v1.0-test", "v1.0-mini"])
    ap.add_argument("--save-dir", default=None)
    ap.add_argument("--max-sweeps", type=int, default=10)
    ap.add_argument("--with-gt-db", action="store_true")
    ap.add_argument("--scene-splits", default=None,
                    help='JSON file {"train": [scene names], "val": [...]}'
                         " (devkit-free trainval split source)")
    args = ap.parse_args()

    from lvv_tpu.data.nuscenes_utils import (
        create_groundtruth_database, fill_trainval_infos)

    save_dir = pathlib.Path(args.save_dir or args.dataroot)
    save_dir.mkdir(parents=True, exist_ok=True)
    splits = None
    try:
        from nuscenes import NuScenes
        from nuscenes.utils import splits
        nusc = NuScenes(version=args.version, dataroot=args.dataroot,
                        verbose=True)
    except ImportError:
        from lvv_tpu.data.nuscenes_tables import TableNuScenes
        nusc = TableNuScenes(version=args.version, dataroot=args.dataroot,
                             verbose=True)

    if args.scene_splits:
        named = json.loads(pathlib.Path(args.scene_splits).read_text())
        split = (named.get("train", []), named.get("val", []))
    elif splits is not None:
        split = {"v1.0-trainval": (splits.train, splits.val),
                 "v1.0-test": (splits.test, []),
                 "v1.0-mini": (splits.mini_train, splits.mini_val)
                 }[args.version]
    elif args.version == "v1.0-mini":
        split = (MINI_TRAIN, MINI_VAL)
    elif args.version == "v1.0-test":
        split = ([s["name"] for s in nusc.scene], [])
    else:
        raise SystemExit("devkit absent: pass --scene-splits for "
                         "v1.0-trainval (official 700/150 scene lists)")
    name_to_tok = {nusc.get("scene", s["token"])["name"]: s["token"]
                   for s in nusc.scene}
    train_toks = [name_to_tok[n] for n in split[0] if n in name_to_tok]
    val_toks = [name_to_tok[n] for n in split[1] if n in name_to_tok]

    train, val = fill_trainval_infos(
        nusc, train_toks, val_toks, max_sweeps=args.max_sweeps,
        dataroot=args.dataroot)
    tag = "test" if args.version == "v1.0-test" else "train"
    with open(save_dir / f"nuscenes_infos_{args.max_sweeps}sweeps_{tag}.pkl",
              "wb") as f:
        pickle.dump(train, f)
    print(f"{tag} samples: {len(train)}")
    if val:
        with open(save_dir /
                  f"nuscenes_infos_{args.max_sweeps}sweeps_val.pkl",
                  "wb") as f:
            pickle.dump(val, f)
        print(f"val samples: {len(val)}")

    if args.with_gt_db and tag == "train":
        db = create_groundtruth_database(
            train, save_dir / f"gt_database_{args.max_sweeps}sweeps",
            root=pathlib.Path(args.dataroot), max_sweeps=args.max_sweeps)
        for k, v in sorted(db.items()):
            print(f"gt database {k}: {len(v)}")


if __name__ == "__main__":
    main()
