#!/usr/bin/env python
"""Create Lyft Level-5 info files (the reference's
`python -m pcdet.datasets.lyft.lyft_dataset --func create_lyft_infos`
equivalent, lyft/lyft_utils.py:86-231 + lyft_dataset.py:226-257).

Devkit-free: Lyft ships nuScenes-schema JSON tables, which
lvv_tpu.data.nuscenes_tables.TableNuScenes reads directly. Splits come
from --scene-splits (JSON {"train": [scene names], "val": [...]}); with
none given, every scene goes into train (Lyft's official split is by
user choice — the reference reads ImageSets txt files).

Writes `lyft_infos_{train,val}.pkl` under --save-dir.
"""
from __future__ import annotations

import argparse
import json
import pathlib
import pickle
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataroot", required=True)
    ap.add_argument("--table-dir", default=None,
                    help="dir holding the JSON tables (default "
                         "<dataroot>/train_data, falling back to "
                         "<dataroot>/data)")
    ap.add_argument("--save-dir", default=None)
    ap.add_argument("--max-sweeps", type=int, default=10)
    ap.add_argument("--scene-splits", default=None,
                    help='JSON file {"train": [...], "val": [...]}')
    args = ap.parse_args()

    from lvv_tpu.data.nuscenes_tables import TableNuScenes
    from lvv_tpu.data.nuscenes_utils import fill_trainval_infos_lyft

    root = pathlib.Path(args.dataroot)
    table_dir = args.table_dir
    if table_dir is None:
        for cand in ("train_data", "data"):
            if (root / cand).is_dir():
                table_dir = str(root / cand)
                break
    if table_dir is None:
        raise SystemExit("no table dir found; pass --table-dir")
    nusc = TableNuScenes(version="", dataroot=args.dataroot,
                         table_dir=table_dir, verbose=True)

    if args.scene_splits:
        named = json.loads(pathlib.Path(args.scene_splits).read_text())
        train_names = set(named.get("train", []))
        val_names = set(named.get("val", []))
    else:
        train_names = {s["name"] for s in nusc.scene}
        val_names = set()
    train_toks, val_toks = nusc.scene_splits(train_names, val_names)

    train, val = fill_trainval_infos_lyft(
        nusc, train_toks, val_toks, max_sweeps=args.max_sweeps,
        dataroot=args.dataroot)
    save_dir = pathlib.Path(args.save_dir or args.dataroot)
    save_dir.mkdir(parents=True, exist_ok=True)
    with open(save_dir / "lyft_infos_train.pkl", "wb") as f:
        pickle.dump(train, f)
    print(f"train samples: {len(train)}")
    with open(save_dir / "lyft_infos_val.pkl", "wb") as f:
        pickle.dump(val, f)
    print(f"val samples: {len(val)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
