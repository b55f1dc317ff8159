#!/usr/bin/env python
"""Build ONCE info pickles from the raw archive (the reference's
`python -m pcdet.datasets.once.once_dataset --func create_once_infos`
equivalent, once_dataset.py:155-292 + 465-505). Pure json+numpy — ONCE
needs no devkit.

Writes `once_infos_<split>.pkl` under --save-dir. Splits read
`<raw-dir>/ImageSets/<split>.txt` when present, else decode every
sequence dir under `<raw-dir>/data/`.
"""
from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from lvv_tpu.data import once_decode as odec  # noqa: E402

from lvv_tpu.data.gt_sampler import \
    build_gt_database_from_infos as _build_gt_db  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--raw-dir", required=True,
                    help="ONCE root (holds data/<seq>/ and ImageSets/)")
    ap.add_argument("--save-dir", required=True)
    ap.add_argument("--splits", nargs="+", default=["train", "val"])
    ap.add_argument("--no-point-counts", action="store_true",
                    help="skip num_points_in_gt (no .bin reads)")
    ap.add_argument("--gt-db-min-points", type=int, default=5)
    ap.add_argument("--with-gt-db", action="store_true",
                    help="build the gt-paste database from the train "
                         "split (reference create_groundtruth_database)")
    args = ap.parse_args()

    out = odec.create_once_infos(args.raw_dir, args.save_dir,
                                 splits=args.splits,
                                 count_points=not args.no_point_counts)
    for split, infos in out.items():
        print(f"[{split}] {len(infos)} frames -> "
              f"{args.save_dir}/once_infos_{split}.pkl")
    if args.with_gt_db and out.get("train"):
        from lvv_tpu.data.detection_dataset import ONCEDetection
        raw = pathlib.Path(args.raw_dir)
        data_dir = raw / "data" if (raw / "data").is_dir() else raw
        _build_gt_db(ONCEDetection, data_dir, out["train"],
                     ONCEDetection.CLASSES,
                     pathlib.Path(args.save_dir)
                     / "once_gt_database_train.pkl",
                     point_range=(-80, -80, -5, 80, 80, 5),
                     max_points=400000,
                     min_points=args.gt_db_min_points)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
