#!/usr/bin/env python
"""Decode Waymo tfrecords into per-frame .npy points + info pickles.

The reference's offline step (`python -m pcdet.datasets.waymo.waymo_dataset
--func create_waymo_infos`, waymo_dataset.py:174-212 + waymo_utils.py:
197-266) needs tensorflow + the waymo_open_dataset compiled protos.  This
CLI runs the same pipeline devkit-free on lvv_tpu.data.waymo_decode (pure
numpy tfrecord/proto/range-image decoding, unit-tested against fabricated
frames in tests/test_waymo_decode.py).

Layout written (identical to the reference's):

    <save-dir>/<processed_tag>/<sequence>/{0000.npy, ..., <sequence>.pkl}
    <save-dir>/waymo_infos_<split>.pkl        (aggregated across sequences)

Splits come from `<raw-dir>/ImageSets/<split>.txt` when present (one
`segment-....tfrecord` name per line, reference waymo_dataset.py:30-31);
otherwise every *.tfrecord under --raw-dir goes into one split.
"""
from __future__ import annotations

import argparse
import pathlib
import pickle
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from lvv_tpu.data import waymo_decode as wd  # noqa: E402

from lvv_tpu.data.gt_sampler import \
    build_gt_database_from_infos as _build_gt_db  # noqa: E402


def sequence_files(raw_dir: pathlib.Path, split: str):
    imageset = raw_dir / "ImageSets" / f"{split}.txt"
    if imageset.exists():
        names = [ln.strip() for ln in imageset.read_text().splitlines()
                 if ln.strip()]
        return [raw_dir / "raw_data" / n if (raw_dir / "raw_data").is_dir()
                else raw_dir / n for n in names]
    return None


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--raw-dir", required=True,
                    help="dir holding *.tfrecord (and optional ImageSets/)")
    ap.add_argument("--save-dir", required=True)
    ap.add_argument("--splits", nargs="+", default=["train", "val"])
    ap.add_argument("--processed-tag", default="waymo_processed_data")
    ap.add_argument("--sampled-interval", type=int, default=1,
                    help="keep every Nth frame (reference DATA_SPLIT "
                         "sampling)")
    ap.add_argument("--single-return", action="store_true",
                    help="drop the second lidar return")
    ap.add_argument("--no-labels", action="store_true")
    ap.add_argument("--verify-crc", action="store_true")
    ap.add_argument("--gt-db-min-points", type=int, default=5)
    ap.add_argument("--with-gt-db", action="store_true",
                    help="build the gt-paste database from the train "
                         "split (reference create_waymo_gt_database)")
    args = ap.parse_args()

    raw_dir = pathlib.Path(args.raw_dir)
    save_dir = pathlib.Path(args.save_dir)
    proc_dir = save_dir / args.processed_tag
    proc_dir.mkdir(parents=True, exist_ok=True)

    no_imageset = [s for s in args.splits
                   if not (raw_dir / "ImageSets" / f"{s}.txt").exists()]
    if no_imageset and len(args.splits) > 1:
        raise SystemExit(
            f"no ImageSets/<split>.txt for {no_imageset}: decoding every "
            "tfrecord into multiple splits would duplicate train data "
            "into val — provide ImageSets lists or pass a single split")
    for split in args.splits:
        files = sequence_files(raw_dir, split)
        if files is None:
            files = sorted(raw_dir.glob("**/*.tfrecord"))
        if not files:
            print(f"[{split}] no tfrecords found, skipping")
            continue
        all_infos = []
        for i, f in enumerate(files):
            if not f.exists():
                print(f"[{split}] MISSING {f}, skipping")
                continue
            infos = wd.decode_sequence(
                f, proc_dir, sampled_interval=args.sampled_interval,
                has_label=not args.no_labels,
                use_two_returns=not args.single_return,
                verify_crc=args.verify_crc)
            all_infos.extend(infos)
            print(f"[{split}] {i + 1}/{len(files)} {f.name}: "
                  f"{len(infos)} frames")
        out = save_dir / f"waymo_infos_{split}.pkl"
        with open(out, "wb") as fh:
            pickle.dump(all_infos, fh)
        print(f"[{split}] wrote {len(all_infos)} infos -> {out}")
        if args.with_gt_db and split == "train" and all_infos:
            from lvv_tpu.data.detection_dataset import WaymoDetection
            _build_gt_db(WaymoDetection, proc_dir, all_infos,
                         WaymoDetection.CLASSES,
                         save_dir / "waymo_gt_database_train.pkl",
                         point_range=(-80, -80, -5, 80, 80, 5),
                         max_points=400000,
                     min_points=args.gt_db_min_points)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
