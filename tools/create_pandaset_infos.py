#!/usr/bin/env python
"""Decode raw Pandaset pkl.gz archives into npy points + info pickles.

Reference equivalent: `python pandaset_dataset.py create_pandaset_infos`
(pcdet/datasets/pandaset/pandaset_dataset.py:446-483), which needs the
``pandaset`` devkit. This CLI is devkit-free on top of
lvv_tpu.data.pandaset_decode (pure numpy quaternion geometry + pandas
pickles, unit-tested against hand-built scenes).

Writes `<save-dir>/<seq>/{NN}.npy` + `pandaset_infos_<split>.pkl`.
Splits default to the reference yaml's train/val/test sequence lists;
override with --sequences to decode an explicit list into one split.
"""
from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from lvv_tpu.data import pandaset_decode as pdec  # noqa: E402

# reference tools/cfgs/dataset_configs/pandaset_dataset.yaml:11-15
REFERENCE_SPLITS = {
    "train": ['014', '050', '079', '048', '093', '091', '063', '104',
              '100', '092', '012', '047', '018', '006', '099', '085',
              '035', '041', '052', '105', '030', '113', '002', '084',
              '028', '119', '044', '005', '102', '034', '077', '064',
              '067', '058', '019', '015', '037', '095', '120', '066',
              '023', '071', '117', '098', '139', '038', '116', '046',
              '088', '089', '040', '033', '016', '024', '122', '039',
              '158', '069', '124', '123', '106'],
    "val": ['045', '059', '055', '051', '020', '097', '073', '043',
            '003', '101', '027', '056', '011', '078', '080', '109',
            '042', '021', '094', '057'],
    "test": ['074', '004', '086', '062', '068', '008', '001', '110',
             '053', '115', '054', '065', '017', '103', '072', '013',
             '029', '090', '112', '149', '070', '032'],
}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--raw-dir", required=True,
                    help="Pandaset root (holds dataset/<seq>/...)")
    ap.add_argument("--save-dir", required=True)
    ap.add_argument("--splits", nargs="+", default=["train", "val"])
    ap.add_argument("--sequences", nargs="+", default=None,
                    help="explicit sequence ids; decoded into the first "
                         "--splits name")
    ap.add_argument("--lidar-device", type=int, default=0,
                    help="0 pandar64 (default), 1 pandarGT, -1 both")
    ap.add_argument("--raw-categories", action="store_true",
                    help="keep raw labels instead of the reference "
                         "TRAINING_CATEGORIES mapping")
    args = ap.parse_args()

    if args.sequences:
        splits = {args.splits[0]: args.sequences}
    else:
        splits = {s: REFERENCE_SPLITS[s] for s in args.splits}
    cat_map = None if args.raw_categories else pdec.TRAINING_CATEGORIES
    out = pdec.create_infos(args.raw_dir, args.save_dir, splits,
                            device=args.lidar_device,
                            category_map=cat_map)
    for split, infos in out.items():
        print(f"[{split}] {len(infos)} frames -> "
              f"{args.save_dir}/pandaset_infos_{split}.pkl")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
