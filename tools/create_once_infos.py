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


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--raw-dir", required=True,
                    help="ONCE root (holds data/<seq>/ and ImageSets/)")
    ap.add_argument("--save-dir", required=True)
    ap.add_argument("--splits", nargs="+", default=["train", "val"])
    ap.add_argument("--no-point-counts", action="store_true",
                    help="skip num_points_in_gt (no .bin reads)")
    args = ap.parse_args()

    out = odec.create_once_infos(args.raw_dir, args.save_dir,
                                 splits=args.splits,
                                 count_points=not args.no_point_counts)
    for split, infos in out.items():
        print(f"[{split}] {len(infos)} frames -> "
              f"{args.save_dir}/once_infos_{split}.pkl")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
