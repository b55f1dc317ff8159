#!/usr/bin/env python
"""Decode Argoverse 2 sensor-dataset feather files into velodyne bins +
info pickles.

Reference equivalent: `python argo2_dataset.py` offline prepare
(pcdet/datasets/argo2/argo2_dataset.py:109-167), which needs the av2
devkit + torch/kornia. This CLI is devkit-free on top of
lvv_tpu.data.argo2_decode (pyarrow feather IO + numpy quaternion yaw).

Writes `<save-dir>/{training,testing}/velodyne/<sample_idx>.bin` and
`<save-dir>/argo2_infos_<split>.pkl`.
"""
from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from lvv_tpu.data import argo2_decode as adec  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--raw-dir", required=True,
                    help="av2 root (holds sensor/<split>/<segment>/...)")
    ap.add_argument("--save-dir", required=True)
    ap.add_argument("--splits", nargs="+", default=["train", "val"])
    ap.add_argument("--no-bin", action="store_true",
                    help="write infos only (update_info_only mode)")
    args = ap.parse_args()

    out = adec.create_argo2_infos(args.raw_dir, args.save_dir,
                                  splits=args.splits,
                                  save_bin=not args.no_bin)
    for split, infos in out.items():
        print(f"[{split}] {len(infos)} frames -> "
              f"{args.save_dir}/argo2_infos_{split}.pkl")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
