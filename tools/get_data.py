#!/usr/bin/env python
"""nuScenes acquisition: unsigned S3 download + tar-bomb-guarded extraction.

Re-design of the reference downloader
(src/get-data/get_nuscenes_with_extract.py:16-166): same bucket layout
(`motional-nuscenes` trainval blobs 01..10 + metadata, test tarball), resume
/skip-existing, global progress, and extraction that refuses paths escaping
the target directory. boto3 is optional (gated import; this image is
zero-egress so the CLI exists for deployment environments).
"""
from __future__ import annotations

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import argparse
import pathlib
import sys
import tarfile

BUCKET = "motional-nuscenes"
TRAINVAL_BLOBS = [
    "v1.0-trainval_meta.tgz",
    *[f"v1.0-trainval{i:02d}_blobs.tgz" for i in range(1, 11)],
]
TEST_BLOBS = ["v1.0-test_meta.tgz", "v1.0-test_blobs.tgz"]


def safe_extract(tar_path: pathlib.Path, dest: pathlib.Path) -> int:
    """Extract refusing absolute paths / parent escapes (reference :78-107)."""
    n = 0
    with tarfile.open(tar_path) as tf:
        for member in tf.getmembers():
            target = (dest / member.name).resolve()
            if not str(target).startswith(str(dest.resolve())):
                raise RuntimeError(f"tar-bomb path refused: {member.name}")
            n += 1
        tf.extractall(dest, filter="data")
    return n


def download(files, dest: pathlib.Path, prefix: str = "public/v1.0/") -> None:
    try:
        import boto3
        from botocore import UNSIGNED
        from botocore.config import Config
    except ImportError:
        sys.exit("boto3 is not installed in this environment; download "
                 "nuScenes from a networked machine and point --dataroot at "
                 "the extracted tree")
    s3 = boto3.client("s3", config=Config(signature_version=UNSIGNED))
    dest.mkdir(parents=True, exist_ok=True)
    for i, name in enumerate(files):
        out = dest / name
        if out.exists():
            print(f"[{i + 1}/{len(files)}] {name}: exists, skipping")
            continue
        print(f"[{i + 1}/{len(files)}] {name}: downloading")
        s3.download_file(BUCKET, prefix + name, str(out))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dest", required=True)
    p.add_argument("--split", choices=["trainval", "test"],
                   default="trainval")
    p.add_argument("--extract", action="store_true")
    p.add_argument("--extract-to", default=None)
    args = p.parse_args()

    dest = pathlib.Path(args.dest)
    files = TRAINVAL_BLOBS if args.split == "trainval" else TEST_BLOBS
    download(files, dest)
    if args.extract:
        target = pathlib.Path(args.extract_to or dest / "extracted")
        target.mkdir(parents=True, exist_ok=True)
        for name in files:
            print(f"extracting {name}")
            n = safe_extract(dest / name, target)
            print(f"  {n} members")


if __name__ == "__main__":
    main()
