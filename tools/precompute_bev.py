#!/usr/bin/env python
"""BEV feature precompute — the L2->L4 bridge
(reference src/get-data/precompute_bev_features.py:295-411).

Reads raw nuScenes LIDAR_TOP .pcd.bin files, runs the TPU VoxelNeXt
backbone under jit, and writes one float16 [C, H, W] .npy per sample token.
Skip-existing idempotency makes it re-runnable after a crash (reference
:329-331). The native C++ loader (lvv_tpu.native) decodes .pcd.bin when
built; numpy fallback otherwise.
"""
from __future__ import annotations

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import argparse
import json
import pathlib
import time

import numpy as np


def load_pcd_bin(path: str, max_points: int) -> tuple[np.ndarray, int]:
    """LIDAR_TOP .pcd.bin: float32 N x 5 -> trimmed to N x 4 (x,y,z,intensity;
    reference precompute_bev_features.py:152-170), padded to max_points."""
    try:
        from lvv_tpu.native import load_points  # C++ fast path
        pts, n = load_points(path, max_points)
        return pts, n
    except Exception:
        raw = np.fromfile(path, dtype=np.float32).reshape(-1, 5)[:, :4]
        n = min(len(raw), max_points)
        out = np.zeros((max_points, 4), np.float32)
        out[:n] = raw[:n]
        return out, n


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", required=True)
    p.add_argument("--version", default="v1.0-trainval")
    p.add_argument("--out", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--checkpoint", default=None,
                   help="detector checkpoint (random init if absent)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--limit", type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from lvv_tpu.config import default_config
    from lvv_tpu.models.voxelnext import VoxelNeXtDetector

    cfg = default_config()
    det = VoxelNeXtDetector(det_cfg=cfg.model.voxelnext,
                            vox_cfg=cfg.voxelize)

    try:
        from nuscenes import NuScenes  # optional: devkit + data
        nusc = NuScenes(version=args.version, dataroot=args.dataroot,
                        verbose=False)
    except ImportError:  # devkit-free over the raw JSON tables
        from lvv_tpu.data.nuscenes_tables import TableNuScenes
        nusc = TableNuScenes(version=args.version, dataroot=args.dataroot)
    out_dir = pathlib.Path(args.out) / args.split
    out_dir.mkdir(parents=True, exist_ok=True)

    items = []
    for sample in nusc.sample:
        token = sample["token"]
        if (out_dir / f"{token}.npy").exists():
            continue  # skip-existing idempotency
        sd = nusc.get("sample_data", sample["data"]["LIDAR_TOP"])
        items.append((str(pathlib.Path(args.dataroot) / sd["filename"]),
                      token))
        if args.limit and len(items) >= args.limit:
            break
    print(f"{len(items)} samples to process")

    max_pts = cfg.voxelize.max_points
    example = jnp.zeros((args.batch, max_pts, 4))
    example_n = jnp.zeros((args.batch,), jnp.int32)
    params = det.init(jax.random.PRNGKey(0), example[0], example_n[0])
    if args.checkpoint:
        from lvv_tpu.train.checkpoints import CheckpointManager
        mgr = CheckpointManager(args.checkpoint)
        restored, _ = mgr.try_restore_newest(params)
        if restored is not None:
            params = restored

    @jax.jit
    def forward(pts, ns):
        return jax.vmap(lambda p, n: det.apply(params, p, n)["bev_dense"])(
            pts, ns)

    for i in range(0, len(items), args.batch):
        chunk = items[i:i + args.batch]
        pts = np.zeros((args.batch, max_pts, 4), np.float32)
        ns = np.zeros((args.batch,), np.int32)
        for j, (path, _) in enumerate(chunk):
            pts[j], ns[j] = load_pcd_bin(path, max_pts)
        t0 = time.perf_counter()
        bev = np.asarray(forward(jnp.asarray(pts), jnp.asarray(ns)))
        dt = (time.perf_counter() - t0) * 1000
        for j, (_, token) in enumerate(chunk):
            np.save(out_dir / f"{token}.npy", bev[j].astype(np.float16))
        print(f"[{i + len(chunk)}/{len(items)}] {dt:.1f} ms/batch")


if __name__ == "__main__":
    main()
