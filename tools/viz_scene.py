#!/usr/bin/env python
"""Stream a nuScenes scene (LiDAR + cameras) to rerun.io.

Reference L5 equivalent: src/rerun-visualization/
nusc_rerun_demo_noargs.py (symlink-bridge dataroot, one scene's
LIDAR_TOP + 6 cameras streamed, optional .rrd persistence). Devkit-free:
the raw JSON tables drive it through TableNuScenes (the devkit is used
when importable).
"""
from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

CAMS = ("CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT", "CAM_BACK",
        "CAM_BACK_RIGHT", "CAM_BACK_LEFT")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataroot", required=True)
    ap.add_argument("--version", default=None,
                    help="table dir (autodetected when omitted)")
    ap.add_argument("--scene", default=None,
                    help="scene name (e.g. scene-0061) or token; "
                         "defaults to the first scene")
    ap.add_argument("--rrd", default=None,
                    help="save to .rrd instead of spawning the viewer")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--no-cameras", action="store_true")
    ap.add_argument("--boxes", action="store_true",
                    help="overlay sensor-frame gt boxes")
    args = ap.parse_args()

    from lvv_tpu.data.dataset import make_nusc_handle
    from lvv_tpu.viz.rerun_viz import stream_scene

    if args.version:
        from lvv_tpu.data.nuscenes_tables import TableNuScenes
        nusc = TableNuScenes(version=args.version, dataroot=args.dataroot)
    else:
        nusc = make_nusc_handle(args.dataroot)
        if nusc is None:
            raise SystemExit(f"no nuScenes tables under {args.dataroot}")

    token = None
    for s in nusc.scene:
        if args.scene in (None, s["name"], s["token"]):
            token = s["token"]
            break
    if token is None:
        raise SystemExit(f"scene {args.scene!r} not found")

    n = stream_scene(nusc, token, rrd_path=args.rrd,
                     max_frames=args.max_frames,
                     cameras=() if args.no_cameras else CAMS,
                     with_boxes=args.boxes)
    print(f"streamed {n} keyframes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
