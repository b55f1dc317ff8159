#!/usr/bin/env python
"""Multi-frame VQA demo — batched preprocessing + sequential-scene VQA with
rerun trace export (BASELINE.json config 5; reference analogue: the
rerun-visualization scripts only stream raw sensors — the reference never
wired VQA answers into the trace).

Frames spec (--frames frames.json): list of rows
    {"bev_path": str[, "cam_paths": [6 paths]][, "points_path": str]
     [, "question": str]}
`--question` is the fallback applied to rows without one. Answers are
generated through the dynamic-batching ServingEngine (all frames submitted
up front, so the engine coalesces them into batch buckets), then:

- answers + latencies dump to --out (JSONL);
- if rerun is importable, each frame logs LiDAR points (when points_path
  given) plus the question/answer as a TextDocument on a frame timeline;
  --rrd persists the stream.

    python tools/demo_vqa.py --checkpoint runs/ckpt \
        --frames frames.json --out answers.jsonl --rrd trace.rrd
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


def run_frames(engine, rows, bev_root: pathlib.Path, question: str):
    """Submit every frame, then resolve in order -> list of result dicts."""
    futs = []
    for r in rows:
        bev = np.load(bev_root / r["bev_path"]).astype(np.float32)
        futs.append(engine.submit_text(r.get("question", question), bev,
                                       r.get("cam_paths"),
                                       frame_id=r["bev_path"]))
    out = []
    for r, f in zip(rows, futs):
        t0 = time.perf_counter()
        _, text = f.result()
        out.append({"bev_path": r["bev_path"],
                    "question": r.get("question", question),
                    "answer": text,
                    "wait_s": round(time.perf_counter() - t0, 4)})
    return out


def export_rerun(rows, results, bev_root: pathlib.Path, rrd: str = None):
    """Log points + Q/A per frame; returns False when rerun is absent."""
    from lvv_tpu.viz.rerun_viz import RERUN_AVAILABLE
    if not RERUN_AVAILABLE:
        return False
    import rerun as rr
    rr.init("lvv_vqa_demo", spawn=False)
    if rrd:
        rr.save(rrd)
    for i, (r, res) in enumerate(zip(rows, results)):
        rr.set_time_sequence("frame", i)
        if r.get("points_path"):
            pts = np.load(bev_root / r["points_path"])
            rr.log("scene/lidar", rr.Points3D(pts[:, :3]))
        rr.log("scene/qa", rr.TextDocument(
            f"Q: {res['question']}\nA: {res['answer']}"))
    return True


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--frames", required=True, help="frames JSON (see doc)")
    p.add_argument("--question", default="Describe the scene.")
    p.add_argument("--bev-root", default=".",
                   help="paths in frames.json resolve against this")
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-new-tokens", type=int, default=96)
    p.add_argument("--prefix-cache", type=int, default=16,
                   help="frames of encoded-prefix LRU (0 disables); rows "
                        "sharing a bev_path encode once")
    p.add_argument("--out", default=None, help="answers JSONL path")
    p.add_argument("--rrd", default=None, help="persist rerun stream")
    args = p.parse_args()

    from lvv_tpu.inference import ModelLoader
    from lvv_tpu.inference.server import ServingEngine

    loader = ModelLoader(args.checkpoint, args.tokenizer)
    model, params = loader.load_all()
    rows = json.loads(pathlib.Path(args.frames).read_text())
    bev_root = pathlib.Path(args.bev_root)

    t0 = time.perf_counter()
    with ServingEngine(model, params, loader.tokenizer,
                       max_batch=args.max_batch,
                       max_new_tokens=args.max_new_tokens,
                       prefix_cache_size=args.prefix_cache) as engine:
        results = run_frames(engine, rows, bev_root, args.question)
        stats = engine.stats()
    wall = time.perf_counter() - t0

    for res in results:
        print(f"[{res['bev_path']}] Q: {res['question']}\n"
              f"  A: {res['answer']}")
    print(f"{len(rows)} frames in {wall:.2f}s "
          f"({len(rows) / max(wall, 1e-9):.2f} frames/s), "
          f"batches: {stats['batch_sizes']}")

    if args.out:
        with open(args.out, "w") as f:
            for res in results:
                f.write(json.dumps(res) + "\n")
    if export_rerun(rows, results, bev_root, args.rrd):
        print("rerun trace logged" + (f" -> {args.rrd}" if args.rrd else ""))
    else:
        print("rerun-sdk not installed; skipped trace export")


if __name__ == "__main__":
    main()
