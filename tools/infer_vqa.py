#!/usr/bin/env python
"""VQA inference CLI — interactive and batch modes
(reference src/encoder-decoder/infer.py:27-389).

Batch mode: --questions file.json (rows: {question, bev_path[, cam_paths]})
Interactive: --interactive --bev path/to/token.npy
"""
from __future__ import annotations

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import argparse
import json
import pathlib

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--questions", default=None, help="batch questions JSON")
    p.add_argument("--interactive", action="store_true")
    p.add_argument("--bev", default=None, help="BEV .npy for interactive")
    p.add_argument("--max-new-tokens", type=int, default=96)
    p.add_argument("--no-vision", action="store_true")
    p.add_argument("--no-lidar", action="store_true")
    p.add_argument("--out", default=None, help="output JSON path")
    args = p.parse_args()

    from lvv_tpu.inference import InferenceEngine, ModelLoader

    loader = ModelLoader(args.checkpoint, args.tokenizer)
    model, params = loader.load_all()
    engine = InferenceEngine(model, params, loader.tokenizer,
                             max_new_tokens=args.max_new_tokens)
    kw = dict(use_vision=not args.no_vision, use_lidar=not args.no_lidar)

    if args.interactive:
        assert args.bev, "--bev required for interactive mode"
        bev = np.load(args.bev).astype(np.float32)
        print("interactive mode — empty line to exit")
        while True:
            try:
                q = input("Q> ").strip()
            except EOFError:
                break
            if not q:
                break
            print("A>", engine.generate(q, bev, **kw))
        return

    rows = json.loads(pathlib.Path(args.questions).read_text())
    questions = [r["question"] for r in rows]
    bevs = [np.load(r["bev_path"]).astype(np.float32) for r in rows]
    cams = [r.get("cam_paths") for r in rows] \
        if any("cam_paths" in r for r in rows) else None
    answers = []
    # per-sample try/except (reference infer.py:316-319 defensive batch loop)
    for i in range(len(rows)):
        try:
            a = engine.generate_batch([questions[i]], [bevs[i]],
                                      [cams[i]] if cams else None, **kw)[0]
        except Exception as e:
            a = f"<error: {e}>"
        answers.append({"question": questions[i], "answer": a})
        print(json.dumps(answers[-1]))
    if args.out:
        pathlib.Path(args.out).write_text(json.dumps(answers, indent=2))


if __name__ == "__main__":
    main()
