#!/usr/bin/env python
"""Architecture inspector: parameter tree + per-stage activation shapes.

Re-design of the reference's layer printer
(src/lidar-encoder/tools/print_layers_voxelnext.py:1-40: prints every leaf
layer and hooks per-layer output shapes, flagging the BEV tap point). Here
the param tree is walked directly and activation shapes come from
jax.eval_shape — no forward hooks, no device time.
"""
from __future__ import annotations

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import argparse


def print_tree(tree, prefix: str = "", max_depth: int = 99) -> int:
    import numpy as np
    total = 0
    for k in sorted(tree):
        v = tree[k]
        if isinstance(v, dict):
            if max_depth <= 0:
                n = sum(int(np.prod(l.shape)) for l in _leaves(v))
                print(f"{prefix}{k}/ ... ({n:,} params)")
                total += n
            else:
                print(f"{prefix}{k}/")
                total += print_tree(v, prefix + "  ", max_depth - 1)
        else:
            n = int(np.prod(v.shape))
            total += n
            print(f"{prefix}{k}: {tuple(v.shape)} {v.dtype} ({n:,})")
    return total


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=["vqa", "VoxelNeXt", "PointPillars"],
                   default="vqa")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--depth", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from lvv_tpu.config import default_config, tiny_config

    cfg = tiny_config() if args.tiny else default_config()

    if args.model == "vqa":
        from lvv_tpu.models import VQABatch, VQAModel
        model = VQAModel(cfg.model, llm_lora_rank=cfg.model.llm_lora.r,
                         clip_lora_rank=cfg.model.clip_lora.r)
        c, (h, w) = cfg.model.bev_channels, cfg.model.bev_hw
        s = cfg.model.sam.img_size
        batch = VQABatch(
            bev=jnp.zeros((1, c, h, w)), images=jnp.zeros((1, 6, 3, s, s)),
            view_valid=jnp.ones((1, 6), bool),
            text_ids=jnp.zeros((1, 8), jnp.int32),
            text_len=jnp.full((1,), 8, jnp.int32),
            labels=jnp.full((1, 8), -100, jnp.int32),
            use_vision=jnp.asarray(True), use_lidar=jnp.asarray(True))
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), batch))
        params = shapes["params"]
        out_shape = jax.eval_shape(
            lambda p: model.apply({"params": p}, batch), params)
        print("== forward output (loss, logits, count):")
        print("  ", jax.tree_util.tree_map(lambda x: x.shape, out_shape))
    else:
        from lvv_tpu.models.registry import build_detector
        det = build_detector(args.model, cfg.model.voxelnext, cfg.voxelize)
        pts = jnp.zeros((cfg.voxelize.max_points, 4))
        shapes = jax.eval_shape(
            lambda: det.init(jax.random.PRNGKey(0), pts, jnp.int32(0)))
        params = shapes["params"]

    print("== parameter tree:")
    total = print_tree(
        jax.tree_util.tree_map(lambda x: np.zeros(x.shape, x.dtype), params),
        max_depth=args.depth)
    print(f"== total: {total:,} params")


if __name__ == "__main__":
    main()
