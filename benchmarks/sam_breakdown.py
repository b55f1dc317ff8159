#!/usr/bin/env python
"""Fine-grained TPU timing of the image tower (the r01 bottleneck).

Times, each as its own jit program with values fetched to host (axon relay
returns from block_until_ready early — see bench.py):
  - SAM encoder: 1 view, and 6 views sequential vs batched
  - one windowed SAM block vs one global SAM block at the product grid
  - CLIP tower alone (6 views batched)
  - patch embed + neck/VARY convs
Writes results incrementally to --out (JSON) so a crash keeps partials.

Usage: python benchmarks/sam_breakdown.py --out /tmp/sam_breakdown.json
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sam_breakdown.json")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    outp = pathlib.Path(args.out)
    results = {}

    def record(name, secs):
        results[name] = round(secs, 5)
        outp.write_text(json.dumps(results, indent=1))
        print(f"{name}: {secs*1e3:.1f} ms", flush=True)

    import jax
    import jax.numpy as jnp
    from lvv_tpu.config import default_config
    from lvv_tpu.models.deepencoder import build_deepencoder
    from lvv_tpu.models.sam import SAMBlock
    from lvv_tpu.utils import astype_tree

    def timed(fn, *xs, iters=args.iters, warmup=2):
        for _ in range(warmup):
            np.asarray(jax.tree_util.tree_leaves(fn(*xs))[0])
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            np.asarray(jax.tree_util.tree_leaves(fn(*xs))[0])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    cfg = default_config()
    rng = np.random.default_rng(0)
    s = cfg.model.sam.img_size
    img1 = jnp.asarray(rng.uniform(-1, 1, (1, 3, s, s)).astype(np.float32))
    img6 = jnp.asarray(rng.uniform(-1, 1, (6, 3, s, s)).astype(np.float32))

    enc = build_deepencoder(cfg.model, dtype=jnp.bfloat16)
    sam = enc.sam
    sp = sam.init(jax.random.PRNGKey(0), img1)["params"]
    sp = jax.device_put(astype_tree(sp, jnp.bfloat16))

    f_sam1 = jax.jit(lambda p, x: sam.apply({"params": p}, x))
    record("sam_1view", timed(f_sam1, sp, img1))
    record("sam_6view_batched", timed(f_sam1, sp, img6))

    def seq6(p, x):
        return jnp.stack([sam.apply({"params": p}, x[i:i + 1])
                          for i in range(6)])
    record("sam_6view_sequential", timed(jax.jit(seq6), sp, img6))

    # isolated blocks at the product grid (64x64 tokens, 768 dim)
    grid = s // cfg.model.sam.patch_size
    xblk = jnp.asarray(rng.normal(size=(1, grid, grid, cfg.model.sam.embed_dim))
                       .astype(np.float32)).astype(jnp.bfloat16)
    for name, ws in [("sam_block_windowed", cfg.model.sam.window_size),
                     ("sam_block_global", 0)]:
        blk = SAMBlock(cfg.model.sam.num_heads, window_size=ws,
                       mlp_ratio=cfg.model.sam.mlp_ratio,
                       use_rel_pos=cfg.model.sam.use_rel_pos,
                       input_size=(grid, grid), dtype=jnp.bfloat16)
        bp = jax.device_put(astype_tree(
            blk.init(jax.random.PRNGKey(0), xblk)["params"], jnp.bfloat16))
        fb = jax.jit(lambda p, x, m=blk: m.apply({"params": p}, x))
        record(name + "_1view", timed(fb, bp, xblk))
        xblk6 = jnp.tile(xblk, (6, 1, 1, 1))
        record(name + "_6view", timed(fb, bp, xblk6))

    # CLIP on 6 views of SAM features
    clip = enc.clip
    feats6 = jnp.asarray(rng.normal(size=(6, 1024, 16, 16))
                         .astype(np.float32)).astype(jnp.bfloat16)
    cp = jax.device_put(astype_tree(
        clip.init(jax.random.PRNGKey(0), patch_embeds=feats6[:1])["params"],
        jnp.bfloat16))
    f_clip = jax.jit(lambda p, f: clip.apply({"params": p}, patch_embeds=f))
    record("clip_6view_batched", timed(f_clip, cp, feats6))

    # full deepencoder 6 views: sequential (current default) vs batched
    ep = jax.device_put(astype_tree(
        enc.init(jax.random.PRNGKey(0), img1)["params"], jnp.bfloat16))
    im6 = img6[None]  # [1, 6, 3, S, S]
    vv = jnp.ones((1, 6), bool)
    f_enc_seq = jax.jit(lambda p, x: enc.apply(
        {"params": p}, x, vv, method=lambda m, i, v: m.encode_views(i, v)))
    record("deepencoder_6view_sequential", timed(f_enc_seq, ep, im6))
    enc_b = build_deepencoder(cfg.model, dtype=jnp.bfloat16,
                              sequential_views=False)
    f_enc_bat = jax.jit(lambda p, x: enc_b.apply(
        {"params": p}, x, vv, method=lambda m, i, v: m.encode_views(i, v)))
    try:
        record("deepencoder_6view_batched", timed(f_enc_bat, ep, im6))
    except Exception as e:  # noqa: BLE001 — record the crash for triage
        results["deepencoder_6view_batched_error"] = repr(e)[:500]
        outp.write_text(json.dumps(results, indent=1))
        print("batched encode failed:", repr(e)[:200], flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
