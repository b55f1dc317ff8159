#!/usr/bin/env python
"""Second-pass image-tower timing with fetch-proof methodology.

sam_breakdown.py showed the first pass was corrupted by the axon tunnel's
~36 MB/s device->host fetch (a [1,64,64,768] bf16 output alone costs
~175 ms). Here every timed program (a) reduces its output to a scalar and
(b) applies the op K times inside one jit via lax.fori_loop, so per-op
time = (total - dispatch_floor) / K with dispatch_floor ~= one tunnel
roundtrip.

Targets: SAM block variants (windowed/global, rel-pos on/off), the conv
stem+neck, full SAM, CLIP, Qwen prefill/decode-step.
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

K = 8  # in-jit repetitions


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sam_breakdown2.json")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    outp = pathlib.Path(args.out)
    results = {}

    import jax
    import jax.numpy as jnp
    from jax import lax
    from lvv_tpu.config import default_config
    from lvv_tpu.models.sam import SAMBlock
    from lvv_tpu.models.deepencoder import build_deepencoder
    from lvv_tpu.utils import astype_tree

    def timed_scalar(fn, *xs, iters=args.iters, warmup=2):
        for _ in range(warmup):
            float(fn(*xs))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(fn(*xs))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    def record(name, secs, per_k=False):
        results[name] = round(secs / (K if per_k else 1), 5)
        outp.write_text(json.dumps(results, indent=1))
        print(f"{name}: {results[name]*1e3:.1f} ms", flush=True)

    cfg = default_config()
    rng = np.random.default_rng(0)
    s = cfg.model.sam.img_size
    grid = s // cfg.model.sam.patch_size
    x6 = jnp.asarray(rng.normal(
        size=(6, grid, grid, cfg.model.sam.embed_dim)).astype(np.float32)
        ).astype(jnp.bfloat16)

    # dispatch floor: trivial program, scalar out
    f0 = jax.jit(lambda x: jnp.sum(x[0, 0, :8, :8]))
    record("dispatch_floor", timed_scalar(f0, x6))

    def loop_block(blk, bp, x):
        def body(_, h):
            return blk.apply({"params": bp}, h)
        return jnp.sum(lax.fori_loop(0, K, body, x)
                       .astype(jnp.float32))

    for name, ws, rel in [("blk_win_relpos", cfg.model.sam.window_size, True),
                          ("blk_win_norel", cfg.model.sam.window_size, False),
                          ("blk_glob_relpos", 0, True),
                          ("blk_glob_norel", 0, False)]:
        blk = SAMBlock(cfg.model.sam.num_heads, window_size=ws,
                       mlp_ratio=cfg.model.sam.mlp_ratio, use_rel_pos=rel,
                       input_size=(grid, grid), dtype=jnp.bfloat16)
        bp = jax.device_put(astype_tree(
            blk.init(jax.random.PRNGKey(0), x6[:1])["params"], jnp.bfloat16))
        f = jax.jit(lambda p, x, b=blk: loop_block(b, p, x))
        record(name + "_6v_perblock", timed_scalar(f, bp, x6), per_k=True)

    # full SAM (batched 6 views) with scalar output
    enc = build_deepencoder(cfg.model, dtype=jnp.bfloat16)
    sam = enc.sam
    img6 = jnp.asarray(rng.uniform(-1, 1, (6, 3, s, s)).astype(np.float32))
    sp = jax.device_put(astype_tree(
        sam.init(jax.random.PRNGKey(0), img6[:1])["params"], jnp.bfloat16))
    f_sam = jax.jit(lambda p, x: jnp.sum(
        sam.apply({"params": p}, x).astype(jnp.float32)))
    record("sam_6v_scalar", timed_scalar(f_sam, sp, img6))

    # CLIP batched 6 views, scalar
    clip = enc.clip
    feats6 = jnp.asarray(rng.normal(size=(6, 1024, 16, 16))
                         .astype(np.float32)).astype(jnp.bfloat16)
    cp = jax.device_put(astype_tree(
        clip.init(jax.random.PRNGKey(0), patch_embeds=feats6[:1])["params"],
        jnp.bfloat16))
    f_clip = jax.jit(lambda p, f: jnp.sum(
        clip.apply({"params": p}, patch_embeds=f).astype(jnp.float32)))
    record("clip_6v_scalar", timed_scalar(f_clip, cp, feats6))

    # full deepencoder, batched vs sequential, scalar
    for seq in (False, True):
        e = build_deepencoder(cfg.model, dtype=jnp.bfloat16,
                              sequential_views=seq)
        ep = jax.device_put(astype_tree(
            e.init(jax.random.PRNGKey(0), img6[:1])["params"], jnp.bfloat16))
        fe = jax.jit(lambda p, x, m=e: jnp.sum(m.apply(
            {"params": p}, x[None], jnp.ones((1, 6), bool),
            method=lambda mm, i, v: mm.encode_views(i, v))
            .astype(jnp.float32)))
        record(f"deepenc_6v_scalar_{'seq' if seq else 'bat'}",
               timed_scalar(fe, ep, img6))

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
