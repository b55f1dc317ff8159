#!/usr/bin/env python
"""Bisect the windowed SAM block: where do 13.8 ms go?

int8_sam_micro.py showed standalone bf16 dots at SAM shapes reach 101-134
TFLOPS, so the pure-matmul floor of one windowed block (qkv+proj on padded
windows + MLP + the tiny attention core) is ~4-5 ms — yet sam_breakdown2
measures 13.8 ms. This measures each component in the same
scalar-reduced fori_loop style:

  block_pallas   — current default (in-kernel rel-pos flash, blk 256)
  block_xla      — materialized-bias XLA attention (kernel gate forced off)
  block_norel    — no rel-pos at all
  dots_only      — qkv + proj + mlp as plain dots (no attn, no LN)
  ln_only        — the two layernorms
  partition_only — window partition + unpartition round trip
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

K = 16


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import lvv_tpu.models.sam as sam_mod
    from lvv_tpu.config import default_config
    from lvv_tpu.models.sam import SAMBlock
    from lvv_tpu.utils import astype_tree

    cfg = default_config()
    rng = np.random.default_rng(0)
    grid = cfg.model.sam.img_size // cfg.model.sam.patch_size
    d = cfg.model.sam.embed_dim
    win = cfg.model.sam.window_size
    x6 = jnp.asarray(rng.normal(size=(6, grid, grid, d)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    results = {}
    outp = pathlib.Path(__file__).parent / "sam_block_bisect.json"

    def timed(fn, *xs, iters=5, warmup=2):
        for _ in range(warmup):
            float(fn(*xs))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(fn(*xs))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    def rec(name, secs):
        results[name] = round(secs / K * 1e3, 3)     # ms per rep
        outp.write_text(json.dumps(results, indent=1))
        print(f"{name}: {results[name]:.2f} ms", flush=True)

    def loop(f, x):
        return jax.jit(lambda *xs: jnp.sum(
            lax.fori_loop(0, K, lambda _, h: f(*xs[:-1], h), xs[-1])
            .astype(jnp.float32)))

    # --- full block, pallas in-kernel rel-pos (default)
    blk = SAMBlock(cfg.model.sam.num_heads, window_size=win,
                   use_rel_pos=True, input_size=(grid, grid),
                   dtype=jnp.bfloat16)
    bp = jax.device_put(astype_tree(
        blk.init(jax.random.PRNGKey(0), x6[:1])["params"], jnp.bfloat16))
    f = loop(lambda p, h: blk.apply({"params": p}, h), x6)
    rec("block_pallas", timed(f, bp, x6))

    # --- same block through the XLA materialized-bias path
    gate = sam_mod._relpos_kernel_ok
    sam_mod._relpos_kernel_ok = lambda *a: False
    try:
        blk_x = SAMBlock(cfg.model.sam.num_heads, window_size=win,
                         use_rel_pos=True, input_size=(grid, grid),
                         dtype=jnp.bfloat16)
        f = loop(lambda p, h: blk_x.apply({"params": p}, h), x6)
        rec("block_xla", timed(f, bp, x6))
    finally:
        sam_mod._relpos_kernel_ok = gate

    # --- no rel-pos
    blk_nr = SAMBlock(cfg.model.sam.num_heads, window_size=win,
                      use_rel_pos=False, input_size=(grid, grid),
                      dtype=jnp.bfloat16)
    bp_nr = jax.device_put(astype_tree(
        blk_nr.init(jax.random.PRNGKey(0), x6[:1])["params"], jnp.bfloat16))
    f = loop(lambda p, h: blk_nr.apply({"params": p}, h), x6)
    rec("block_norel", timed(f, bp_nr, x6))

    # --- dots only (qkv + proj on padded tokens, mlp on unpadded)
    tokens_pad = 6 * 70 * 70
    tokens = 6 * grid * grid
    wqkv = jnp.asarray(rng.normal(size=(d, 3 * d)), jnp.bfloat16)
    wproj = jnp.asarray(rng.normal(size=(d, d)), jnp.bfloat16)
    wup = jnp.asarray(rng.normal(size=(d, 4 * d)), jnp.bfloat16)
    wdn = jnp.asarray(rng.normal(size=(4 * d, d)), jnp.bfloat16)
    xp = jnp.asarray(rng.normal(size=(tokens_pad, d)), jnp.bfloat16)

    def dots(h):
        a = jnp.dot(h, wqkv)[:, :d]
        b = jnp.dot(a, wproj)
        u = jax.nn.gelu(jnp.dot(b[:tokens], wup))
        y = jnp.dot(u, wdn)
        return h + jnp.pad(y, ((0, tokens_pad - tokens), (0, 0))) \
            * jnp.bfloat16(1e-6)

    f = loop(dots, xp)
    rec("dots_only", timed(f, xp))

    # --- layernorms only
    from lvv_tpu.models.layers import LayerNorm
    ln = LayerNorm(eps=1e-6)
    lp = ln.init(jax.random.PRNGKey(0), x6)["params"]

    def lns(p, h):
        y = ln.apply({"params": p}, h)
        return h + ln.apply({"params": p}, y) * jnp.bfloat16(1e-6)

    f = loop(lns, x6)
    rec("ln_only_x2", timed(f, lp, x6))

    # --- window partition + unpartition round trip
    def part(h):
        y, padded = sam_mod.window_partition(h, win)
        y = sam_mod.window_unpartition(y, win, padded, (grid, grid))
        return h + y * jnp.bfloat16(1e-6)

    f = loop(part, x6)
    rec("partition_roundtrip", timed(f, x6))

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
