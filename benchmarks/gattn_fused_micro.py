#!/usr/bin/env python
"""A/B the fused-bias rel-pos kernel vs the streaming one at the SAM
global-layer shape (6 views, 12 heads, 64x64 tokens, head_dim 64).

K-rep fori_loop with explicit tunnel-floor subtraction (BASELINE.md
measurement rule). Writes benchmarks/gattn_fused_micro.json.
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

K = 64


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from lvv_tpu.ops.attention import (flash_attention_relpos,
                                       flash_attention_relpos_fused)

    rng = np.random.default_rng(0)
    results = {}
    outp = pathlib.Path(__file__).parent / "gattn_fused_micro.json"

    B, H, G, D = 6, 12, 64, 64
    S = G * G
    q = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=q.shape), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=q.shape), jnp.bfloat16)
    qrh = jnp.asarray(rng.normal(size=(B, H, S, G)), jnp.bfloat16)
    qrw = jnp.asarray(rng.normal(size=(B, H, S, G)), jnp.bfloat16)

    def timed(fn, *xs, iters=5, warmup=2):
        for _ in range(warmup):
            float(fn(*xs))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(fn(*xs))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    def loop(f):
        return jax.jit(lambda *xs: jnp.sum(
            lax.fori_loop(0, K, lambda _, h: f(*xs[:-1], h), xs[-1])
            .astype(jnp.float32)))

    def rec(name, secs, floor):
        results[name] = round((secs - floor) / K * 1e3, 3)
        outp.write_text(json.dumps(results, indent=1))
        print(f"{name}: {results[name]:.3f} ms", flush=True)

    floor = timed(loop(lambda h: h), q)
    results["floor_ms"] = round(floor / K * 1e3, 3)

    def run_old(bq, bk):
        def attn(h):
            o = flash_attention_relpos(h, k, v, qrh, qrw, scale=0.125,
                                       grid_w=G, block_q=bq, block_k=bk)
            return h + o * jnp.bfloat16(1e-3)
        rec(f"old_{bq}x{bk}", timed(loop(attn), q), floor)

    def run_new(bq, bk):
        def attn(h):
            o = flash_attention_relpos_fused(h, k, v, qrh, qrw, scale=0.125,
                                             grid_w=G, block_q=bq, block_k=bk)
            return h + o * jnp.bfloat16(1e-3)
        rec(f"fused_{bq}x{bk}", timed(loop(attn), q), floor)

    run_old(2048, 1024)
    for bq, bk in ((2048, 1024), (1024, 1024), (2048, 2048), (4096, 1024),
                   (1024, 4096), (2048, 4096)):
        run_new(bq, bk)


if __name__ == "__main__":
    main()
