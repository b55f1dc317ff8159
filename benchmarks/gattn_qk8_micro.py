#!/usr/bin/env python
"""A/B the int8-score-matmul hpacked kernel (qk8) vs the bf16 hpacked
default at the SAM global-layer shape (6 views, 12 heads, 64x64 tokens).

The score contraction is the kernel's larger MXU half; int8 doubles its
TOPS on v5e while the quantize work runs OUTSIDE the kernel in XLA
(the r2 in-kernel p-quantize variant lost to VPU cost — BASELINE.md).
K-rep fori_loop with explicit tunnel-floor subtraction.
Writes benchmarks/gattn_qk8_micro.json.
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

    from lvv_tpu.ops.attention import flash_attention_relpos_hpacked

    rng = np.random.default_rng(0)
    results = {}
    outp = pathlib.Path(__file__).parent / "gattn_qk8_micro.json"

    B, H, G, D = 6, 12, 64, 64
    S = G * G
    C = H * D
    qkv = jnp.asarray(rng.normal(size=(B, S, 3 * C)) * 0.5, jnp.bfloat16)
    rel_h = jnp.asarray(rng.normal(size=(G, G, D)) * 0.1, jnp.bfloat16)
    rel_w = jnp.asarray(rng.normal(size=(G, G, D)) * 0.1, jnp.bfloat16)

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

    floor = timed(loop(lambda h: h), qkv)
    results["floor_ms"] = round(floor / K * 1e3, 3)

    for name, qk8 in (("hpacked_bf16", False), ("hpacked_qk8", True)):
        def attn(h, _qk8=qk8):
            o = flash_attention_relpos_hpacked(
                h, rel_h, rel_w, scale=0.125, grid_w=G, heads=H,
                block_q=4096, block_k=1024, qk8=_qk8)
            return h.at[..., :C].add(o * jnp.bfloat16(1e-3))
        rec(name, timed(loop(attn), qkv), floor)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
