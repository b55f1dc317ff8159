#!/usr/bin/env python
"""Block-size sweep for the Pallas flash kernels at the SAM global shape.

attn_micro.py showed flash at (128,128) blocks runs 2.6x slower than plain
XLA attention — tiny [128,64]x[64,128] tiles underfeed the MXU. Sweep
(block_q, block_k) for flash_attention and flash_attention_relpos at
[6,12,4096,64] and print ms per call (K-loop methodology).
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

K = 8


def main():
    outp = pathlib.Path("/tmp/flash_tune.json")
    results = {}

    import jax
    import jax.numpy as jnp
    from jax import lax
    from lvv_tpu.ops.attention import flash_attention, flash_attention_relpos

    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    b, h, s, d = 6, 12, 4096, 64
    q = jnp.asarray(rng.normal(size=(b, h, s, d)), bf)
    kk = jnp.asarray(rng.normal(size=(b, h, s, d)), bf)
    v = jnp.asarray(rng.normal(size=(b, h, s, d)), bf)
    q_rh = jnp.asarray(rng.normal(size=(b, h, s, 64)), bf)
    q_rw = jnp.asarray(rng.normal(size=(b, h, s, 64)), bf)
    flops = 4 * s * s * d * h * b

    def loopk(f, x):
        def body(_, hh):
            return f(hh)
        return jnp.sum(lax.fori_loop(0, K, body, x).astype(jnp.float32))

    def timed(fn, *xs, iters=4, warmup=2):
        for _ in range(warmup):
            float(fn(*xs))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(fn(*xs))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    for bq, bk in [(256, 256), (512, 512), (512, 1024), (1024, 512),
                   (2048, 512), (512, 2048), (1024, 1024)]:
        try:
            f = jax.jit(lambda x, bq=bq, bk=bk: loopk(
                lambda t: flash_attention(t, kk, v, block_q=bq, block_k=bk),
                x))
            ms = timed(f, q) / K * 1e3
            results[f"flash_{bq}x{bk}"] = {
                "ms": round(ms, 2),
                "tflops": round(flops / (ms / 1e3) / 1e12, 1)}
        except Exception as e:  # noqa: BLE001
            results[f"flash_{bq}x{bk}"] = repr(e)[:160]
        outp.write_text(json.dumps(results, indent=1))
        print(f"flash {bq}x{bk}: {results[f'flash_{bq}x{bk}']}", flush=True)

    for bq, bk in [(256, 256), (512, 512), (512, 1024), (1024, 1024)]:
        try:
            f = jax.jit(lambda x, bq=bq, bk=bk: loopk(
                lambda t: flash_attention_relpos(
                    t, kk, v, q_rh, q_rw, scale=0.125, grid_w=64,
                    block_q=bq, block_k=bk), x))
            ms = timed(f, q) / K * 1e3
            results[f"relpos_{bq}x{bk}"] = {
                "ms": round(ms, 2),
                "tflops": round(flops / (ms / 1e3) / 1e12, 1)}
        except Exception as e:  # noqa: BLE001
            results[f"relpos_{bq}x{bk}"] = repr(e)[:160]
        outp.write_text(json.dumps(results, indent=1))
        print(f"relpos {bq}x{bk}: {results[f'relpos_{bq}x{bk}']}",
              flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
