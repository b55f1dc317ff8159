#!/usr/bin/env python
"""A/B window_attention_v4 (precomputed grouped-dot q·R bias; edot vs bcast
in-kernel expansion) against the shipped packed kernel at the SAM windowed
shape. Includes XLA prep inside the timed region. Writes
winattn_v4_micro.json."""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

K = 128


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from lvv_tpu.ops.attention import (window_attention_packed,
                                       window_attention_v4)

    rng = np.random.default_rng(0)
    results = {}
    outp = pathlib.Path(__file__).parent / "winattn_v4_micro.json"

    WIN, HEADS, HD = 14, 12, 64
    B = 6 * 25
    S = WIN * WIN
    C = HEADS * HD
    qkv = jnp.asarray(rng.normal(size=(B, S, 3 * C)), jnp.bfloat16)
    rel_h = jnp.asarray(rng.normal(size=(WIN, WIN, HD)) * 0.3, jnp.bfloat16)
    rel_w = jnp.asarray(rng.normal(size=(WIN, WIN, HD)) * 0.3, jnp.bfloat16)
    scale = 1.0 / np.sqrt(HD)

    ref = np.asarray(window_attention_packed(
        qkv[:2], rel_h, rel_w, scale=scale, heads=HEADS, win=WIN),
        np.float32)
    got = np.asarray(window_attention_v4(
        qkv[:2], rel_h, rel_w, scale=scale, heads=HEADS, win=WIN),
        np.float32)
    err = float(np.max(np.abs(got - ref)))
    print(f"numcheck v4: max|diff|={err:.4f}", flush=True)
    results["numcheck_v4"] = round(err, 4)
    outp.write_text(json.dumps(results, indent=1))

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

    floor = timed(loop(lambda h: h), qkv)
    results["floor_ms_per_rep"] = round(floor / K * 1e3, 3)

    def rec(name, secs):
        results[name] = round((secs - floor) / K * 1e3, 3)
        outp.write_text(json.dumps(results, indent=1))
        print(f"{name}: {results[name]:.3f} ms", flush=True)

    def run_packed(h):
        o = window_attention_packed(h, rel_h, rel_w, scale=scale,
                                    heads=HEADS, win=WIN)
        return h + jnp.concatenate([o, o, o], -1) * jnp.bfloat16(1e-3)

    def run_v4(h):
        o = window_attention_v4(h, rel_h, rel_w, scale=scale,
                                heads=HEADS, win=WIN)
        return h + jnp.concatenate([o, o, o], -1) * jnp.bfloat16(1e-3)

    rec("packed", timed(loop(run_packed), qkv))
    rec("v4", timed(loop(run_v4), qkv))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
