#!/usr/bin/env python
"""LayerNorm + window-partition variants at SAM shapes.

sam_block_bisect.py: two LNs cost 2.0 ms and a partition round trip 2.2 ms
on [6, 64, 64, 768] bf16 (37 MB) — both ~7-10x above the HBM roofline
(~0.15 ms for 3 passes at 819 GB/s). This races implementations:

LN:   a) current (fp32 upcast, jnp.mean + jnp.var)
      b) single-pass moments (E[x^2] - mu^2), fp32 accum
      c) flax nn.LayerNorm
      d) 2D-reshaped input
Part: a) current 6D reshape/transpose round trip
      b) merged-lane transpose ([..., 14*768] contiguous blocks)
      c) flat row-gather with precomputed indices
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

K = 32


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    from jax import lax

    import lvv_tpu.models.sam as sam_mod

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(6, 64, 64, 768)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    scale = jnp.ones((768,), jnp.float32)
    bias = jnp.zeros((768,), jnp.float32)
    results = {}
    outp = pathlib.Path(__file__).parent / "ln_part_micro.json"

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
        results[name] = round(secs / K * 1e3, 3)
        outp.write_text(json.dumps(results, indent=1))
        print(f"{name}: {results[name]:.3f} ms", flush=True)

    def loop(f):
        return jax.jit(lambda h: jnp.sum(
            lax.fori_loop(0, K, lambda _, v: f(v), h).astype(jnp.float32)))

    eps = 1e-6

    def ln_current(h):
        y = h.astype(jnp.float32)
        mean = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.var(y, axis=-1, keepdims=True)
        y = (y - mean) * lax.rsqrt(var + eps)
        return (y * scale + bias).astype(h.dtype)

    def ln_onepass(h):
        y = h.astype(jnp.float32)
        m1 = jnp.mean(y, axis=-1, keepdims=True)
        m2 = jnp.mean(y * y, axis=-1, keepdims=True)
        inv = lax.rsqrt(jnp.maximum(m2 - m1 * m1, 0.0) + eps)
        return ((y - m1) * inv * scale + bias).astype(h.dtype)

    flax_ln = nn.LayerNorm(epsilon=eps)
    flax_p = flax_ln.init(jax.random.PRNGKey(0), x)

    for name, f in [
        ("ln_current", lambda h: h + ln_current(h) * jnp.bfloat16(1e-6)),
        ("ln_onepass", lambda h: h + ln_onepass(h) * jnp.bfloat16(1e-6)),
        ("ln_flax", lambda h: h + flax_ln.apply(flax_p, h).astype(h.dtype)
         * jnp.bfloat16(1e-6)),
        ("ln_2d", lambda h: h + ln_onepass(
            h.reshape(-1, 768)).reshape(h.shape) * jnp.bfloat16(1e-6)),
    ]:
        rec(name, timed(loop(f), x))

    # ---- partition variants
    win = 14

    def part_current(h):
        y, padded = sam_mod.window_partition(h, win)
        y = sam_mod.window_unpartition(y, win, padded, (64, 64))
        return h + y * jnp.bfloat16(1e-6)

    def part_merged(h):
        b, hh, ww, c = h.shape
        ph = (-hh) % win
        y = jnp.pad(h, ((0, 0), (0, ph), (0, ph), (0, 0)))
        hp = hh + ph
        n = hp // win
        # merge (win, c) lanes so the transpose moves contiguous rows
        y = y.reshape(b, n, win, n, win * c)
        y = y.transpose(0, 1, 3, 2, 4)              # [b, n, n, win, win*c]
        y = y.reshape(-1, win, win, c)
        # inverse
        y = y.reshape(b, n, n, win, win * c).transpose(0, 1, 3, 2, 4)
        y = y.reshape(b, hp, hp, c)[:, :hh, :ww]
        return h + y * jnp.bfloat16(1e-6)

    hp = 64 + ((-64) % win)
    n = hp // win
    rows = np.arange(6 * hp * hp).reshape(6, hp, hp)
    fwd = rows.reshape(6, n, win, n, win).transpose(0, 1, 3, 2, 4).reshape(-1)
    inv = np.argsort(fwd)
    fwd_i = jnp.asarray(fwd, jnp.int32)
    inv_i = jnp.asarray(inv, jnp.int32)

    def part_gather(h):
        b, hh, ww, c = h.shape
        y = jnp.pad(h, ((0, 0), (0, hp - hh), (0, hp - ww), (0, 0)))
        flat = y.reshape(-1, c)
        y = flat[fwd_i]                              # windowed order
        y = y[inv_i].reshape(b, hp, hp, c)[:, :hh, :ww]
        return h + y * jnp.bfloat16(1e-6)

    for name, f in [("part_current", part_current),
                    ("part_merged", part_merged),
                    ("part_gather", part_gather)]:
        rec(name, timed(loop(f), x))

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
