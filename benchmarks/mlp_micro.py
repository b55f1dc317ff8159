#!/usr/bin/env python
"""Time the LN2+MLP+residual half of a SAM block: XLA vs ops.fused_mlp.

Writes benchmarks/mlp_micro.json. Timing per ROUND_NOTES: scalar-reduced
fori_loop (K reps) to defeat the axon relay's early block_until_ready.
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

    from lvv_tpu.ops.fused_mlp import _xla_forward, ln_mlp_residual

    rng = np.random.default_rng(0)
    n, c, h = 6 * 64 * 64, 768, 3072
    x = jnp.asarray(rng.normal(size=(n, c)), jnp.bfloat16)
    ls = jnp.asarray(1 + 0.1 * rng.normal(size=(c,)), jnp.float32)
    lb = jnp.asarray(0.1 * rng.normal(size=(c,)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(c, h)) / np.sqrt(c), jnp.bfloat16)
    b1 = jnp.asarray(0.1 * rng.normal(size=(h,)), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(h, c)) / np.sqrt(h), jnp.bfloat16)
    b2 = jnp.asarray(0.1 * rng.normal(size=(c,)), jnp.bfloat16)

    results = {}
    outp = pathlib.Path(__file__).parent / "mlp_micro.json"

    def loop(f):
        return jax.jit(lambda x: jnp.sum(
            lax.fori_loop(0, K, lambda _, hh: f(hh), x)
            .astype(jnp.float32)))

    def timed(fn, iters=5, warmup=2):
        for _ in range(warmup):
            float(fn(x))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(fn(x))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    def rec(name, secs):
        results[name] = round(secs / K * 1e3, 3)
        outp.write_text(json.dumps(results, indent=1))
        print(f"{name}: {results[name]:.2f} ms", flush=True)

    from lvv_tpu.ops.fused_mlp import _norm_xla, norm_fast

    rec("xla", timed(loop(
        lambda xx: _xla_forward(xx, ls, lb, w1, b1, w2, b2, 1e-6, "gelu"))))
    for bt in (256, 512):
        rec(f"fused_bt{bt}", timed(loop(
            lambda xx, bt=bt: ln_mlp_residual(
                xx, ls, lb, w1, b1, w2, b2, block_t=bt))))
    rec("ln_xla", timed(loop(lambda xx: _norm_xla(xx, ls, lb, 1e-6, False))))
    rec("ln_fast", timed(loop(lambda xx: norm_fast(xx, ls, lb))))

    def unfused_fastln(xx):
        y = norm_fast(xx, ls, lb)
        h = jax.nn.gelu(jnp.dot(y, w1,
                                preferred_element_type=jnp.float32)
                        .astype(jnp.bfloat16) + b1)
        return xx + jnp.dot(h, w2,
                            preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16) + b2

    rec("unfused_fastln", timed(loop(unfused_fastln)))


if __name__ == "__main__":
    main()
