#!/usr/bin/env python
"""Do int8 x int8 MXU dots reach ~2x bf16 TOPS at SAM-trunk shapes?

v5e doubles MXU throughput for int8 operands (394 vs 197 TOPS). SAM-B is
COMPUTE-bound through this stack (measured dense ceiling ~45 TFLOPS, see
ROUND_NOTES), so if XLA emits native int8 dots, quantizing the frozen
trunk's weights AND activations (dynamic abs-max per tensor) would halve
the image-tower floor. The decode-side experiment (int8_micro.py) showed
weight-only int8 is a dead end (no dequant fusion); this measures the
both-operands path at SAM shapes:
  tokens [6 views x 4096, 768] x qkv [768, 2304]  (attention projection)
  tokens [24576, 768] x mlp [768, 3072]           (MLP up)

Timing: K=128 fori_loop with explicit empty-loop floor subtraction (the
~31/K ms tunnel floor corrupted the first round of these numbers —
reported "TFLOPS" columns were computed from floor-inflated times).
"""
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

    rng = np.random.default_rng(0)
    results = {}

    def timed(fn, *xs, iters=5, warmup=2):
        for _ in range(warmup):
            float(fn(*xs))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(fn(*xs))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    # floor: empty loop (tunnel roundtrip / K)
    x0 = jnp.asarray(rng.normal(size=(256, 256)), jnp.bfloat16)
    f0 = jax.jit(lambda x: jnp.sum(lax.fori_loop(
        0, K, lambda _, h: h, x).astype(jnp.float32)))
    floor = timed(f0, x0)
    results["floor_ms_per_rep"] = round(floor / K * 1e3, 3)

    for m, k, n, tag in [(24576, 768, 2304, "qkv"),
                         (24576, 768, 3072, "mlp_up")]:
        # paired round-trip dots (m,k)@(k,n) then (m,n)@(n,k): the result
        # feeds the next iteration at full rank, so XLA can elide nothing
        # (a sliced consumer lets XLA shrink the matmul — bit us before)
        flops = 2 * 2 * m * k * n
        x = jnp.asarray(rng.normal(size=(m, k)) * 0.05, jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(k, n)) * 0.05, jnp.bfloat16)
        w2 = jnp.asarray(rng.normal(size=(n, k)) * 0.05, jnp.bfloat16)
        xi = jnp.asarray((rng.normal(size=(m, k)) * 16), np.int8)
        wi = jnp.asarray((rng.normal(size=(k, n)) * 16), np.int8)
        wi2 = jnp.asarray((rng.normal(size=(n, k)) * 16), np.int8)

        @jax.jit
        def bf16_loop(x, w, w2):
            def body(_, h):
                y = jnp.dot(h, w, preferred_element_type=jnp.float32)
                return jnp.dot(y.astype(jnp.bfloat16), w2,
                               preferred_element_type=jnp.float32
                               ).astype(jnp.bfloat16)
            return jnp.sum(lax.fori_loop(0, K, body, x)
                           .astype(jnp.float32))

        @jax.jit
        def int8_loop(xi, wi, wi2):
            def body(_, h):
                y = lax.dot_general(h, wi, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
                y8 = (y >> 7).astype(jnp.int8)       # cheap rescale
                z = lax.dot_general(y8, wi2, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
                return (z >> 7).astype(jnp.int8)
            return jnp.sum(lax.fori_loop(0, K, body, xi)
                           .astype(jnp.int32))

        t_bf = timed(bf16_loop, x, w, w2) - floor
        t_i8 = timed(int8_loop, xi, wi, wi2) - floor
        tf_bf = K * flops / t_bf / 1e12
        tf_i8 = K * flops / t_i8 / 1e12
        results[tag] = {"bf16_tflops": round(tf_bf, 1),
                        "int8_tops": round(tf_i8, 1),
                        "speedup": round(tf_i8 / tf_bf, 2)}
        print(tag, results[tag], flush=True)

    out = pathlib.Path(__file__).parent / "int8_sam_micro.json"
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
