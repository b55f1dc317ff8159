"""TPU micro-bench: int8 fused LN+MLP kernel vs bf16 at SAM block shapes.

Validates that the in-kernel W8A8 path (ops/fused_mlp._kernel_q8) actually
realizes the ~2x int8 MXU advantage measured for bare dots
(benchmarks/int8_sam_micro.json) once the quantize VPU work and scale
rescales are in the loop.  K=128 fori_loop with empty-loop floor
subtraction (ROUND_NOTES timing rule).
"""
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
    from lvv_tpu.ops import fused_mlp
    from lvv_tpu.ops.quant import int8_dot

    rng = np.random.default_rng(0)
    n, c, h = 24576, 768, 3072          # SAM-B block: 6 views x 4096 tokens
    x = jnp.asarray(rng.normal(size=(n, c)) * 0.1, jnp.bfloat16)
    ls = jnp.ones((c,), jnp.float32)
    lb = jnp.zeros((c,), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(c, h)) * 0.02, jnp.bfloat16)
    b1 = jnp.zeros((h,), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(h, c)) * 0.02, jnp.bfloat16)
    b2 = jnp.zeros((c,), jnp.bfloat16)
    wq = jnp.asarray(rng.normal(size=(c, 3 * c)) * 0.02, jnp.bfloat16)
    bq = jnp.zeros((3 * c,), jnp.bfloat16)
    # paired round-trip dot: a sliced consumer would let XLA shrink the
    # matmul (ROUND_NOTES pitfall), so project back to c at full rank
    wq2 = jnp.asarray(rng.normal(size=(3 * c, c)) * 0.02, jnp.bfloat16)
    bq2 = jnp.zeros((c,), jnp.bfloat16)

    def timed(fn, *args):
        fn(*args)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    f0 = jax.jit(lambda x: jnp.sum(lax.fori_loop(
        0, K, lambda _, h: h, x).astype(jnp.float32)))
    floor = timed(f0, x[:256, :256])

    results = {"floor_ms_per_rep": round(floor / K * 1e3, 3)}
    mlp_flops = 2 * 2 * n * c * h
    qkv_flops = 2 * 2 * n * c * 3 * c

    def loop(step):
        @jax.jit
        def f(x):
            def body(_, acc):
                # feed output back in at full rank so nothing elides
                return step(acc)
            return jnp.sum(lax.fori_loop(0, K, body, x)
                           .astype(jnp.float32))
        return f

    cases = {
        "mlp_bf16": (loop(lambda v: fused_mlp.ln_mlp_residual(
            v, ls, lb, w1, b1, w2, b2)), mlp_flops),
        "mlp_int8": (loop(lambda v: fused_mlp.ln_mlp_residual(
            v, ls, lb, w1, b1, w2, b2, quant8=True)), mlp_flops),
        "qkv_bf16": (loop(lambda v: ((v @ wq + bq) @ wq2 + bq2)
                          .astype(jnp.bfloat16)), qkv_flops),
        "qkv_int8": (loop(lambda v: int8_dot(
            int8_dot(v, wq, bq), wq2, bq2).astype(jnp.bfloat16)),
            qkv_flops),
    }
    for tag, (fn, flops) in cases.items():
        t = timed(fn, x) - floor
        results[tag] = {"ms": round(t / K * 1e3, 3),
                        "tflops": round(K * flops / t / 1e12, 1)}
    for pair in ("mlp", "qkv"):
        results[f"{pair}_speedup"] = round(
            results[f"{pair}_bf16"]["ms"] / results[f"{pair}_int8"]["ms"], 2)

    out = pathlib.Path(__file__).parent / "int8_fused_micro.json"
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
