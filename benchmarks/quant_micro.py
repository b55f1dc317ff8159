#!/usr/bin/env python
"""quantized_matmul (pallas int8) vs bf16 XLA at decode shapes."""
import json, pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
import numpy as np

K = 512


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from lvv_tpu.ops.quant import quantize_weight, quantized_matmul
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

    def loopk(f, x):
        return jnp.sum(lax.fori_loop(0, K, lambda _, h: f(h), x)
                       .astype(jnp.float32))

    for name, (d, inter) in [("qwen_mlp", (896, 4864)),
                             ("qwen_qkv", (896, 1152))]:
        w1 = jnp.asarray(rng.normal(size=(d, inter)), jnp.bfloat16)
        w2 = jnp.asarray(rng.normal(size=(inter, d)), jnp.bfloat16)
        q1, s1 = quantize_weight(w1)
        q2, s2 = quantize_weight(w2)
        x = jnp.asarray(rng.normal(size=(1, d)), jnp.bfloat16)
        t_bf = timed(jax.jit(lambda t: loopk(
            lambda h: (h @ w1) @ w2, t)), x)
        t_q = timed(jax.jit(lambda t: loopk(
            lambda h: quantized_matmul(
                quantized_matmul(h, q1, s1), q2, s2), t)), x)
        results[name] = {"bf16_us": round(t_bf / K * 1e6, 1),
                         "int8_pallas_us": round(t_q / K * 1e6, 1)}
        print(name, results[name], flush=True)
    pathlib.Path("/tmp/quant_micro.json").write_text(json.dumps(results))


if __name__ == "__main__":
    main()
