#!/usr/bin/env python
"""CLIP-shape attention + Qwen decode-step microbenchmarks (r2 followup:
CLIP runs at ~23 TFLOPS; is its flash path losing to plain XLA at
[6,16,257,64]? and what does one KV-cached decode step cost?)."""
import json, pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
import numpy as np

K = 256


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from lvv_tpu.ops.attention import attention_reference, flash_attention

    results = {}
    out = pathlib.Path("/tmp/clip_decode_micro.json")
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16

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

    def rec(name, secs):
        results[name] = round(secs / K * 1e3, 3)
        out.write_text(json.dumps(results, indent=1))
        print(name, results[name], "ms", flush=True)

    # CLIP attention shape
    b, h, s, d = 6, 16, 257, 64
    q = jnp.asarray(rng.normal(size=(b, h, s, d)), bf)
    k = jnp.asarray(rng.normal(size=(b, h, s, d)), bf)
    v = jnp.asarray(rng.normal(size=(b, h, s, d)), bf)
    rec("clip_attn_flash", timed(jax.jit(
        lambda x: loopk(lambda t: flash_attention(t, k, v), x)), q))
    rec("clip_attn_xla", timed(jax.jit(
        lambda x: loopk(lambda t: attention_reference(t, k, v), x)), q))

    # CLIP dense层 shape [1542, 1024] x [1024, 4096]
    a = jnp.asarray(rng.normal(size=(1542, 1024)), bf)
    w1 = jnp.asarray(rng.normal(size=(1024, 4096)), bf)
    w2 = jnp.asarray(rng.normal(size=(4096, 1024)), bf)
    rec("clip_mlp_mm", timed(jax.jit(
        lambda x: loopk(lambda t: (t @ w1) @ w2, x)), a))

    # Qwen decode-step attention: q [1, 14, 1, 64], cache [1, 2, 4096, 64]
    from lvv_tpu.ops.attention import decode_attention
    qd = jnp.asarray(rng.normal(size=(1, 14, 1, 64)), bf)
    kc = jnp.asarray(rng.normal(size=(1, 2, 4096, 64)), bf)
    vc = jnp.asarray(rng.normal(size=(1, 2, 4096, 64)), bf)
    cl = jnp.full((1,), 2000, jnp.int32)
    rec("qwen_decode_attn", timed(jax.jit(
        lambda x: loopk(lambda t: decode_attention(t, kc, vc, cl), x)), qd))

    # Qwen decode matmul slice: [1, 896] x [896, 4864] (gate) x2 + down
    e = jnp.asarray(rng.normal(size=(1, 896)), bf)
    wg = jnp.asarray(rng.normal(size=(896, 4864)), bf)
    wd = jnp.asarray(rng.normal(size=(4864, 896)), bf)
    rec("qwen_decode_mlp", timed(jax.jit(
        lambda x: loopk(lambda t: (t @ wg) @ wd, x)), e))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
