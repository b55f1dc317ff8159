#!/usr/bin/env python
"""Does XLA fuse int8->bf16 dequant into decode-shape matmuls (halving
weight HBM traffic)? Decode is bandwidth-bound: [1, 896] x [896, 4864]
reads 8.7 MB bf16; int8 would read 4.35 MB."""
import json, pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
import numpy as np

K = 512


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

    def rec(name, secs):
        results[name] = round(secs / K * 1e6, 1)   # us per op
        print(name, results[name], "us", flush=True)

    d, inter = 896, 4864
    wg = jnp.asarray(rng.normal(size=(d, inter)), jnp.bfloat16)
    wd = jnp.asarray(rng.normal(size=(inter, d)), jnp.bfloat16)
    wg_q = (np.asarray(wg, np.float32) * 16).astype(np.int8)
    wd_q = (np.asarray(wd, np.float32) * 16).astype(np.int8)
    wg_i = jnp.asarray(wg_q)
    wd_i = jnp.asarray(wd_q)
    sg = jnp.full((inter,), 1 / 16, jnp.bfloat16)
    sd = jnp.full((d,), 1 / 16, jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(1, d)), jnp.bfloat16)

    def loopk(f, x):
        return jnp.sum(lax.fori_loop(0, K, lambda _, h: f(h), x)
                       .astype(jnp.float32))

    rec("mlp_bf16", timed(jax.jit(
        lambda t: loopk(lambda h: (h @ wg) @ wd, t)), x))
    rec("mlp_int8_dequant", timed(jax.jit(
        lambda t: loopk(lambda h: ((h @ (wg_i.astype(jnp.bfloat16)
                                         * sg[None, :]))
                                   @ (wd_i.astype(jnp.bfloat16)
                                      * sd[None, :])), t)), x))
    # int8 dot with bf16 activation quantized on the fly (int8 x int8 MXU)
    rec("mlp_int8_dot", timed(jax.jit(
        lambda t: loopk(lambda h: (
            (lax.dot_general((h * 16).astype(jnp.int8), wg_i,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
             .astype(jnp.bfloat16) * (sg[None, :] / 16))
            @ (wd_i.astype(jnp.bfloat16) * sd[None, :])), t)), x))
    pathlib.Path("/tmp/int8_micro.json").write_text(json.dumps(results))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
