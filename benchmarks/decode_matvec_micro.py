"""TPU micro-bench: decode-step matvec variants at Qwen-0.5B shapes.

Round-2 found weight-only int8 decode LOSES e2e at B=1 (BASELINE.md int8
bisect) with the pallas qmv kernel — hypothesis: per-pallas-call overhead,
not the byte count, dominates single-row matvecs. This isolates the three
candidate implementations per weight shape so round 3 can decide with
device data:

  bf16   : plain jnp dot (XLA), bf16 weights — the serving default
  q8_xla : int8 weights dequantized by a CAST INSIDE the XLA dot
           (convert should fuse into the matmul's operand read, streaming
           half the bytes with zero extra kernels)
  q8_pal : the ops.quant pallas qmv kernel (current params_decode path)

K=128 in-jit fori_loop per measurement with empty-loop floor subtraction
(ROUND_NOTES timing rule). Writes benchmarks/decode_matvec_micro.json.
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
import numpy as np

K = 128
B = int(__import__("os").environ.get("LVV_BENCH_B", "1"))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from lvv_tpu.ops.quant import quantized_matmul_nk

    rng = np.random.default_rng(0)
    # Qwen2.5-0.5B decode weights: qkv/o ~ [896, 896+2*128], mlp
    # gate/up/down [896, 4864]/[4864, 896], unembed [151936, 896]
    shapes = {
        "proj_896x1152": (896, 1152),
        "mlp_up_896x4864": (896, 4864),
        "mlp_down_4864x896": (4864, 896),
        "unembed_151936x896": (896, 151936),
    }
    only = __import__("os").environ.get("LVV_BENCH_SHAPES")
    if only:   # e.g. LVV_BENCH_SHAPES=proj_896x1152 for a CPU smoke
        shapes = {k: v for k, v in shapes.items() if k in only.split(",")}

    def timed(fn, *args):
        fn(*args)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    xs = jnp.asarray(rng.normal(size=(B, 896)) * 0.1, jnp.bfloat16)
    f0 = jax.jit(lambda x: jnp.sum(lax.fori_loop(
        0, K, lambda _, h: h, x).astype(jnp.float32)))
    floor = timed(f0, xs)
    results = {"floor_ms_per_rep": round(floor / K * 1e3, 4), "batch": B}

    for name, (k, n) in shapes.items():
        w = jnp.asarray(rng.normal(size=(k, n)) * 0.02, jnp.bfloat16)
        # int8 rows over the OUTPUT dim, layout [N, K] as served
        # (quantize_llm_params unembed layout: q [N, K], s [N])
        wt = np.asarray(w, np.float32).T
        scn = np.maximum(np.abs(wt).max(1) / 127.0, 1e-8)
        wq = jnp.asarray(np.clip(np.round(wt / scn[:, None]),
                                 -127, 127).astype(np.int8))
        sc = jnp.asarray(scn.astype(np.float32))
        x = jnp.asarray(rng.normal(size=(B, k)) * 0.1, jnp.bfloat16)

        def loop(step, x=x):
            def body(_, h):
                # rotate the input through the output projection-free path:
                # reduce back to [B, k] so the loop carries a fixed shape
                # without letting XLA slice into the dot (sum, not slice)
                y = step(h)
                return (h + jnp.sum(y).astype(h.dtype) * 1e-6).astype(h.dtype)
            return jax.jit(lambda x0: jnp.sum(lax.fori_loop(
                0, K, body, x0).astype(jnp.float32)))

        bf16 = loop(lambda h: h @ w)
        q8_xla = loop(lambda h: (h @ wq.T.astype(jnp.bfloat16))
                      * sc[None, :].astype(jnp.bfloat16))
        q8_pal = loop(lambda h: quantized_matmul_nk(h, wq, sc))

        row = {}
        for label, fn in [("bf16", bf16), ("q8_xla", q8_xla),
                          ("q8_pal", q8_pal)]:
            sec = timed(fn, x)
            row[label] = round((sec - floor) / K * 1e3, 4)
        gb = k * n  # int8 bytes; bf16 = 2x
        row["bf16_roofline_ms"] = round(2 * gb / 819e9 * 1e3, 4)
        row["int8_roofline_ms"] = round(gb / 819e9 * 1e3, 4)
        results[name] = row
        print(name, row, flush=True)

    out = pathlib.Path(__file__).parent / "decode_matvec_micro.json"
    out.write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
