#!/usr/bin/env python
"""A/B the phase-separated window kernel (v2) against the packed kernel and
a pure-XLA batched path at the SAM windowed-layer shape (6 views x 25
windows, 12 heads, 14x14 tokens, head_dim 64), measured from the qkv Dense
output through the attention output.

The packed kernel serializes MXU and VPU per head (BASELINE.md r3 A/B);
the phased variant batches each phase. K-rep fori_loop with tunnel-floor
subtraction (BASELINE.md measurement rule). Writes winattn_v2_micro.json.
"""
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
                                       window_attention_phased)

    rng = np.random.default_rng(0)
    results = {}
    outp = pathlib.Path(__file__).parent / "winattn_v2_micro.json"

    WIN, HEADS, HD = 14, 12, 64
    B = 6 * 25
    S = WIN * WIN
    C = HEADS * HD
    qkv = jnp.asarray(rng.normal(size=(B, S, 3 * C)), jnp.bfloat16)
    rel_h = jnp.asarray(rng.normal(size=(WIN, WIN, HD)) * 0.3, jnp.bfloat16)
    rel_w = jnp.asarray(rng.normal(size=(WIN, WIN, HD)) * 0.3, jnp.bfloat16)
    scale = 1.0 / np.sqrt(HD)

    # numeric sanity: phased must match packed
    ref = np.asarray(window_attention_packed(
        qkv[:2], rel_h, rel_w, scale=scale, heads=HEADS, win=WIN),
        np.float32)
    for batched in (False, True):
        try:
            got = np.asarray(window_attention_phased(
                qkv[:2], rel_h, rel_w, scale=scale, heads=HEADS, win=WIN,
                batched=batched), np.float32)
            err = float(np.max(np.abs(got - ref)))
            print(f"numcheck batched={batched}: max|diff|={err:.4f}",
                  flush=True)
            results[f"numcheck_b{int(batched)}"] = round(err, 4)
        except Exception as e:  # noqa: BLE001
            print(f"batched={batched} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            results[f"numcheck_b{int(batched)}"] = "error"
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

    def run_phased(gwin, batched):
        def f(h):
            o = window_attention_phased(h, rel_h, rel_w, scale=scale,
                                        heads=HEADS, win=WIN, gwin=gwin,
                                        batched=batched)
            return h + jnp.concatenate([o, o, o], -1) * jnp.bfloat16(1e-3)
        return f

    def run_xla(h):
        c = HEADS * HD
        q = h[..., :c].reshape(B, S, HEADS, HD).transpose(0, 2, 1, 3)
        k = h[..., c:2 * c].reshape(B, S, HEADS, HD).transpose(0, 2, 1, 3)
        v = h[..., 2 * c:].reshape(B, S, HEADS, HD).transpose(0, 2, 1, 3)
        qr = q.reshape(B, HEADS, WIN, WIN, HD)
        q_rh = jnp.einsum("bnxyc,xkc->bnxyk", qr, rel_h,
                          preferred_element_type=jnp.float32)
        q_rw = jnp.einsum("bnxyc,ykc->bnxyk", qr, rel_w,
                          preferred_element_type=jnp.float32)
        bias = (q_rh[..., :, None] + q_rw[..., None, :]).reshape(
            B, HEADS, S, S)
        from lvv_tpu.ops.attention import attention_reference
        o = attention_reference(q, k, v, bias=bias, scale=scale)
        o = o.transpose(0, 2, 1, 3).reshape(B, S, c)
        return h + jnp.concatenate([o, o, o], -1) * jnp.bfloat16(1e-3)

    rec("packed", timed(loop(run_packed), qkv))
    for gwin in (1, 2, 5):
        for batched in (False, True):
            key = f"phased_g{gwin}" + ("_bdot" if batched else "")
            if results.get(f"numcheck_b{int(batched)}") == "error":
                continue
            try:
                rec(key, timed(loop(run_phased(gwin, batched)), qkv))
            except Exception as e:  # noqa: BLE001
                print(f"{key} FAILED: {type(e).__name__}: {str(e)[:200]}",
                      flush=True)
                results[key] = "error"
                outp.write_text(json.dumps(results, indent=1))
    rec("xla_bias", timed(loop(run_xla), qkv))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
