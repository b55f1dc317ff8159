"""Fused single-token decode engine (serving-side).

The flax decode path runs 24 layers x 7 projection matmuls per token
(q/k/v/o + gate/up/down); the three q/k/v dots and the gate/up pair are
tiny column-blocks of the same contraction, each paying its own HBM
prologue — at B=1 the decode scan is weight-bandwidth-bound and the op
COUNT, not the math, sets the floor (ROUND_NOTES: decode matvecs sit
above the bytes roofline). This module packs the weight tree once at
serving-prep time (q|k|v -> one [H, 1152] matmul, gate|up -> one
[H, 2F]) and runs the whole decode scan in plain jax — 4 matmuls/layer
instead of 7, same numerics:

- int8 kernels keep the EXACT per-column scales of the unfused tree
  (each projection quantized separately, then concatenated), and the
  dequant formulation matches models/layers.py::Dense's dict branch
  ((x @ q8) * s, output-side scales) — so fused greedy tokens equal the
  unfused int8 path's (tests/test_quant.py::test_fused_decode_parity);
- RMSNorm/rope/cache-update/attention reuse the same ops the flax
  modules call (norm_fast, apply_rope, decode_attention).

Reference decode hot loop: KV-cached HF `model.generate`
(src/encoder-decoder/inference/inference_engine.py:287-298).
LoRA adapters, if present, are folded into the effective kernels before
quantization (serving-side merge, like PEFT merge_and_unload).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config.schema import LLMConfig
from ..ops.attention import decode_attention
from ..ops.fused_mlp import norm_fast
from ..ops.quant import quantize_weight
from .qwen import KVCache, apply_rope


def _eff_kernel(sub: Dict) -> jnp.ndarray:
    """Dense params -> effective float kernel (LoRA folded)."""
    w = jnp.asarray(sub["kernel"], jnp.float32)
    if "lora_a" in sub and "lora_b" in sub:
        # scaling alpha/r is baked by the caller; Dense applies
        # (alpha/r) * (x A) B — fold as W + (alpha/r) A B
        a = jnp.asarray(sub["lora_a"], jnp.float32)
        b = jnp.asarray(sub["lora_b"], jnp.float32)
        w = w + a @ b * sub.get("_lora_scaling", 1.0)
    return w


def _q(w: jnp.ndarray) -> Dict:
    q, s = quantize_weight(w)
    return {"q": q, "s": s}


def _qcat(subs, biases=True) -> Dict:
    """Quantize each projection separately (exact unfused scales), then
    concatenate along the output axis."""
    qs = [_q(_eff_kernel(s)) for s in subs]
    out = {"q": jnp.concatenate([x["q"] for x in qs], axis=1),
           "s": jnp.concatenate([x["s"] for x in qs])}
    if biases and all("bias" in s for s in subs):
        out["b"] = jnp.concatenate(
            [jnp.asarray(s["bias"], jnp.float32) for s in subs])
    return out


def pack_decode_params(llm_params: Dict, cfg: LLMConfig,
                       lora_scaling: float = 1.0) -> Dict:
    """One-time pack of a (float) Qwen tree into the fused decode layout.
    Kept alongside the normal tree by prepare_serving_params(fuse=True)."""
    out: Dict = {"layers": []}
    for i in range(cfg.num_layers):
        lp = llm_params[f"layer_{i}"]
        at, mlp = dict(lp["attn"]), dict(lp["mlp"])

        def sub(d, name):
            s = dict(d[name])
            if "lora_a" in s:
                s["_lora_scaling"] = lora_scaling
            return s
        out["layers"].append({
            "ln1": jnp.asarray(lp["input_ln"]["scale"]),
            "ln2": jnp.asarray(lp["post_attn_ln"]["scale"]),
            "qkv": _qcat([sub(at, "q_proj"), sub(at, "k_proj"),
                          sub(at, "v_proj")]),
            "o": _q(_eff_kernel(sub(at, "o_proj"))),
            "gateup": _qcat([sub(mlp, "gate_proj"), sub(mlp, "up_proj")],
                            biases=False),
            "down": _q(_eff_kernel(sub(mlp, "down_proj"))),
        })
    out["final_ln"] = jnp.asarray(llm_params["final_ln"]["scale"])
    emb = jnp.asarray(llm_params["embed_tokens"]["embedding"])
    out["embed"] = emb
    assert cfg.tie_word_embeddings, "fused decode assumes the tied unembed"
    sc = jnp.maximum(jnp.max(jnp.abs(emb.astype(jnp.float32)),
                             axis=1) / 127.0, 1e-8)
    out["unembed"] = {
        "q": jnp.clip(jnp.round(emb.astype(jnp.float32) / sc[:, None]),
                      -127, 127).astype(jnp.int8),
        "s": sc}
    return out


def fused_decode_step(cfg: LLMConfig, dtype, packed: Dict,
                      token_ids: jax.Array, cache: KVCache):
    """One greedy step over the packed tree: [B] ids -> (logits [B, V],
    cache). Numerics match QwenModel.decode_step over the int8 tree."""
    b = token_ids.shape[0]
    h, d = cfg.hidden_size, cfg.head_dim
    nq, nkv = cfg.num_heads, cfg.num_kv_heads
    x = packed["embed"][token_ids][:, None].astype(dtype)   # [B, 1, H]
    pos = cache.length[:, None]
    new_k, new_v = [], []

    def dense(v, p, bias=False):
        y = ((v.astype(dtype) @ p["q"].astype(dtype))
             * p["s"]).astype(dtype)
        return y + p["b"].astype(dtype) if bias else y

    for i, lp in enumerate(packed["layers"]):
        xl = norm_fast(x, lp["ln1"], eps=cfg.rms_norm_eps, rms=True)
        qkv = dense(xl, lp["qkv"], bias=True)               # [B, 1, 1152]
        q = qkv[..., : nq * d].reshape(b, 1, nq, d).transpose(0, 2, 1, 3)
        k = qkv[..., nq * d: (nq + nkv) * d].reshape(
            b, 1, nkv, d).transpose(0, 2, 1, 3)
        v = qkv[..., (nq + nkv) * d:].reshape(
            b, 1, nkv, d).transpose(0, 2, 1, 3)
        q = apply_rope(q, pos, cfg.rope_theta)
        k = apply_rope(k, pos, cfg.rope_theta)
        kc, vc = cache.k[i], cache.v[i]
        kc = _write(kc, k, cache.length)
        vc = _write(vc, v, cache.length)
        o = decode_attention(q, kc, vc, cache.length + 1)
        o = o.transpose(0, 2, 1, 3).reshape(b, 1, nq * d)
        x = x + dense(o, lp["o"])
        xl = norm_fast(x, lp["ln2"], eps=cfg.rms_norm_eps, rms=True)
        gu = dense(xl, lp["gateup"])                        # [B, 1, 2F]
        f = cfg.intermediate_size
        x = x + dense(jax.nn.silu(gu[..., :f]) * gu[..., f:], lp["down"])
        new_k.append(kc)
        new_v.append(vc)
    x = norm_fast(x, packed["final_ln"], eps=cfg.rms_norm_eps, rms=True)
    uq = packed["unembed"]
    logits = ((x.astype(dtype) @ uq["q"].T.astype(dtype))
              * uq["s"]).astype(dtype)
    return logits[:, -1], KVCache(k=new_k, v=new_v,
                                  length=cache.length + 1)


def _write(cache_arr, new, idx):
    def one(c, n, i):
        return jax.lax.dynamic_update_slice(c, n, (0, i, 0))
    return jax.vmap(one)(cache_arr, new, idx)


def fused_decode_loop(cfg: LLMConfig, dtype, packed: Dict, last_logits,
                      cache: KVCache, *, max_new_tokens: int, eos_id: int):
    """Greedy scan over fused_decode_step — drop-in for the flax decode
    scan (models/vqa.py::_decode_loop fused branch)."""
    b = last_logits.shape[0]

    def body(state, _):
        last_logits, cache, done = state
        nxt = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, eos_id, nxt)
        logits, cache = fused_decode_step(cfg, dtype, packed, nxt, cache)
        done = done | (nxt == eos_id)
        return (logits, cache, done), nxt

    (_, _, _), tokens = jax.lax.scan(
        body, (last_logits.astype(dtype), cache,
               jnp.zeros((b,), bool)), None, length=max_new_tokens)
    tokens = tokens.T
    not_eos = tokens != eos_id
    lengths = jnp.sum(jnp.cumprod(not_eos.astype(jnp.int32), axis=1),
                      axis=1)
    return tokens, lengths
