"""Qwen2.5-family causal decoder in JAX, with LoRA and KV-cache decode.

The reference wraps HF `Qwen2ForCausalLM` frozen + PEFT LoRA
(src/encoder-decoder/training/core/model_setup.py:51-67) and feeds it
`inputs_embeds` with spliced multimodal prefixes (trainer.py:607-674,
inference_engine.py:139-227). This module is the TPU-native equivalent:

- the primary interface takes `inputs_embeds` (the VQA stack splices prefix
  tokens before the text embedding lookup), with causal masking + right-pad
  `seq_len` masking through the fused attention op;
- GQA (14 query / 2 kv heads at 0.5B) flows through the attention op's head
  -group index maps — KV is never repeated in HBM;
- LoRA adapters are extra low-rank params on q/k/v/o (reference
  lora_utils.make_lora targets), enabled by `lora_rank`;
- greedy/sampled decode uses a per-layer KV cache pytree and one jit'd step;
- embedding rows for the 4 multimodal special tokens extend the vocab
  (reference model_setup.py:40-61 resize_token_embeddings).

Architecture constants follow Qwen2.5 (RMSNorm, SwiGLU, RoPE theta 1e6,
q/k/v biases, tied embeddings at 0.5B).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.schema import LLMConfig
from ..ops.attention import attention, decode_attention
from .layers import Dense, RMSNorm


def rope_freqs(head_dim: int, theta: float) -> jax.Array:
    return 1.0 / (theta ** (jnp.arange(0, head_dim, 2,
                                       dtype=jnp.float32) / head_dim))


def apply_rope(x: jax.Array, positions: jax.Array, theta: float) -> jax.Array:
    """x [B, H, S, D], positions [B, S] -> rotated x (neox half-split)."""
    d = x.shape[-1]
    freqs = rope_freqs(d, theta)                      # [D/2]
    ang = positions[:, None, :, None].astype(jnp.float32) * freqs  # [B,1,S,D/2]
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    x1, x2 = x[..., : d // 2], x[..., d // 2:]
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


class KVCache(NamedTuple):
    k: Any  # list of [B, Hkv, Smax, D] per layer (pytree)
    v: Any
    length: jax.Array  # [B] filled length


class QwenAttention(nn.Module):
    cfg: LLMConfig
    dtype: jnp.dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: float = 1.0

    def _proj(self, x):
        c = self.cfg
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
                    dtype=self.dtype)
        q = Dense(c.num_heads * c.head_dim, name="q_proj", **lora)(x)
        k = Dense(c.num_kv_heads * c.head_dim, name="k_proj", **lora)(x)
        v = Dense(c.num_kv_heads * c.head_dim, name="v_proj", **lora)(x)
        b, s, _ = x.shape
        q = q.reshape(b, s, c.num_heads, c.head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, c.num_kv_heads, c.head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, c.num_kv_heads, c.head_dim).transpose(0, 2, 1, 3)
        return q, k, v

    def _out(self, o):
        b, h, s, d = o.shape
        o = o.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        return Dense(self.cfg.hidden_size, use_bias=False, name="o_proj",
                     dtype=self.dtype, lora_rank=self.lora_rank,
                     lora_alpha=self.lora_alpha)(o)

    @nn.compact
    def __call__(self, x, positions, seq_len=None, cache=None,
                 layer_idx: int = 0):
        c = self.cfg
        s = x.shape[1]
        q, k, v = self._proj(x)
        q = apply_rope(q, positions, c.rope_theta)
        k = apply_rope(k, positions, c.rope_theta)
        if cache is None:
            o = attention(q, k, v, causal=True, kv_len=seq_len)
            return self._out(o), None
        kc, vc = cache.k[layer_idx], cache.v[layer_idx]
        if s > 1:
            # prefill: write the whole (right-padded) block at offset 0 and
            # attend causally with the true lengths; padded rows in the cache
            # sit beyond cache.length and are later overwritten by decode
            kc = jax.lax.dynamic_update_slice(kc, k, (0, 0, 0, 0))
            vc = jax.lax.dynamic_update_slice(vc, v, (0, 0, 0, 0))
            o = attention(q, k, v, causal=True, kv_len=seq_len)
        else:
            # single-token decode: write k/v at position cache.length
            idx = cache.length  # [B]
            kc = _cache_write(kc, k, idx)
            vc = _cache_write(vc, v, idx)
            o = decode_attention(q, kc, vc, idx + 1)
        return self._out(o), (kc, vc)


def _cache_write(cache: jax.Array, new: jax.Array, idx: jax.Array):
    """cache [B, H, Smax, D], new [B, H, 1, D], idx [B] -> updated cache."""
    def write_one(c, n, i):
        return jax.lax.dynamic_update_slice(c, n, (0, i, 0))
    return jax.vmap(write_one)(cache, new, idx)


class QwenMLP(nn.Module):
    cfg: LLMConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        gate = Dense(c.intermediate_size, use_bias=False, dtype=self.dtype,
                     name="gate_proj")(x)
        up = Dense(c.intermediate_size, use_bias=False, dtype=self.dtype,
                   name="up_proj")(x)
        return Dense(c.hidden_size, use_bias=False, dtype=self.dtype,
                     name="down_proj")(nn.silu(gate) * up)


class QwenLayer(nn.Module):
    cfg: LLMConfig
    dtype: jnp.dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: float = 1.0

    @nn.compact
    def __call__(self, x, positions, seq_len=None, cache=None,
                 layer_idx: int = 0):
        h, kv = QwenAttention(self.cfg, dtype=self.dtype,
                              lora_rank=self.lora_rank,
                              lora_alpha=self.lora_alpha, name="attn")(
            RMSNorm(eps=self.cfg.rms_norm_eps, name="input_ln")(x),
            positions, seq_len, cache, layer_idx)
        x = x + h
        x = x + QwenMLP(self.cfg, dtype=self.dtype, name="mlp")(
            RMSNorm(eps=self.cfg.rms_norm_eps, name="post_attn_ln")(x))
        return x, kv


class QwenModel(nn.Module):
    """Decoder stack. Call patterns:

    - training / prefill: `model.apply(p, inputs_embeds=e, positions=pos,
      seq_len=lens)` -> logits [B, S, V]
    - decode step: `..., cache=cache)` with S == 1 -> (logits, new_cache)
    - token ids: `model.apply(p, input_ids=ids, method=QwenModel.embed)` for
      the embedding table alone (the VQA stack embeds text then splices).
    """
    cfg: LLMConfig
    dtype: jnp.dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: float = 1.0
    extra_tokens: int = 0   # appended special-token rows
    remat: bool = False     # rematerialize each layer's activations on the
                            # backward pass (reference gradient_checkpointing
                            # at model_setup.py:51-61; jax.checkpoint here)

    @property
    def vocab_total(self) -> int:
        return self.cfg.vocab_size + self.extra_tokens

    def setup(self):
        c = self.cfg
        self.embed_tokens = nn.Embed(self.vocab_total, c.hidden_size,
                                     embedding_init=nn.initializers.normal(0.02),
                                     name="embed_tokens")
        layer_cls = nn.remat(QwenLayer,
                             static_argnums=()) if self.remat else QwenLayer
        self.layers = [layer_cls(c, dtype=self.dtype,
                                 lora_rank=self.lora_rank,
                                 lora_alpha=self.lora_alpha,
                                 name=f"layer_{i}")
                       for i in range(c.num_layers)]
        self.final_ln = RMSNorm(eps=c.rms_norm_eps, name="final_ln")
        if not c.tie_word_embeddings:
            self.lm_head = Dense(self.vocab_total, use_bias=False,
                                 dtype=self.dtype, name="lm_head")

    def embed(self, input_ids):
        return self.embed_tokens(input_ids).astype(self.dtype)

    def unembed(self, hidden):
        if self.cfg.tie_word_embeddings:
            if self.has_variable("params", "unembed_q"):
                # weight-only int8 serving copy of the tied table (added by
                # ops.quant.quantize_llm_params): streams [V, H] int8 with
                # per-row scales — the decode unembed alone reads 272 MB/
                # step in bf16. Dequant rides INSIDE the XLA dot (convert +
                # scale fuse into the operand read): 0.81 vs 1.49 ms/token
                # whole-stack, while the pallas qmv path measured 1.94
                # (benchmarks/decode_stream_micro.json)
                uq = self.get_variable("params", "unembed_q")
                # Scale OUTPUT-side: one [B, V] multiply with f32-exact
                # per-row scales; the int8 table feeds the dot directly so
                # no dequantized [V, H] bf16 copy can materialize (the
                # weight-side form risked a ~272 MB intermediate if XLA
                # failed to fuse the broadcast into the operand read).
                # Matches the variant decode_stream_micro.py benchmarked.
                logits = hidden.astype(self.dtype) @ uq["q"].T.astype(self.dtype)
                # cast back: the f32 scales would otherwise promote the
                # decode-scan logits carry to f32 (dtype-mismatch crash)
                return (logits * uq["s"]).astype(self.dtype)
            table = self.embed_tokens.embedding
            return hidden @ table.T.astype(self.dtype)
        return self.lm_head(hidden)

    def __call__(self, inputs_embeds, positions=None, seq_len=None,
                 cache: Optional[KVCache] = None,
                 last_pos: Optional[jax.Array] = None):
        b, s, _ = inputs_embeds.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
        x = inputs_embeds.astype(self.dtype)
        new_k, new_v = [], []
        for i, layer in enumerate(self.layers):
            x, kv = layer(x, positions, seq_len, cache, i)
            if kv is not None:
                new_k.append(kv[0])
                new_v.append(kv[1])
        x = self.final_ln(x)
        if last_pos is not None:
            # generation prefill: only the last real position feeds the
            # first decode step — gather the hidden row BEFORE the unembed
            # so the [B, S, V] logits tensor (7.1 GB at B=16, S=1564) never
            # materializes; unembed runs on [B, 1, H]
            x = jnp.take_along_axis(
                x, last_pos[:, None, None].astype(jnp.int32), axis=1)
        logits = self.unembed(x)
        if cache is not None:
            if s > 1:  # prefill: cache filled up to the true lengths
                assert seq_len is not None, "prefill needs seq_len"
                new_len = seq_len
            else:
                new_len = cache.length + 1
            return logits, KVCache(k=new_k, v=new_v, length=new_len)
        return logits


def init_cache(cfg: LLMConfig, batch: int, max_len: int,
               dtype=jnp.float32) -> KVCache:
    shape = (batch, cfg.num_kv_heads, max_len, cfg.head_dim)
    return KVCache(
        k=[jnp.zeros(shape, dtype) for _ in range(cfg.num_layers)],
        v=[jnp.zeros(shape, dtype) for _ in range(cfg.num_layers)],
        length=jnp.zeros((batch,), jnp.int32))


def cross_entropy_loss(logits: jax.Array, labels: jax.Array,
                       ignore_index: int = -100):
    """Masked CE (reference labels = -100 outside the answer tail,
    trainer.py:661-663). Returns (mean_loss, token_count)."""
    mask = labels != ignore_index
    safe = jnp.where(mask, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    total = jnp.sum(nll * mask)
    count = jnp.maximum(jnp.sum(mask), 1)
    return total / count, count
