"""HF Qwen2/Qwen2.5 checkpoint converter -> flax params for QwenModel.

The reference consumes HF `Qwen2ForCausalLM` directly (model_setup.py:51-61);
here HF weights convert once into the JAX tree. Also converts PEFT LoRA
state dicts (`lora.pt` files saved by the reference trainer,
checkpoints.py) into the `lora_a`/`lora_b` params of lvv_tpu Dense layers.
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _linear(w):
    return np.transpose(np.asarray(w), (1, 0))


def convert_qwen_state(sd: Mapping[str, np.ndarray], num_layers: int,
                       tie_word_embeddings: bool = True,
                       extra_tokens: int = 0) -> Dict:
    """HF `model.*` key space -> QwenModel params. If `extra_tokens` > 0 the
    embedding matrix is extended with mean-initialized rows (the reference
    resize_token_embeddings default init is mean of existing rows)."""
    g = lambda k: np.asarray(sd[k])
    emb = g("model.embed_tokens.weight")
    if extra_tokens:
        mean = emb.mean(axis=0, keepdims=True)
        emb = np.concatenate([emb] + [mean] * extra_tokens, axis=0)
    p: Dict = {"embed_tokens": {"embedding": emb},
               "final_ln": {"scale": g("model.norm.weight")}}
    for i in range(num_layers):
        b = f"model.layers.{i}."
        p[f"layer_{i}"] = {
            "input_ln": {"scale": g(b + "input_layernorm.weight")},
            "post_attn_ln": {"scale": g(b + "post_attention_layernorm.weight")},
            "attn": {
                "q_proj": {"kernel": _linear(g(b + "self_attn.q_proj.weight")),
                           "bias": g(b + "self_attn.q_proj.bias")},
                "k_proj": {"kernel": _linear(g(b + "self_attn.k_proj.weight")),
                           "bias": g(b + "self_attn.k_proj.bias")},
                "v_proj": {"kernel": _linear(g(b + "self_attn.v_proj.weight")),
                           "bias": g(b + "self_attn.v_proj.bias")},
                "o_proj": {"kernel": _linear(g(b + "self_attn.o_proj.weight"))},
            },
            "mlp": {
                "gate_proj": {"kernel": _linear(g(b + "mlp.gate_proj.weight"))},
                "up_proj": {"kernel": _linear(g(b + "mlp.up_proj.weight"))},
                "down_proj": {"kernel": _linear(g(b + "mlp.down_proj.weight"))},
            },
        }
    if not tie_word_embeddings and "lm_head.weight" in sd:
        w = g("lm_head.weight")
        if extra_tokens:
            mean = w.mean(axis=0, keepdims=True)
            w = np.concatenate([w] + [mean] * extra_tokens, axis=0)
        p["lm_head"] = {"kernel": _linear(w)}
    return p


def convert_peft_lora(sd: Mapping[str, np.ndarray], num_layers: int) -> Dict:
    """PEFT LoRA state dict (`base_model.model.model.layers.N.self_attn.
    q_proj.lora_A.weight` style, as saved by the reference trainer) ->
    partial params tree carrying only lora_a / lora_b leaves."""
    p: Dict = {}
    for k, v in sd.items():
        v = np.asarray(v)
        parts = k.split(".")
        if "layers" not in parts or "lora_A" not in k and "lora_B" not in k:
            continue
        i = int(parts[parts.index("layers") + 1])
        proj = next(s for s in parts if s.endswith("_proj"))
        which = "lora_a" if "lora_A" in k else "lora_b"
        # PEFT stores lora_A [r, in], lora_B [out, r]; flax wants [in, r], [r, out]
        layer = p.setdefault(f"layer_{i}", {}).setdefault("attn", {})
        layer.setdefault(proj, {})[which] = _linear(v)
    return p
