"""OpenCLIP ViT-L/14 visual-tower converter -> flax params.

The reference loads OpenCLIP weights key-by-key into its VitModel
(deepencoder_infer.py:195-278). This converter consumes the same
`visual.*` key space (class_embedding / positional_embedding / conv1 /
ln_pre / transformer.resblocks.N.{ln_1, attn.in_proj_*, attn.out_proj,
ln_2, mlp.c_fc, mlp.c_proj}) and emits the parameter tree of
lvv_tpu.models.clip.CLIPVisionTower. `from_transformers_clip` renames a
transformers CLIPVisionModel state dict into that key space (test oracle).
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _linear(w):
    return np.transpose(np.asarray(w), (1, 0))


def convert_clip_state(sd: Mapping[str, np.ndarray], num_layers: int = 24,
                       prefix: str = "visual.") -> Dict:
    g = lambda k: np.asarray(sd[prefix + k])
    p: Dict = {"cls_token": g("class_embedding"),
               "pos_embed": g("positional_embedding"),
               "patch_embed": {"kernel": np.transpose(
                   g("conv1.weight"), (2, 3, 1, 0))},
               "pre_ln": {"scale": g("ln_pre.weight"),
                          "bias": g("ln_pre.bias")}}
    for i in range(num_layers):
        b = f"transformer.resblocks.{i}."
        w = g(b + "attn.in_proj_weight")       # [3H, H] rows = q,k,v
        bias = g(b + "attn.in_proj_bias")
        h = w.shape[1]
        qw, kw, vw = w[:h], w[h:2 * h], w[2 * h:]
        qb, kb, vb = bias[:h], bias[h:2 * h], bias[2 * h:]
        p[f"layer_{i}"] = {
            "ln1": {"scale": g(b + "ln_1.weight"), "bias": g(b + "ln_1.bias")},
            "ln2": {"scale": g(b + "ln_2.weight"), "bias": g(b + "ln_2.bias")},
            "attn": {
                "q_proj": {"kernel": _linear(qw), "bias": qb},
                "k_proj": {"kernel": _linear(kw), "bias": kb},
                "v_proj": {"kernel": _linear(vw), "bias": vb},
                "o_proj": {"kernel": _linear(g(b + "attn.out_proj.weight")),
                           "bias": g(b + "attn.out_proj.bias")},
            },
            "fc1": {"kernel": _linear(g(b + "mlp.c_fc.weight")),
                    "bias": g(b + "mlp.c_fc.bias")},
            "fc2": {"kernel": _linear(g(b + "mlp.c_proj.weight")),
                    "bias": g(b + "mlp.c_proj.bias")},
        }
    return p


def from_transformers_clip(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """transformers CLIPVisionModel naming -> OpenCLIP `visual.*` naming.

    transformers keeps q/k/v unpacked; we repack into in_proj_(weight|bias).
    """
    out: Dict[str, np.ndarray] = {}
    tmp: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        v = np.asarray(v)
        k = k.replace("vision_model.", "")
        if k == "embeddings.class_embedding":
            out["visual.class_embedding"] = v
        elif k == "embeddings.position_embedding.weight":
            out["visual.positional_embedding"] = v
        elif k == "embeddings.patch_embedding.weight":
            out["visual.conv1.weight"] = v
        elif k.startswith("pre_layrnorm."):
            out["visual.ln_pre." + k.split(".", 1)[1]] = v
        elif k.startswith("encoder.layers."):
            parts = k.split(".")
            i, rest = parts[2], ".".join(parts[3:])
            b = f"visual.transformer.resblocks.{i}."
            ren = {"layer_norm1.weight": "ln_1.weight",
                   "layer_norm1.bias": "ln_1.bias",
                   "layer_norm2.weight": "ln_2.weight",
                   "layer_norm2.bias": "ln_2.bias",
                   "mlp.fc1.weight": "mlp.c_fc.weight",
                   "mlp.fc1.bias": "mlp.c_fc.bias",
                   "mlp.fc2.weight": "mlp.c_proj.weight",
                   "mlp.fc2.bias": "mlp.c_proj.bias",
                   "self_attn.out_proj.weight": "attn.out_proj.weight",
                   "self_attn.out_proj.bias": "attn.out_proj.bias"}
            if rest in ren:
                out[b + ren[rest]] = v
            elif rest.startswith("self_attn."):
                tmp.setdefault(i, {})[rest.split(".", 1)[1]] = v
    for i, d in tmp.items():
        b = f"visual.transformer.resblocks.{i}."
        out[b + "attn.in_proj_weight"] = np.concatenate(
            [d["q_proj.weight"], d["k_proj.weight"], d["v_proj.weight"]], 0)
        out[b + "attn.in_proj_bias"] = np.concatenate(
            [d["q_proj.bias"], d["k_proj.bias"], d["v_proj.bias"]], 0)
    return out
