"""SAM checkpoint converter: facebook segment-anything naming -> flax params.

The reference downloads the original SAM ViT-B checkpoint and remaps keys
three ways (sam_vary_sdpa.py:441-511 `_build_sam` + deepencoder_infer.py:
103-143 download). This converter consumes the same `image_encoder.*` key
space (plus optional VARY `net_2`/`net_3` keys from a trained reference
checkpoint) and emits the parameter tree of
lvv_tpu.models.sam.SAMImageEncoder.

All inputs are numpy arrays (call `.numpy()` on torch tensors first) so the
converter has no torch dependency.
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _linear(w: np.ndarray) -> np.ndarray:
    """torch [out, in] -> flax [in, out]."""
    return np.transpose(w, (1, 0))


def convert_sam_state(sd: Mapping[str, np.ndarray], depth: int = 12,
                      prefix: str = "image_encoder.") -> Dict:
    """Returns the flax `params` dict for SAMImageEncoder (sans batch stats).

    Missing VARY keys (net_2/net_3) are simply absent from the result; merge
    over randomly-initialized params with lvv_tpu.convert.merge_params.
    """
    g = lambda k: np.asarray(sd[prefix + k])
    p: Dict = {}
    p["patch_embed"] = {"kernel": _conv_kernel(g("patch_embed.proj.weight")),
                        "bias": g("patch_embed.proj.bias")}
    pos = g("pos_embed")  # [1, G, G, C] already channels-last in SAM
    p["pos_embed"] = pos

    for i in range(depth):
        b = f"blocks.{i}."
        blk = {
            "ln1": {"scale": g(b + "norm1.weight"),
                    "bias": g(b + "norm1.bias")},
            "ln2": {"scale": g(b + "norm2.weight"),
                    "bias": g(b + "norm2.bias")},
            "attn": {
                "qkv": {"kernel": _linear(g(b + "attn.qkv.weight")),
                        "bias": g(b + "attn.qkv.bias")},
                "proj": {"kernel": _linear(g(b + "attn.proj.weight")),
                         "bias": g(b + "attn.proj.bias")},
            },
            "mlp": {
                "fc1": {"kernel": _linear(g(b + "mlp.lin1.weight")),
                        "bias": g(b + "mlp.lin1.bias")},
                "fc2": {"kernel": _linear(g(b + "mlp.lin2.weight")),
                        "bias": g(b + "mlp.lin2.bias")},
            },
        }
        if prefix + b + "attn.rel_pos_h" in sd:
            blk["attn"]["rel_pos_h"] = g(b + "attn.rel_pos_h")
            blk["attn"]["rel_pos_w"] = g(b + "attn.rel_pos_w")
        p[f"block_{i}"] = blk

    p["neck_conv1"] = {"kernel": _conv_kernel(g("neck.0.weight"))}
    p["neck_ln1"] = {"scale": g("neck.1.weight"), "bias": g("neck.1.bias")}
    p["neck_conv2"] = {"kernel": _conv_kernel(g("neck.2.weight"))}
    p["neck_ln2"] = {"scale": g("neck.3.weight"), "bias": g("neck.3.bias")}

    # VARY compression head, present only in trained reference checkpoints
    for name in ("net_2", "net_3"):
        key = prefix + name + ".weight"
        if key in sd:
            p[name] = {"kernel": _conv_kernel(np.asarray(sd[key]))}
    return p


def from_transformers_sam(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Rename a transformers SamVisionModel state dict to facebook naming
    (test oracle path; transformers is the only SAM torch impl in the image).
    """
    out = {}
    # order matters: the neck's layer_norm keys must rewrite before the
    # generic block layer_norm patterns
    ren = {
        "patch_embed.projection.": "patch_embed.proj.",
        "neck.conv1.": "neck.0.", "neck.layer_norm1.": "neck.1.",
        "neck.conv2.": "neck.2.", "neck.layer_norm2.": "neck.3.",
        "layer_norm1.": "norm1.", "layer_norm2.": "norm2.",
    }
    for k, v in sd.items():
        k = k.replace("vision_encoder.", "")
        k = k.replace("layers.", "blocks.")
        for a, b in ren.items():
            k = k.replace(a, b)
        out["image_encoder." + k] = np.asarray(v)
    return out
