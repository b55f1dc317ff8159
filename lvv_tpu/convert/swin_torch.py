"""transformers SwinModel state dict -> flax SwinBackbone params.

(The reference's BEVFusion Swin checkpoints are mmcv-style but key-map to
the transformers layout one-to-one; this converter consumes the
transformers naming.)
"""
from __future__ import annotations

from typing import Dict, Mapping, Sequence

import numpy as np


def _lin(w):
    return np.transpose(np.asarray(w), (1, 0))


def convert_swin_state(sd: Mapping[str, np.ndarray],
                       depths: Sequence[int]) -> Dict:
    g = lambda k: np.asarray(sd[k])
    p: Dict = {
        "patch_embed": {
            "kernel": np.transpose(
                g("embeddings.patch_embeddings.projection.weight"),
                (2, 3, 1, 0)),
            "bias": g("embeddings.patch_embeddings.projection.bias")},
        "embed_norm": {"scale": g("embeddings.norm.weight"),
                       "bias": g("embeddings.norm.bias")},
        "final_norm": {"scale": g("layernorm.weight"),
                       "bias": g("layernorm.bias")},
    }
    for si, depth in enumerate(depths):
        for bi in range(depth):
            b = f"encoder.layers.{si}.blocks.{bi}."
            p[f"stage{si}_block{bi}"] = {
                "ln1": {"scale": g(b + "layernorm_before.weight"),
                        "bias": g(b + "layernorm_before.bias")},
                "ln2": {"scale": g(b + "layernorm_after.weight"),
                        "bias": g(b + "layernorm_after.bias")},
                "q": {"kernel": _lin(g(b + "attention.self.query.weight")),
                      "bias": g(b + "attention.self.query.bias")},
                "k": {"kernel": _lin(g(b + "attention.self.key.weight")),
                      "bias": g(b + "attention.self.key.bias")},
                "v": {"kernel": _lin(g(b + "attention.self.value.weight")),
                      "bias": g(b + "attention.self.value.bias")},
                "proj": {"kernel": _lin(
                    g(b + "attention.output.dense.weight")),
                    "bias": g(b + "attention.output.dense.bias")},
                "fc1": {"kernel": _lin(g(b + "intermediate.dense.weight")),
                        "bias": g(b + "intermediate.dense.bias")},
                "fc2": {"kernel": _lin(g(b + "output.dense.weight")),
                        "bias": g(b + "output.dense.bias")},
                "rel_bias_table": g(
                    b + "attention.self.relative_position_bias_table"),
            }
        if si < len(depths) - 1:
            d = f"encoder.layers.{si}.downsample."
            p[f"downsample{si}"] = {
                "norm": {"scale": g(d + "norm.weight"),
                         "bias": g(d + "norm.bias")},
                "reduction": {"kernel": _lin(g(d + "reduction.weight"))},
            }
    return p
