"""Reference trained-checkpoint converters for the fusion modules:
VATLiDAR / VATVision / VisionAdapter / MlpProjector.

The reference saves these as raw torch ``state_dict``s inside its training
checkpoint (training/core/checkpoints + inference/model_loader.py:23-310):
``vat_lidar``, ``vat_vision``, ``vision_adapter``, and the DeepEncoder
runtime's ``projector``. Key naming follows the reference modules:

- vat_lidar (training/models/vat_lidar.py:42-304): refine.0 (dw conv),
  proj (1x1 conv), norm_tokens, geo_mlp.{0,2}, view_embed, query,
  blocks.N.{sa_ln, sa.in_proj_*, sa.out_proj, ca_ln, ca.*, mlp_ln,
  mlp.{0,3}}, final_ln, post.{0,1,4}.
- vat_vision (training/models/vat_vision.py:20-235): query,
  view_query_embed, blocks.N.*, final_ln, post.{0,1,4},
  proj.{0,1,4,5} (LN, fc1, fc2, LN).
- vision_adapter (training/models/vision_adapter.py:35-145): norm,
  view_embed.
- projector (deepencoder/build_linear.py MlpProjector): ``layers`` —
  a Linear ("linear") or Sequential of Linears ("*mlp_gelu").

Each converter consumes a numpy state dict and returns a partial flax tree
for `merge_params` (torch-free, like the other converters in this package).
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _lin(w: np.ndarray) -> np.ndarray:
    """torch Linear weight [out, in] -> flax kernel [in, out]."""
    return np.ascontiguousarray(np.asarray(w).T)


def _ln(sd: Mapping, pfx: str) -> Dict[str, np.ndarray]:
    return {"scale": np.asarray(sd[pfx + ".weight"]),
            "bias": np.asarray(sd[pfx + ".bias"])}


def _dense(sd: Mapping, pfx: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _lin(sd[pfx + ".weight"])}
    if pfx + ".bias" in sd:
        out["bias"] = np.asarray(sd[pfx + ".bias"])
    return out


def _mha(sd: Mapping, pfx: str) -> Dict[str, Dict[str, np.ndarray]]:
    """torch nn.MultiheadAttention -> layers.MultiHeadAttention
    (q_proj/k_proj/v_proj/o_proj). in_proj packs [3d, d]."""
    w = np.asarray(sd[pfx + ".in_proj_weight"])
    b = np.asarray(sd[pfx + ".in_proj_bias"])
    d = w.shape[0] // 3
    return {
        "q_proj": {"kernel": _lin(w[:d]), "bias": b[:d]},
        "k_proj": {"kernel": _lin(w[d:2 * d]), "bias": b[d:2 * d]},
        "v_proj": {"kernel": _lin(w[2 * d:]), "bias": b[2 * d:]},
        "o_proj": {"kernel": _lin(sd[pfx + ".out_proj.weight"]),
                   "bias": np.asarray(sd[pfx + ".out_proj.bias"])},
    }


def _vat_block(sd: Mapping, pfx: str) -> Dict:
    return {
        "ln_self": _ln(sd, pfx + ".sa_ln"),
        "self_attn": _mha(sd, pfx + ".sa"),
        "ln_cross_q": _ln(sd, pfx + ".ca_ln"),
        "cross_attn": _mha(sd, pfx + ".ca"),
        "ln_mlp": _ln(sd, pfx + ".mlp_ln"),
        "mlp": {"fc1": _dense(sd, pfx + ".mlp.0"),
                "fc2": _dense(sd, pfx + ".mlp.3")},
    }


def _n_blocks(sd: Mapping, pfx: str = "blocks.") -> int:
    n = 0
    while f"{pfx}{n}.sa_ln.weight" in sd:
        n += 1
    return n


def convert_vat_lidar_state(sd: Mapping[str, np.ndarray]) -> Dict:
    """Reference VATLiDAR state dict -> flax `vat_lidar` subtree."""
    dw = np.asarray(sd["refine.0.weight"])        # [C, 1, k, k]
    out = {
        # torch dw conv [C, 1, k, k] -> flax NHWC [k, k, 1, C]
        "dw_refine": {"kernel": np.ascontiguousarray(
            dw.transpose(2, 3, 1, 0)),
            "bias": np.asarray(sd["refine.0.bias"])},
        # 1x1 conv [d_model, C, 1, 1] -> Dense kernel [C, d_model]
        "in_proj": {"kernel": _lin(np.asarray(sd["proj.weight"])[:, :, 0, 0]),
                    "bias": np.asarray(sd["proj.bias"])},
        "in_ln": _ln(sd, "norm_tokens"),
        "pe_fc1": _dense(sd, "geo_mlp.0"),
        "pe_fc2": _dense(sd, "geo_mlp.2"),
        "sector_embed": np.asarray(sd["view_embed"]),
        "queries": np.asarray(sd["query"]),
        "final_ln": _ln(sd, "final_ln"),
        "post_ln": _ln(sd, "post.0"),
        "post_fc1": _dense(sd, "post.1"),
        "post_fc2": _dense(sd, "post.4"),
    }
    for i in range(_n_blocks(sd)):
        out[f"block_{i}"] = _vat_block(sd, f"blocks.{i}")
    return out


def convert_vat_vision_state(sd: Mapping[str, np.ndarray]) -> Dict:
    """Reference VATVision state dict -> flax `vat_vision` subtree."""
    out = {
        "queries": np.asarray(sd["query"]),
        "final_ln": _ln(sd, "final_ln"),
        "post_ln": _ln(sd, "post.0"),
        "post_fc1": _dense(sd, "post.1"),
        "post_fc2": _dense(sd, "post.4"),
        "proj_ln": _ln(sd, "proj.0"),
        "proj_fc1": _dense(sd, "proj.1"),
        "proj_fc2": _dense(sd, "proj.4"),
        "out_ln": _ln(sd, "proj.5"),
    }
    if "view_query_embed" in sd and sd["view_query_embed"] is not None:
        out["view_embed"] = np.asarray(sd["view_query_embed"])
    for i in range(_n_blocks(sd)):
        out[f"block_{i}"] = _vat_block(sd, f"blocks.{i}")
    return out


def convert_vision_adapter_state(sd: Mapping[str, np.ndarray]) -> Dict:
    """Reference VisionAdapter state dict -> flax `adapter` subtree."""
    return {"ln": _ln(sd, "norm"),
            "view_embed": np.asarray(sd["view_embed"])}


def convert_projector_state(sd: Mapping[str, np.ndarray],
                            kind: str = "linear") -> Dict:
    """Reference MlpProjector (deepencoder/build_linear.py) -> flax
    `projector` subtree for the linear / mlp_gelu / downsample kinds."""
    if kind == "identity":
        return {}
    if kind == "linear":
        return {"proj": _dense(sd, "layers")}
    if kind in ("mlp_gelu", "downsample_mlp_gelu",
                "normlayer_downsample_mlp_gelu"):
        out: Dict = {}
        if kind.startswith("normlayer"):
            # reference stacks LayerNorm first (build_linear.py:31-41)
            out["pre_ln"] = _ln(sd, "layers.0")
            base = 1
        else:
            base = 0
        i, li = base, 0
        while f"layers.{i}.weight" in sd:
            w = np.asarray(sd[f"layers.{i}.weight"])
            if w.ndim != 2:      # skip any non-linear entries defensively
                i += 1
                continue
            # flax naming: projector._mlp emits Dense layers "mlp_0",
            # "mlp_1", ... (models/projector.py:30-34)
            out[f"mlp_{li}"] = _dense(sd, f"layers.{i}")
            li += 1
            i += 2               # GELUs hold no params but occupy slots
        return out
    raise ValueError(f"no converter for projector kind {kind!r}")
