"""Torch/HF checkpoint -> flax parameter converters.

Each converter consumes a numpy-valued state dict (torch-free) and returns a
partial flax params tree; `merge_params` overlays it onto a randomly
initialized tree, asserting shape agreement — the per-tensor checksum
discipline SURVEY.md §7.3 calls for.
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def merge_params(init_params: Dict, converted: Mapping, path: str = "") -> Dict:
    """Overlay `converted` onto `init_params` (depth-first), asserting that
    every converted leaf matches the initialized shape/dtype-kind. Keys
    missing from `converted` keep their random init (e.g. VARY net_2/net_3
    when loading a raw SAM checkpoint)."""
    out = dict(init_params)
    for k, v in converted.items():
        here = f"{path}/{k}"
        if k not in out:
            raise KeyError(f"converted key {here} not in model params; "
                           f"model has: {sorted(out.keys())[:20]}")
        if isinstance(v, Mapping):
            out[k] = merge_params(out[k], v, here)
        else:
            v = np.asarray(v)
            if tuple(out[k].shape) != tuple(v.shape):
                raise ValueError(
                    f"shape mismatch at {here}: model {tuple(out[k].shape)} "
                    f"vs checkpoint {tuple(v.shape)}")
            out[k] = v.astype(np.asarray(out[k]).dtype)
    return out


def count_converted_leaves(tree) -> int:
    n = 0
    for v in tree.values():
        n += count_converted_leaves(v) if isinstance(v, Mapping) else 1
    return n


from .clip_torch import convert_clip_state, from_transformers_clip  # noqa: E402
from .sam_torch import convert_sam_state, from_transformers_sam  # noqa: E402
from .swin_torch import convert_swin_state  # noqa: E402
from .vat_torch import (convert_projector_state,  # noqa: E402
                        convert_vat_lidar_state, convert_vat_vision_state,
                        convert_vision_adapter_state)

__all__ = ["merge_params", "count_converted_leaves", "convert_sam_state",
           "from_transformers_sam", "convert_clip_state",
           "from_transformers_clip", "convert_swin_state",
           "convert_vat_lidar_state", "convert_vat_vision_state",
           "convert_vision_adapter_state", "convert_projector_state"]
