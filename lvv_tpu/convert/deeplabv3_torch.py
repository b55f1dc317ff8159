"""torchvision deeplabv3_resnet50 -> lvv_tpu semseg trunk converter.

The reference's multimodal focal conv loads a pretrained torchvision
deeplabv3_resnet50 and consumes ONLY the ResNet backbone up to the
requested `feat_extract_layer` (sem_deeplabv3.py:34-76 — the classifier
below the extraction point is dead code). This converts the torchvision
`backbone.*` state_dict into the flax `ResNetFeatures(norm="frozen_bn")`
tree: conv weights transpose OIHW->HWIO, every BatchNorm folds to the
eval-mode per-channel affine FrozenBN holds
(scale = gamma/sqrt(var+eps), bias = beta - mean*scale).

Key layout (torchvision resnet):
  backbone.conv1/bn1                      -> stem_conv / stem_norm
  backbone.layer{L}.{B}.conv{1,2,3}/bn{.} -> layer{L}_b{B}.{a,b}.conv /
                                             {a,b}.norm, .c / c_norm
  backbone.layer{L}.{B}.downsample.{0,1}  -> proj / proj_norm
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

_BN_EPS = 1e-5   # torchvision BatchNorm2d default


def _conv(w: np.ndarray) -> Dict:
    return {"kernel": np.transpose(np.asarray(w), (2, 3, 1, 0))}


def _frozen_bn(sd: Mapping, key: str) -> Dict:
    g = np.asarray(sd[key + ".weight"], np.float32)
    b = np.asarray(sd[key + ".bias"], np.float32)
    mu = np.asarray(sd[key + ".running_mean"], np.float32)
    var = np.asarray(sd[key + ".running_var"], np.float32)
    scale = g / np.sqrt(var + _BN_EPS)
    return {"scale": scale, "bias": b - mu * scale}


_DEPTHS = {"layer1": 3, "layer2": 4, "layer3": 6, "layer4": 3}


def convert_deeplabv3_state(sd: Mapping[str, np.ndarray],
                            layers: tuple = ("layer1",),
                            prefix: str = "backbone.") -> Dict:
    """-> flax params for ResNetFeatures(layers_out=layers,
    norm="frozen_bn"), the deepest requested layer included."""
    out: Dict = {
        "stem_conv": _conv(sd[prefix + "conv1.weight"]),
        "stem_norm": _frozen_bn(sd, prefix + "bn1"),
    }
    deepest = max(int(l[-1]) for l in layers)
    for li in range(1, deepest + 1):
        lname = f"layer{li}"
        for bi in range(_DEPTHS[lname]):
            t = f"{prefix}{lname}.{bi}."
            blk: Dict = {
                "a": {"conv": _conv(sd[t + "conv1.weight"]),
                      "norm": _frozen_bn(sd, t + "bn1")},
                "b": {"conv": _conv(sd[t + "conv2.weight"]),
                      "norm": _frozen_bn(sd, t + "bn2")},
                "c": _conv(sd[t + "conv3.weight"]),
                "c_norm": _frozen_bn(sd, t + "bn3"),
            }
            if t + "downsample.0.weight" in sd:
                blk["proj"] = _conv(sd[t + "downsample.0.weight"])
                blk["proj_norm"] = _frozen_bn(sd, t + "downsample.1")
            out[f"{lname}_b{bi}"] = blk
    return out
