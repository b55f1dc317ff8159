"""Image semantic-feature branch for multimodal focal sparse conv.

Re-design of the reference SemanticSeg package
(pcdet/models/backbones_3d/focal_sparse_conv/SemanticSeg/):
- `sem_deeplabv3.py` SegTemplate/SemDeepLabV3 wraps a torchvision
  deeplabv3_resnet50 and EARLY-RETURNS the requested backbone layers
  (`forward` returns right after `feat_extract_layer` extraction — the
  classifier head below it is dead code), so what the detector actually
  consumes is ResNet stem+layer1 features at stride 4;
- `pyramid_ffn.py` PyramidFeat2D channel-reduces each extracted layer via
  `basic_blocks.py` BasicBlock2D (conv+BN+ReLU).

TPU-first: NHWC convs (channels-last is the TPU conv layout), GroupNorm
instead of BatchNorm (no cross-host batch-stat sync in a branch that may
run frozen), bottleneck blocks written in flax.

Pretrained mode (`norm="frozen_bn"`): the reference runs this trunk with
torchvision deeplabv3_resnet50 weights, frozen, in eval mode — where
BatchNorm is just a per-channel affine y = x*scale + bias with
scale = γ/√(var+eps), bias = β − μ·scale. `FrozenBN` holds exactly that,
and the convs switch to torch-exact explicit padding (flax "SAME" pads
asymmetrically on stride-2, which would shift features vs torchvision).
`tools/validate_weights.py --component deeplabv3` converts a torchvision
state_dict into this tree (oracle: tests/test_semseg.py torch replica).
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class FrozenBN(nn.Module):
    """Eval-mode BatchNorm as a per-channel affine (the only form a frozen
    pretrained torchvision trunk ever evaluates): y = x*scale + bias with
    scale = γ/√(var+eps), bias = β − μ·scale, both baked at conversion
    (tools/validate_weights.py::convert_deeplabv3)."""
    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return x * scale + bias


def _make_norm(norm: str, ch: int, name: str):
    if norm == "frozen_bn":
        return FrozenBN(name=name)
    return nn.GroupNorm(num_groups=min(32, ch), name=name)


def _torch_pad(k: int):
    """torchvision explicit symmetric padding for a k-size conv (flax
    "SAME" pads asymmetrically under stride 2 — a feature shift vs torch)."""
    p = k // 2
    return ((p, p), (p, p))


class BasicBlock2D(nn.Module):
    """conv + norm + ReLU (reference basic_blocks.py:BasicBlock2D)."""
    out_ch: int
    kernel: int = 1
    stride: int = 1
    use_bias: bool = False
    norm: str = "gn"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = (_torch_pad(self.kernel) if self.norm == "frozen_bn"
               else "SAME")
        x = nn.Conv(self.out_ch, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=pad,
                    use_bias=self.use_bias, name="conv")(x)
        x = _make_norm(self.norm, self.out_ch, "norm")(x)
        return nn.relu(x)


class Bottleneck(nn.Module):
    """ResNet-v1 bottleneck (1x1 -> 3x3 -> 1x1, x4 expansion)."""
    width: int
    stride: int = 1
    norm: str = "gn"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out_ch = self.width * 4
        shortcut = x
        if x.shape[-1] != out_ch or self.stride != 1:
            shortcut = nn.Conv(out_ch, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="proj")(x)
            shortcut = _make_norm(self.norm, out_ch, "proj_norm")(shortcut)
        y = BasicBlock2D(self.width, kernel=1, norm=self.norm,
                         name="a")(x)
        y = BasicBlock2D(self.width, kernel=3, stride=self.stride,
                         norm=self.norm, name="b")(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, name="c")(y)
        y = _make_norm(self.norm, out_ch, "c_norm")(y)
        return nn.relu(y + shortcut)


_LAYER_SPECS = {  # ResNet-50 stage widths/depths (torchvision layout)
    "layer1": (64, 3, 1),
    "layer2": (128, 4, 2),
    "layer3": (256, 6, 2),
    "layer4": (512, 3, 2),
}


class ResNetFeatures(nn.Module):
    """Stem + layer1..layerN, returning the requested layers as a dict
    (SegTemplate's return_layers mechanism, sem_deeplabv3.py:37-44).

    Builds only as deep as the deepest requested layer — the focal /
    CaDDN configs extract `layer1` only, so the default stops at
    stride 4 / 256 channels.
    """
    layers_out: Sequence[str] = ("layer1",)
    norm: str = "gn"

    @nn.compact
    def __call__(self, images: jax.Array) -> Dict[str, jax.Array]:
        """[B, H, W, 3] in [0, 1] -> {layer: [B, H/s, W/s, C]}."""
        want = list(self.layers_out)
        deepest = max(int(l[-1]) for l in want)
        pad7 = _torch_pad(7) if self.norm == "frozen_bn" else "SAME"
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=pad7,
                    use_bias=False, name="stem_conv")(images)
        x = _make_norm(self.norm, 64, "stem_norm")(x)
        x = nn.relu(x)
        if self.norm == "frozen_bn":
            # torch MaxPool2d(3, 2, padding=1): explicit -inf pad + VALID
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                        constant_values=-jnp.inf)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        else:
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        out: Dict[str, jax.Array] = {}
        for li in range(1, deepest + 1):
            name = f"layer{li}"
            width, depth, stride = _LAYER_SPECS[name]
            for bi in range(depth):
                x = Bottleneck(width, stride=stride if bi == 0 else 1,
                               norm=self.norm, name=f"{name}_b{bi}")(x)
            if name in want:
                out[name] = x
        return out


class PyramidFeat2D(nn.Module):
    """ResNet feature extraction + per-layer channel reduce (reference
    pyramid_ffn.py:PyramidFeat2D). Returns {layer + "_feat2d": [B,h,w,C]}.
    """
    feat_layers: Sequence[str] = ("layer1",)
    reduce_out: Sequence[int] = (32,)
    reduce_kernel: Sequence[int] = (1,)
    # trunk norm: "gn" trains from scratch; "frozen_bn" loads a converted
    # torchvision deeplabv3_resnet50 trunk (the reduce heads stay GN —
    # they are trained with the detector either way, pyramid_ffn.py)
    trunk_norm: str = "gn"

    @nn.compact
    def __call__(self, images: jax.Array) -> Dict[str, jax.Array]:
        feats = ResNetFeatures(layers_out=tuple(self.feat_layers),
                               norm=self.trunk_norm, name="ifn")(images)
        out = {}
        for i, layer in enumerate(self.feat_layers):
            out[layer + "_feat2d"] = BasicBlock2D(
                self.reduce_out[i], kernel=self.reduce_kernel[i],
                name=f"reduce{i}")(feats[layer])
        return out


def project_voxels_to_image(coords: jax.Array, voxel_size, pc_range,
                            proj: jax.Array, stride: int = 1
                            ) -> Tuple[jax.Array, jax.Array]:
    """Voxel grid coords [V, 3] (x, y, z ints) -> pixel coords + validity.

    proj: [3, 4] combined camera matrix (KITTI: P2 @ R0_rect @
    Tr_velo_to_cam). Mirrors the reference's
    `calib.lidar_to_img(spatial_indices * voxel_size + range[:3])`
    (focal_sparse_conv.py:64-100) but stays jit-side: no host round trip.

    Returns (uv [V, 2] int32 pixel coords, valid [V] — in front of the
    camera). Bounds clipping happens at the gather.
    """
    vs = jnp.asarray(voxel_size, jnp.float32) * stride
    lo = jnp.asarray(pc_range[:3], jnp.float32)
    centers = coords.astype(jnp.float32) * vs[None] + lo[None]
    ones = jnp.ones((centers.shape[0], 1), jnp.float32)
    uvw = jnp.concatenate([centers, ones], axis=1) @ proj.T   # [V, 3]
    depth = uvw[:, 2]
    uv = uvw[:, :2] / jnp.maximum(depth, 1e-4)[:, None]
    return jnp.round(uv).astype(jnp.int32), depth > 0.1


def gather_image_features(image_feat: jax.Array, uv: jax.Array,
                          valid: jax.Array) -> jax.Array:
    """[H, W, C] image features + [V, 2] (u, v) pixels -> [V, C]; rows
    outside the image or behind the camera are zero (the reference zeros
    filtered voxels, focal_sparse_conv.py:102-104)."""
    h, w = image_feat.shape[:2]
    u = uv[:, 0]
    v = uv[:, 1]
    ok = valid & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    g = image_feat[jnp.clip(v, 0, h - 1), jnp.clip(u, 0, w - 1)]
    return jnp.where(ok[:, None], g, 0.0).astype(image_feat.dtype)
