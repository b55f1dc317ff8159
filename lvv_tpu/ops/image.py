"""On-device image preprocessing.

Replaces the reference's host-side PIL path (deepencoder_infer.py:149-189:
`resize_and_pad_to_square` + `_pil_to_tensor_og_norm`, x in [-1, 1]) with a
jit-able resize/pad/normalize so the host->device transfer is raw uint8
frames only (BASELINE.json north-star).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """[H, W, C] float bilinear resize (align_corners=False, PIL-like)."""
    return jax.image.resize(img, (out_h, out_w, img.shape[-1]),
                            method="bilinear")


def resize_and_pad_to_square(img: jax.Array, size: int,
                             pad_value: float = 0.0) -> jax.Array:
    """Aspect-preserving resize so the long side == `size`, then pad bottom/
    right to a square (reference deepencoder_infer.py:149-177 uses PIL
    thumbnail + paste at (0,0), i.e. top-left anchored).

    Static-shape variant: `img` is [H, W, C] with H, W static. For dynamic
    aspect ratios across a dataset, bucket by aspect or pre-letterbox on host.
    """
    h, w, c = img.shape
    if h >= w:
        nh, nw = size, max(1, int(round(w * size / h)))
    else:
        nh, nw = max(1, int(round(h * size / w))), size
    resized = resize_bilinear(img, nh, nw)
    out = jnp.full((size, size, c), pad_value, img.dtype)
    return jax.lax.dynamic_update_slice(out, resized, (0, 0, 0))


def normalize_pm1(img_u8: jax.Array) -> jax.Array:
    """uint8 [.., C] -> float in [-1, 1] (reference
    deepencoder_infer.py:180-189: (x/255 - 0.5) / 0.5)."""
    return img_u8.astype(jnp.float32) / 127.5 - 1.0


def preprocess_camera_frame(img_u8: jax.Array, size: int) -> jax.Array:
    """Full per-frame path: uint8 [H,W,3] -> float32 [3,size,size] in [-1,1].

    jit this over a [V, H, W, 3] stack to process all 6 nuScenes views in one
    launch (the reference loops views in Python, trainer.py:527-556)."""
    x = normalize_pm1(img_u8)
    x = resize_and_pad_to_square(x, size)
    return jnp.transpose(x, (2, 0, 1))


def preprocess_views(imgs_u8: jax.Array, size: int) -> jax.Array:
    """[V, H, W, 3] uint8 -> [V, 3, size, size] float32, one fused launch."""
    return jax.vmap(lambda im: preprocess_camera_frame(im, size))(imgs_u8)
