"""DeepEncoder — the fused SAM+CLIP image tower.

Re-design of the reference's DeepEncoderRuntime
(src/deepencoder/deepencoder_infer.py:385-557): per image, SAM ViT-B
produces [B, 1024, 16, 16]; CLIP-L consumes those features through its
patch-bypass embeddings and yields [B, 257, 1024]; the CLS token is dropped,
CLIP tokens concatenate with the flattened SAM features to [B, 256, 2048];
a projector maps to the adapter space. Output contract (L3->L4, SURVEY.md
§1): [256, 2048] tokens per camera view on a 16x16 grid, six views in
nuScenes order FRONT, FRONT_RIGHT, FRONT_LEFT, BACK, BACK_RIGHT, BACK_LEFT
(deepencoder_infer.py:347-354).

TPU-first: `encode_views` folds the 6 views into the batch axis and runs ONE
jit'd forward — the reference's per-view Python loop
(deepencoder_infer.py:514-557, trainer.py:527-556) is its main host
bottleneck. Missing views are zero-masked on device, matching the
reference's zero-fill fallback (:536-549).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .clip import CLIPVisionTower
from .projector import MlpProjector
from .sam import SAMImageEncoder

CAM_VIEWS = ("CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT",
             "CAM_BACK", "CAM_BACK_RIGHT", "CAM_BACK_LEFT")
FIXED_GRID_SIDE = 16     # reference deepencoder_infer.py:88
FIXED_IMAGE_SIZE = 1024  # reference deepencoder_infer.py:87


class DeepEncoder(nn.Module):
    """SAM -> CLIP(bypass) -> concat -> projector."""
    sam: SAMImageEncoder
    clip: CLIPVisionTower
    projector: MlpProjector

    def __call__(self, images: jax.Array) -> jax.Array:
        """[B, 3, S, S] in [-1, 1] -> [B, G*G, 2*clip_hidden] tokens."""
        sam_feats = self.sam(images)                        # [B, C, G, G]
        clip_tokens = self.clip(patch_embeds=sam_feats)     # [B, 1+G*G, H]
        b, c, gh, gw = sam_feats.shape
        sam_flat = sam_feats.reshape(b, c, gh * gw).transpose(0, 2, 1)
        fused = jnp.concatenate([clip_tokens[:, 1:], sam_flat], axis=-1)
        return self.projector(fused)                        # [B, G*G, D]

    sequential_views: bool = False
    views_chunk: int = 0   # 0 = derive from sequential_views (6 or 1)

    def encode_views(self, images: jax.Array,
                     view_valid: Optional[jax.Array] = None) -> jax.Array:
        """[B, V, 3, S, S] -> [B, V, G*G, D]; invalid views zeroed
        (reference encode_views zero-fill, deepencoder_infer.py:536-549).

        Memory/throughput dial `views_chunk` = views folded into the batch
        per encode pass: 6 (= one fully batched pass, fastest), 1 (= the
        sequential unroll, 1/6th the live attention memory — the B>=16
        serving mode), or 2/3 in between. At the 1024px product config one
        view's SAM activations are the HBM unit that matters, so live
        memory scales ~linearly with the chunk. Any setting is ONE jit
        region (the reference loops views in host Python,
        trainer.py:527-556); XLA's scheduler serializes the per-chunk
        subgraphs, bounding live memory to one chunk's buffers.
        `sequential_views=True` is the legacy spelling of views_chunk=1."""
        b, v = images.shape[:2]
        k = self.views_chunk or (1 if self.sequential_views else v)
        k = min(k, v)
        if v % k:
            raise ValueError(f"views_chunk={k} must divide num views {v}")
        if k == v:
            flat = images.reshape((b * v,) + images.shape[2:])
            tokens = self(flat)
            tokens = tokens.reshape((b, v) + tokens.shape[1:])
        else:
            # static unrolled loop (lax.map over a bound flax module leaks
            # tracers through the module-call interception)
            chunks = []
            for i in range(0, v, k):
                part = images[:, i:i + k].reshape(
                    (b * k,) + images.shape[2:])
                t = self(part)
                chunks.append(t.reshape((b, k) + t.shape[1:]))
            tokens = jnp.concatenate(chunks, axis=1)
        if view_valid is not None:
            tokens = tokens * view_valid[:, :, None, None].astype(tokens.dtype)
        return tokens


def build_deepencoder(cfg, dtype=jnp.float32,
                      clip_lora_rank: int = 0,
                      clip_lora_alpha: float = 1.0,
                      sequential_views: Optional[bool] = None,
                      views_chunk: Optional[int] = None) -> DeepEncoder:
    """Construct from config schema (lvv_tpu.config.ModelConfig fields)."""
    sam = SAMImageEncoder(
        img_size=cfg.sam.img_size, patch_size=cfg.sam.patch_size,
        embed_dim=cfg.sam.embed_dim, depth=cfg.sam.depth,
        num_heads=cfg.sam.num_heads, mlp_ratio=cfg.sam.mlp_ratio,
        out_chans=cfg.sam.out_chans, window_size=cfg.sam.window_size,
        global_attn_indexes=tuple(cfg.sam.global_attn_indexes),
        use_rel_pos=cfg.sam.use_rel_pos, vary_dims=tuple(cfg.sam.vary_dims),
        dtype=dtype, remat=getattr(cfg, "remat", False),
        frozen_trunk=getattr(cfg.sam, "frozen_trunk", True),
        quant8=getattr(cfg.sam, "quant8", False))
    clip = CLIPVisionTower(
        image_size=cfg.clip.image_size, patch_size=cfg.clip.patch_size,
        hidden_size=cfg.clip.hidden_size, num_layers=cfg.clip.num_layers,
        num_heads=cfg.clip.num_heads,
        intermediate_size=cfg.clip.intermediate_size,
        layer_norm_eps=cfg.clip.layer_norm_eps, dtype=dtype,
        lora_rank=clip_lora_rank, lora_alpha=clip_lora_alpha,
        quant8=getattr(cfg.clip, "quant8", False))
    projector = MlpProjector(
        kind=cfg.projector.kind, n_embed=cfg.projector.n_embed,
        depth=cfg.projector.depth, mlp_ratio=cfg.projector.mlp_ratio,
        downsample_ratio=cfg.projector.downsample_ratio, dtype=dtype)
    if sequential_views is None:
        # batched is both faster (191 vs 205 ms for 6 views, r02 measured)
        # and memory-safe now that the global layers' rel-pos bias never
        # materializes (in-kernel flash) — the r01 remote-compiler crash
        # that forced the sequential unroll no longer reproduces
        sequential_views = False
    return DeepEncoder(sam=sam, clip=clip, projector=projector,
                       sequential_views=sequential_views,
                       views_chunk=int(views_chunk or 0))
