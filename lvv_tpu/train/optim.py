"""Optimizer: multi-group AdamW with cosine warmup and per-group clipping.

Replicates the reference's five parameter groups at distinct learning rates
(src/encoder-decoder/training/core/model_setup.py:221-245: vat_lidar /
llm-lora / clip-lora / adapter+projector(+SAM net_2,net_3) / vat_vision)
with everything else frozen (SAM backbone+neck, CLIP base, LLM base —
deepencoder_infer.py:406-453, model_setup.py:51-61), plus the HF-style
cosine schedule with linear warmup (model_setup.py:248-256) and per-group
gradient clipping (trainer.py:693-718). Built on optax.multi_transform so
the whole thing is one pure update fn for pjit.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import optax

from ..config.schema import OptimConfig

GROUPS = ("vat_lidar", "vat_vision", "adapter", "llm_lora", "clip_lora",
          "frozen")


def param_group(path_keys) -> str:
    """Map a params-tree path to its optimizer group (reference
    model_setup.py:221-245 group membership)."""
    keys = [str(k) for k in path_keys]
    top = keys[0] if keys else ""
    is_lora = any(k in ("lora_a", "lora_b") for k in keys)
    if top == "vat_lidar":
        return "vat_lidar"
    if top == "vat_vision":
        return "vat_vision"
    if top == "adapter":
        return "adapter"
    if top == "deepencoder":
        if is_lora:
            return "clip_lora"           # CLIP LoRA adapters
        if "projector" in keys or "net_2" in keys or "net_3" in keys:
            return "adapter"             # trainable deepencoder pieces
        return "frozen"                  # SAM backbone/neck, CLIP base
    if top == "llm":
        return "llm_lora" if is_lora else "frozen"
    return "frozen"


def group_labels(params: Any) -> Any:
    flat, tree_def = jax.tree_util.tree_flatten_with_path(params)
    labels = [param_group(tuple(getattr(p, "key", str(p)) for p in path))
              for path, _ in flat]
    return jax.tree_util.tree_unflatten(tree_def, labels)


def make_schedule(base_lr: float, total_steps: int, warmup_ratio: float):
    warmup = int(total_steps * warmup_ratio)
    if warmup == 0:
        return optax.cosine_decay_schedule(base_lr, max(total_steps, 1))
    return optax.warmup_cosine_decay_schedule(
        init_value=base_lr / (warmup + 1), peak_value=base_lr,
        warmup_steps=warmup, decay_steps=max(total_steps, warmup + 1),
        end_value=0.0)


def make_optimizer(cfg: OptimConfig, params: Any, total_steps: int):
    """-> (optax.GradientTransformation, labels tree)."""
    lrs = {"vat_lidar": cfg.lr_vat_lidar, "vat_vision": cfg.lr_vat_vision,
           "adapter": cfg.lr_adapter, "llm_lora": cfg.lr_llm_lora,
           "clip_lora": cfg.lr_clip_lora}

    def group_tx(lr: float) -> optax.GradientTransformation:
        return optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            optax.adamw(make_schedule(lr, total_steps, cfg.warmup_ratio),
                        b1=cfg.betas[0], b2=cfg.betas[1],
                        weight_decay=cfg.weight_decay),
        )

    transforms: Dict[str, optax.GradientTransformation] = {
        g: group_tx(lr) for g, lr in lrs.items()}
    transforms["frozen"] = optax.set_to_zero()

    labels = group_labels(params)
    tx = optax.multi_transform(transforms, labels)
    if cfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
    return tx, labels


def trainable_mask(params: Any) -> Any:
    labels = group_labels(params)
    return jax.tree_util.tree_map(lambda g: g != "frozen", labels)


def count_by_group(params: Any) -> Dict[str, int]:
    import numpy as np
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    out: Dict[str, int] = {g: 0 for g in GROUPS}
    for path, leaf in flat:
        g = param_group(tuple(getattr(p, "key", str(p)) for p in path))
        out[g] += int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 0
    return out
