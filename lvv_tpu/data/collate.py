"""Collation: QA rows -> fixed-shape device batches.

Re-design of the reference collate (training/data/collate.py:7-62): the
prompt is chat-templated per question; prompt and answer token streams are
PACKED contiguously per sample (prompt ++ answer ++ eos) into one
right-padded text block with labels -100 outside the answer span — this
replaces the reference's separate prompt/answer pads + the trainer's
device-side concatenation (trainer.py:607-663), keeping every shape static
for XLA.

Also hosts the image loading path: camera jpgs decode on host (PIL) to
uint8; resize/pad/normalize runs ON DEVICE via lvv_tpu.ops.image
(BASELINE.json north-star: host->device transfer is raw frames only).
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from ..models.vqa import VQABatch
from .tokenizer import format_prompt


def pack_text(tokenizer, question: str, answer: Optional[str],
              max_prompt: int, max_answer: int):
    """-> (ids [T], labels [T], length) with T = max_prompt + max_answer + 1.

    Prompt tokens are truncated from the LEFT (keep the question tail);
    answer truncated from the right then EOS (reference collate.py:44-51
    truncates answers to max_ans_toks)."""
    prompt_text = getattr(tokenizer, "apply_chat_template",
                          lambda q: format_prompt(q))(question)
    p_ids = tokenizer.encode(prompt_text)[-max_prompt:]
    a_ids = []
    if answer is not None:
        a_ids = tokenizer.encode(answer)[:max_answer] + [tokenizer.eos_id]
    t = max_prompt + max_answer + 1
    ids = np.full((t,), tokenizer.pad_id, np.int32)
    labels = np.full((t,), -100, np.int32)
    n_p, n_a = len(p_ids), len(a_ids)
    ids[:n_p] = p_ids
    ids[n_p:n_p + n_a] = a_ids
    labels[n_p:n_p + n_a] = a_ids
    return ids, labels, n_p + n_a, n_p


def load_views_u8(cam_paths: Sequence[Optional[str]], size_hw=None):
    """Decode up to 6 jpgs -> (uint8 [6, H, W, 3], valid [6]). Missing paths
    give zeros + invalid (the model zero-fills those views,
    reference trainer.py:535-541)."""
    from PIL import Image
    imgs, valid = [], []
    shape = None
    for p in cam_paths:
        if p is None:
            imgs.append(None)
            valid.append(False)
            continue
        try:
            im = Image.open(p).convert("RGB")
            if size_hw is not None:
                im = im.resize((size_hw[1], size_hw[0]))
            arr = np.asarray(im, np.uint8)
            shape = arr.shape
            imgs.append(arr)
            valid.append(True)
        except Exception:
            imgs.append(None)
            valid.append(False)
    if shape is None:
        shape = (size_hw or (900, 1600)) + (3,)
        if len(shape) == 2:
            shape = shape + (3,)
    out = np.zeros((len(cam_paths),) + tuple(shape), np.uint8)
    for i, a in enumerate(imgs):
        if a is not None:
            out[i] = a
    return out, np.asarray(valid, bool)


class Collator:
    def __init__(self, tokenizer, max_prompt: int, max_answer: int,
                 image_size: int, bev_shape, load_images: bool = True):
        self.tokenizer = tokenizer
        self.max_prompt = max_prompt
        self.max_answer = max_answer
        self.image_size = image_size
        self.bev_shape = tuple(bev_shape)   # (C, H, W)
        self.load_images = load_images

    def __call__(self, samples: List[dict],
                 use_vision: bool = True, use_lidar: bool = True) -> VQABatch:
        import jax.numpy as jnp
        from ..ops.image import preprocess_views

        b = len(samples)
        t = self.max_prompt + self.max_answer + 1
        ids = np.zeros((b, t), np.int32)
        labels = np.full((b, t), -100, np.int32)
        lens = np.zeros((b,), np.int32)
        bev = np.zeros((b,) + self.bev_shape, np.float32)
        views = np.zeros((b, 6, 3, self.image_size, self.image_size),
                         np.float32)
        valid = np.zeros((b, 6), bool)

        for i, s in enumerate(samples):
            ids[i], labels[i], lens[i], _ = pack_text(
                self.tokenizer, s["question"], s.get("answer"),
                self.max_prompt, self.max_answer)
            sb = s["bev"]
            c, h, w = [min(a, b_) for a, b_ in zip(sb.shape, self.bev_shape)]
            bev[i, :c, :h, :w] = sb[:c, :h, :w]
            if self.load_images and any(p for p in s.get("cam_paths", [])):
                u8, v = load_views_u8(s["cam_paths"])
                views[i] = np.asarray(preprocess_views(jnp.asarray(u8),
                                                       self.image_size))
                valid[i] = v

        return VQABatch(
            bev=jnp.asarray(bev), images=jnp.asarray(views),
            view_valid=jnp.asarray(valid), text_ids=jnp.asarray(ids),
            text_len=jnp.asarray(lens), labels=jnp.asarray(labels),
            use_vision=jnp.asarray(use_vision),
            use_lidar=jnp.asarray(use_lidar))
