#!/usr/bin/env python
"""Measure the reference pipeline's per-frame cost in PyTorch on CPU.

The reference repo publishes no numbers (SURVEY.md §6) and its own code
cannot run here (no pretrained weights, no GPU, missing VoxelNeXt ckpt), so
this measures architecture-identical torch modules with random weights —
the same per-frame compute the reference performs on its CPU fallback path:

  6 x SAM ViT-B @ 1024px  (transformers SamVisionModel == sam_vary ViT)
  6 x CLIP ViT-L over 257 tokens (the SAM-bypass token count)
  Qwen2.5-0.5B prefill (~1.5k tokens) + 32 greedy KV-cache decode steps

VAT/adapter/projector costs (<2% of total FLOPs) are omitted, which biases
the baseline FASTER, i.e. conservative for our vs_baseline ratio.

Writes benchmarks/reference_cpu.json {"fps": ..., "seconds_per_frame": ...}.
"""
from __future__ import annotations

import json
import pathlib
import time


def main(frames: int = 1) -> None:
    import torch
    torch.manual_seed(0)
    torch.set_num_threads(torch.get_num_threads())

    from transformers import (CLIPVisionConfig, CLIPVisionModel, Qwen2Config,
                              Qwen2ForCausalLM, SamVisionConfig,
                              SamVisionModel)

    sam = SamVisionModel(SamVisionConfig()).eval()          # ViT-B @1024
    clip = CLIPVisionModel(CLIPVisionConfig(
        hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
        num_attention_heads=16, image_size=224, patch_size=14,
        hidden_act="quick_gelu")).eval()                    # ViT-L, 257 tok
    qwen = Qwen2ForCausalLM(Qwen2Config(
        vocab_size=151936, hidden_size=896, num_hidden_layers=24,
        num_attention_heads=14, num_key_value_heads=2,
        intermediate_size=4864, tie_word_embeddings=True)).eval()

    img = torch.randn(1, 3, 1024, 1024)
    clip_img = torch.randn(1, 3, 224, 224)
    prefix = torch.randn(1, 1540, 896)

    times = []
    with torch.inference_mode():
        for _ in range(frames):
            t0 = time.perf_counter()
            for _ in range(6):
                sam(img)
                clip(clip_img)
            out = qwen(inputs_embeds=prefix, use_cache=True)
            past = out.past_key_values
            tok = out.logits[:, -1:].argmax(-1)
            for _ in range(32):
                out = qwen(input_ids=tok, past_key_values=past,
                           use_cache=True)
                past = out.past_key_values
                tok = out.logits[:, -1:].argmax(-1)
            times.append(time.perf_counter() - t0)

    sec = min(times)
    result = {"fps": 1.0 / sec, "seconds_per_frame": sec,
              "frames_measured": frames,
              "note": "torch-CPU architecture-identical pipeline; "
                      "random weights; VAT costs omitted (conservative)"}
    out_path = pathlib.Path(__file__).parent / "reference_cpu.json"
    out_path.write_text(json.dumps(result, indent=2))
    print(json.dumps(result))


if __name__ == "__main__":
    import sys
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
