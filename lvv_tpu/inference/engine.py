"""InferenceEngine — question + LiDAR BEV + cameras -> answer text.

Re-design of the reference InferenceEngine
(src/encoder-decoder/inference/inference_engine.py:54-334). The reference
splices prefixes between literal marker tokens in a plain prompt ending in
"\\nAnswer:" (:139-227) while training puts prefixes before a chat-templated
prompt — a train/infer mismatch (SURVEY.md §3.2). This engine uses ONE
canonical assembly (the training layout) for both, so teacher-forced and
generated token streams agree.

Batch generation is a single vectorized jit'd call (the reference loops
samples in Python, :306-334).
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..data.collate import Collator, load_views_u8
from ..models import VQAModel, greedy_generate


class InferenceEngine:
    def __init__(self, model: VQAModel, params, tokenizer,
                 max_prompt: int = 128, max_new_tokens: int = 96,
                 quantize_llm: bool = False):
        self.model = model
        self.params = params
        self.params_decode = None
        if quantize_llm:
            # weight-only int8 LLM for the DECODE SCAN only (serving lever;
            # prefill keeps the float tree — see models.greedy_generate
            # params_decode and prepare_serving_params)
            from ..models import prepare_serving_params
            self.params_decode = prepare_serving_params(params)
        self.tokenizer = tokenizer
        self.max_prompt = max_prompt
        self.max_new_tokens = max_new_tokens
        cfg = model.cfg
        self.collator = Collator(
            tokenizer, max_prompt, 0, cfg.sam.img_size,
            (cfg.bev_channels,) + tuple(cfg.bev_hw))

    def generate_batch(self, questions: Sequence[str],
                       bevs: Sequence[np.ndarray],
                       cam_paths: Optional[Sequence[Sequence[str]]] = None,
                       use_vision: bool = True,
                       use_lidar: bool = True) -> List[str]:
        samples = []
        for i, (q, bev) in enumerate(zip(questions, bevs)):
            samples.append({
                "question": q, "answer": None, "bev": bev,
                "cam_paths": (cam_paths[i] if cam_paths else [None] * 6),
                "template_type": "infer"})
        batch = self.collator(samples, use_vision, use_lidar)
        toks, lens = greedy_generate(
            self.model, self.params, batch.bev, batch.images,
            batch.view_valid, batch.text_ids, batch.text_len,
            max_new_tokens=self.max_new_tokens, eos_id=self.tokenizer.eos_id,
            params_decode=self.params_decode)
        out = []
        for i in range(len(samples)):
            ids = np.asarray(toks[i][: int(lens[i])]).tolist()
            out.append(self.tokenizer.decode(ids))
        return out

    def generate(self, question: str, bev: np.ndarray,
                 cam_paths: Optional[Sequence[str]] = None, **kw) -> str:
        return self.generate_batch([question], [bev],
                                   [cam_paths] if cam_paths else None,
                                   **kw)[0]
