"""End-to-end VQA model: LiDAR BEV + 6 cameras + question -> answer.

The TPU-native re-composition of the reference's training assembly
(src/encoder-decoder/training/core/trainer.py:497-691 `_train_step`) and
inference splice (inference/inference_engine.py:139-227
`build_inputs_embeds`):

    prefix = [<vision_start>, V*s, <vision_end>,
              <lidar_start>,  L*s, <lidar_end>]        (s = prefix_scale 0.2,
                                                        reference train.py:187)
    sequence = prefix ++ text(prompt ++ answer)

Canonical layout notes (SURVEY.md §3.1/§3.2): the reference trainer
accidentally appends the prompt embedding twice (trainer.py:633-647) while
validation/inference use it once — this rebuild uses the single-prompt
layout everywhere. The reference also has two prompt-assembly styles; the
training layout (prefix before chat-templated text) is canonical here.

Static-shape design: the text block arrives pre-packed from collation as
right-padded [B, T] ids with per-sample `text_len`, labels -100 outside the
answer span; prefix length is static (n_vision_q + n_lidar_q + 4); causal
attention masks padding via kv_len = P + text_len.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.schema import ModelConfig
from .deepencoder import DeepEncoder, build_deepencoder
from .qwen import KVCache, QwenModel, cross_entropy_loss, init_cache
from .vat import VATLiDAR, VATVision, VisionAdapter

# special-token order matches config.LLMConfig.special_tokens
VISION_START, VISION_END, LIDAR_START, LIDAR_END = range(4)


class VQABatch(NamedTuple):
    """One device batch (produced by lvv_tpu.data.collate)."""
    bev: jax.Array          # [B, C, H, W] float
    images: jax.Array       # [B, 6, 3, S, S] float in [-1,1]
    view_valid: jax.Array   # [B, 6] bool
    text_ids: jax.Array     # [B, T] int32, prompt++answer, right-padded
    text_len: jax.Array     # [B] int32
    labels: jax.Array       # [B, T] int32, -100 outside answer
    use_vision: jax.Array   # [] or [B] bool ablation toggles
    use_lidar: jax.Array


class VQAModel(nn.Module):
    """Full multimodal stack as one flax module (single params tree with
    stable top-level names: deepencoder / adapter / vat_vision / vat_lidar /
    llm — the unit of checkpointing and optimizer partitioning)."""
    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32
    llm_lora_rank: int = 0
    llm_lora_alpha: float = 1.0
    clip_lora_rank: int = 0
    clip_lora_alpha: float = 1.0

    def setup(self):
        c = self.cfg
        self.deepencoder = build_deepencoder(
            c, dtype=self.dtype, clip_lora_rank=self.clip_lora_rank,
            clip_lora_alpha=self.clip_lora_alpha,
            sequential_views=getattr(c, "sequential_views", None),
            views_chunk=getattr(c, "views_chunk", 0))
        self.adapter = VisionAdapter(d_model=c.adapter.d_model,
                                     num_views=c.adapter.num_views,
                                     dropout=c.adapter.dropout,
                                     dtype=self.dtype, name="adapter")
        n_tokens = c.adapter.num_views * sam_grid_side(c) ** 2
        self.vat_vision = VATVision(
            d_in=c.vat_vision.d_in, d_model=c.vat_vision.d_model,
            n_tokens=n_tokens,
            compression_factor=c.vat_vision.compression_factor,
            n_blocks=c.vat_vision.n_blocks, n_heads=c.vat_vision.n_heads,
            mlp_ratio=c.vat_vision.mlp_ratio,
            per_view_queries=c.vat_vision.per_view_queries,
            dtype=self.dtype, name="vat_vision")
        self.vat_lidar = VATLiDAR(
            d_model=c.vat_lidar.d_model, n_queries=c.vat_lidar.n_queries,
            n_blocks=c.vat_lidar.n_blocks, n_heads=c.vat_lidar.n_heads,
            mlp_ratio=c.vat_lidar.mlp_ratio, pe_hidden=c.vat_lidar.pe_hidden,
            dw_kernel=c.vat_lidar.dw_kernel, dtype=self.dtype,
            name="vat_lidar")
        self.llm = QwenModel(c.llm, dtype=self.dtype,
                             lora_rank=self.llm_lora_rank,
                             lora_alpha=self.llm_lora_alpha,
                             extra_tokens=len(c.llm.special_tokens),
                             remat=c.remat, name="llm")

    # -- token-grid side: adapt VATVision n_tokens when SAM grid is small
    # (tiny test configs); the product config is 6*256 = 1536.

    def special_embed(self, which: int) -> jax.Array:
        """Embedding row of a multimodal special token."""
        idx = self.cfg.llm.vocab_size + which
        return self.llm.embed(jnp.asarray([[idx]], jnp.int32))[0, 0]

    def encode_prefix(self, bev, images, view_valid, use_vision=True,
                      use_lidar=True, deterministic: bool = True
                      ) -> Tuple[jax.Array, int]:
        """-> prefix embeddings [B, P, D]; P is static.

        Ablation toggles zero the corresponding prefix (reference
        train.py:159-172 modality toggles keep sequence shape stable)."""
        c = self.cfg
        b = bev.shape[0]
        scale = jnp.asarray(c.prefix_scale, self.dtype)

        # trace-time shape hooks (zero runtime cost; reference threads its
        # DebugLogger through every forward, trainer.py:499-690)
        from ..utils import get_tracer
        tracer = get_tracer()
        view_tokens = self.deepencoder.encode_views(images, view_valid)
        tracer.shape("view_tokens", view_tokens, "vqa")
        kv = self.adapter(view_tokens, deterministic=deterministic)
        v_prefix = self.vat_vision(kv, deterministic=deterministic) * scale
        l_prefix = self.vat_lidar(bev, deterministic=deterministic) * scale
        tracer.shape("v_prefix", v_prefix, "vqa")
        tracer.shape("l_prefix", l_prefix, "vqa")

        v_prefix = v_prefix * jnp.asarray(use_vision, self.dtype)
        l_prefix = l_prefix * jnp.asarray(use_lidar, self.dtype)

        def tok(which):
            return jnp.broadcast_to(
                self.special_embed(which).astype(self.dtype)[None, None],
                (b, 1, c.llm.hidden_size))

        prefix = jnp.concatenate([
            tok(VISION_START), v_prefix.astype(self.dtype), tok(VISION_END),
            tok(LIDAR_START), l_prefix.astype(self.dtype), tok(LIDAR_END),
        ], axis=1)
        return prefix

    def __call__(self, batch: VQABatch, deterministic: bool = True):
        """Training/val forward -> (loss, logits [B, P+T, V], token_count)."""
        prefix = self.encode_prefix(batch.bev, batch.images, batch.view_valid,
                                    batch.use_vision, batch.use_lidar,
                                    deterministic)
        text_emb = self.llm.embed(batch.text_ids)
        embeds = jnp.concatenate([prefix, text_emb], axis=1)
        p = prefix.shape[1]
        seq_len = p + batch.text_len
        logits = self.llm(embeds, seq_len=seq_len)
        # labels over the full sequence: -100 for prefix, then text labels
        b, t = batch.labels.shape
        full_labels = jnp.concatenate(
            [jnp.full((b, p), -100, jnp.int32), batch.labels], axis=1)
        loss, count = cross_entropy_loss(logits[:, :-1], full_labels[:, 1:])
        return loss, logits, count

    # ---------------- generation ----------------

    def prefill(self, batch_bev, images, view_valid, prompt_ids, prompt_len,
                cache: KVCache, use_vision=True, use_lidar=True):
        """Build prefix + prompt, run one cached prefill pass.
        Returns (last_logits [B, V], cache)."""
        prefix = self.encode_prefix(batch_bev, images, view_valid,
                                    use_vision, use_lidar)
        return self.prefill_from_prefix(prefix, prompt_ids, prompt_len,
                                        cache)

    def prefill_from_prefix(self, prefix, prompt_ids, prompt_len,
                            cache: KVCache):
        """Prefill from an ALREADY-ENCODED prefix [B, P, D] (prefix-cache
        serving path: N questions about one frame encode the sensors once).
        Returns (last_logits [B, V], cache)."""
        text_emb = self.llm.embed(prompt_ids)
        embeds = jnp.concatenate([prefix.astype(self.dtype), text_emb],
                                 axis=1)
        p = prefix.shape[1]
        seq_len = p + prompt_len
        # last_pos gathers the hidden state at the last REAL position per
        # sample inside the LLM, before the unembed — the full-sequence
        # logits tensor would dominate HBM at serving batch sizes
        logits, cache = self.llm(embeds, seq_len=seq_len, cache=cache,
                                 last_pos=seq_len - 1)
        return logits[:, 0], cache

    def decode_step(self, token_ids, cache: KVCache):
        """One greedy step: [B] ids -> (logits [B, V], cache)."""
        emb = self.llm.embed(token_ids[:, None])
        pos = cache.length[:, None]
        logits, cache = self.llm(emb, positions=pos, cache=cache)
        return logits[:, -1], cache


def _decode_loop(model: "VQAModel", params, params_decode, last_logits,
                 cache, *, max_new_tokens: int, eos_id: int):
    """Shared greedy decode scan: (last prefill logits, filled cache) ->
    (tokens [B, N], lengths [B]).

    `params_decode` may be a different (e.g. weight-only int8) tree: the
    scan body streams every LLM weight per step while prefill reads each
    once — the optimal formats differ. A tree carrying "_fused_decode"
    (prepare_serving_params(fuse=True)) routes to the packed-matmul
    engine (models/decode_fused.py: 4 matmuls/layer instead of 7)."""
    b = last_logits.shape[0]
    if params_decode is not None and "_fused_decode" in params_decode:
        from .decode_fused import fused_decode_loop
        return fused_decode_loop(
            model.cfg.llm, model.dtype, params_decode["_fused_decode"],
            last_logits, cache, max_new_tokens=max_new_tokens,
            eos_id=eos_id)
    p_dec = params if params_decode is None else params_decode

    def body(state, _):
        last_logits, cache, done = state
        nxt = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, eos_id, nxt)
        logits, cache = model.apply({"params": p_dec}, nxt, cache,
                                    method=VQAModel.decode_step)
        done = done | (nxt == eos_id)
        return (logits, cache, done), nxt

    (_, _, _), tokens = jax.lax.scan(
        body, (last_logits, cache, jnp.zeros((b,), bool)), None,
        length=max_new_tokens)
    tokens = tokens.T  # [B, N]
    not_eos = tokens != eos_id
    lengths = jnp.sum(jnp.cumprod(not_eos.astype(jnp.int32), axis=1),
                      axis=1)
    return tokens, lengths


@functools.cache
def _generate_fn(model: "VQAModel", max_new_tokens: int, eos_id: int,
                 max_cache: int):
    """One jitted (prefill + scan-decode) program per (model, knobs) —
    cached so repeated generate calls reuse the compilation. flax modules
    are frozen dataclasses, hence valid cache keys."""

    def impl(params, params_decode, batch_bev, images, view_valid,
             prompt_ids, prompt_len):
        b = prompt_ids.shape[0]
        cache = init_cache(model.cfg.llm, b, max_cache, dtype=model.dtype)
        last_logits, cache = model.apply(
            {"params": params}, batch_bev, images, view_valid, prompt_ids,
            prompt_len, cache, method=VQAModel.prefill)
        return _decode_loop(model, params, params_decode, last_logits,
                            cache, max_new_tokens=max_new_tokens,
                            eos_id=eos_id)

    return jax.jit(impl)


@functools.cache
def _generate_multi_fn(model: "VQAModel", max_new_tokens: int, eos_id: int,
                       max_cache: int, preprocess_u8: bool):
    """Jitted multi-batch generate: ONE device program runs G whole
    (encode + prefill + decode) batches via lax.scan over the leading
    group axis. Through the axon relay (and on any loaded serving host)
    each program dispatch carries a fixed host/relay cost (~170 ms at B=8,
    benchmarks/serving_gap_bisect.json: mono 1153.7 vs device-stage sum
    982 ms); scanning G batches inside one program amortizes that cost
    G-fold while the per-group device time is unchanged (the scan body IS
    the monolithic single-batch program). The reference serves strictly
    sequentially (inference_engine.py:306-334) — this is the TPU-idiomatic
    'keep the program resident' counterpart."""

    def impl(params, params_decode, bev, images, view_valid, prompt_ids,
             prompt_len):
        # leading dims: bev [G, B, C, H, W], images [G, B, 6, 3, S, S]
        # (or, with preprocess_u8, raw [G, B, 6, H, W, 3] uint8 frames —
        # preprocessed per GROUP inside the scan, so the f32 image tensor
        # only ever exists for one group: a G=4 x B=8 f32 stack is 2.4 GB
        # and OOMed the serving engine, the u8 stack is 0.6 GB)
        def body(carry, xs):
            bev_g, img_g, vv_g, ids_g, len_g = xs
            b = ids_g.shape[0]
            bev_g = bev_g.astype(jnp.float32)
            if preprocess_u8:
                from ..ops.image import preprocess_views
                img_g = jax.vmap(lambda v: preprocess_views(
                    v, model.cfg.sam.img_size))(img_g)
            cache = init_cache(model.cfg.llm, b, max_cache,
                               dtype=model.dtype)
            last_logits, cache = model.apply(
                {"params": params}, bev_g, img_g, vv_g, ids_g, len_g,
                cache, method=VQAModel.prefill)
            toks, lens = _decode_loop(
                model, params, params_decode, last_logits, cache,
                max_new_tokens=max_new_tokens, eos_id=eos_id)
            return carry, (toks, lens)

        _, (tokens, lengths) = jax.lax.scan(
            body, (), (bev, images, view_valid, prompt_ids, prompt_len))
        return tokens, lengths   # [G, B, N], [G, B]

    return jax.jit(impl)


def greedy_generate_multi(model: "VQAModel", params, bev, images,
                          view_valid, prompt_ids, prompt_len, *,
                          max_new_tokens: int, eos_id: int,
                          max_cache: Optional[int] = None,
                          params_decode=None):
    """Greedy decode G batches in one resident device program.

    All sensor/text arrays carry a leading group axis G (bev [G, B, ...]);
    returns (tokens [G, B, N], lengths [G, B]). Token-identical to G
    separate greedy_generate calls (tested); one compilation per (G, B).
    Use for throughput serving / offline eval where ~G×B frames are
    available at once — per-dispatch host+relay overhead amortizes G-fold
    (benchmarks/serving_bench.py LVV_BENCH_MULTI). Pass raw uint8 frames
    [G, B, 6, H, W, 3] to preprocess per group inside the program (4x
    smaller resident input; the engine's wire format)."""
    p_static = _prefix_len(model.cfg)
    max_cache = max_cache or (p_static + prompt_ids.shape[2]
                              + max_new_tokens + 8)
    fn = _generate_multi_fn(model, max_new_tokens, eos_id, max_cache,
                            images.dtype == jnp.uint8)
    return fn(params, params_decode, bev, images, view_valid, prompt_ids,
              prompt_len)


@functools.cache
def _generate_from_prefix_fn(model: "VQAModel", max_new_tokens: int,
                             eos_id: int, max_cache: int):
    """Jitted (prefill-from-prefix + scan-decode); the encode stage runs
    separately (see encode_prefix_fn) so a serving layer can cache and
    reuse prefixes across questions about the same frame."""

    def impl(params, params_decode, prefix, prompt_ids, prompt_len):
        b = prompt_ids.shape[0]
        cache = init_cache(model.cfg.llm, b, max_cache, dtype=model.dtype)
        last_logits, cache = model.apply(
            {"params": params}, prefix, prompt_ids, prompt_len, cache,
            method=VQAModel.prefill_from_prefix)
        return _decode_loop(model, params, params_decode, last_logits,
                            cache, max_new_tokens=max_new_tokens,
                            eos_id=eos_id)

    return jax.jit(impl)


@functools.cache
def _pipelined_step_fn(model: "VQAModel", max_new_tokens: int, eos_id: int,
                       max_cache: int):
    """One jitted serving-pipeline stage: (decode batch i) + (encode batch
    i+1) in a SINGLE program. Decode is HBM-bandwidth-bound (every LLM
    weight streams per step) while the 6-view encode is MXU-bound; fusing
    them lets XLA's scheduler fill decode's memory-stall slots with encode
    matmuls instead of running the two phases back to back — the
    throughput-serving analogue of software pipelining. The reference
    serves strictly sequentially (inference_engine.py:306-334)."""

    def impl(params, params_decode, prefix_prev, prompt_ids, prompt_len,
             bev_next, images_next, view_valid_next):
        b = prompt_ids.shape[0]
        cache = init_cache(model.cfg.llm, b, max_cache, dtype=model.dtype)
        last_logits, cache = model.apply(
            {"params": params}, prefix_prev, prompt_ids, prompt_len, cache,
            method=VQAModel.prefill_from_prefix)
        tokens, lengths = _decode_loop(
            model, params, params_decode, last_logits, cache,
            max_new_tokens=max_new_tokens, eos_id=eos_id)
        prefix_next = model.apply({"params": params}, bev_next, images_next,
                                  view_valid_next,
                                  method=VQAModel.encode_prefix)
        return tokens, lengths, prefix_next

    return jax.jit(impl)


def pipelined_serving_step(model: VQAModel, params, prefix_prev, prompt_ids,
                           prompt_len, bev_next, images_next,
                           view_valid_next, *, max_new_tokens: int,
                           eos_id: int, max_cache: Optional[int] = None,
                           params_decode=None):
    """Throughput-serving stage: decode answers for the ALREADY-ENCODED
    batch while encoding the next batch's sensors in the same program.
    Returns (tokens, lengths, prefix_next). Steady-state loop:

        prefix = encode_prefix_fn(model)(params, bev0, img0, vv0)
        for batch in stream:
            toks, lens, prefix = pipelined_serving_step(
                model, params, prefix, prompts, plens,
                batch.bev, batch.images, batch.view_valid, ...)

    Token-identical to greedy_generate per batch (tested); adds one batch
    period of latency in exchange for the decode/encode overlap."""
    p_static = prefix_prev.shape[1]
    max_cache = max_cache or (p_static + prompt_ids.shape[1]
                              + max_new_tokens + 8)
    fn = _pipelined_step_fn(model, max_new_tokens, eos_id, max_cache)
    return fn(params, params_decode, prefix_prev, prompt_ids, prompt_len,
              bev_next, images_next, view_valid_next)


def generate_from_prefix(model: VQAModel, params, prefix, prompt_ids,
                         prompt_len, *, max_new_tokens: int, eos_id: int,
                         max_cache: Optional[int] = None,
                         params_decode=None):
    """Greedy decode from a precomputed prefix [B, P, D]. Token-identical
    to greedy_generate when `prefix == encode_prefix(...)` (tested)."""
    p_static = prefix.shape[1]
    max_cache = max_cache or (p_static + prompt_ids.shape[1]
                              + max_new_tokens + 8)
    fn = _generate_from_prefix_fn(model, max_new_tokens, eos_id, max_cache)
    return fn(params, params_decode, prefix, prompt_ids, prompt_len)


@functools.cache
def encode_prefix_fn(model: VQAModel):
    """Jitted standalone prefix encoder: (params, bev, images, view_valid)
    -> [B, P, D]. One compilation per model; batch sizes compile per
    bucket exactly like the generate programs."""
    def impl(params, bev, images, view_valid):
        return model.apply({"params": params}, bev, images, view_valid,
                           method=VQAModel.encode_prefix)
    return jax.jit(impl)


def prepare_serving_params(params, *, quantize_llm: bool = True):
    """One-time serving transform of a trained/converted param tree.

    With quantize_llm, the Qwen projections and the tied unembed table are
    replaced by weight-only int8 (ops.quant.quantize_llm_params) — decode
    is HBM-bandwidth-bound over the LLM weights (~1.1 GB bf16 per step),
    so halving the bytes is the decode speed lever (e2e 6.57 vs 5.96
    frames/s, BASELINE.md r5). See prepare_serving_params_fused for the
    packed-matmul decode engine on top. Prefill and training keep using
    float trees; this is an inference-side copy."""
    params = dict(params)
    if quantize_llm and "llm" in params:
        from ..ops.quant import quantize_llm_params
        params["llm"] = quantize_llm_params(params["llm"])
    return params


def prepare_serving_params_fused(model: "VQAModel", params):
    """Fused decode pack (routes _decode_loop to models/decode_fused.py).
    The returned tree carries ONLY "_fused_decode" — the decode scan never
    touches the flax tree in fused mode, and shipping a dead quantized
    copy alongside doubles the dispatch arg count and wastes ~0.5 GB HBM
    (measured as a stream-throughput loss, BASELINE.md r5)."""
    from .decode_fused import pack_decode_params
    scaling = (model.llm_lora_alpha / model.llm_lora_rank
               if model.llm_lora_rank else 1.0)
    return {"_fused_decode": pack_decode_params(params["llm"],
                                                model.cfg.llm,
                                                lora_scaling=scaling)}


def greedy_generate(model: VQAModel, params, batch_bev, images, view_valid,
                    prompt_ids, prompt_len, *, max_new_tokens: int,
                    eos_id: int, max_cache: Optional[int] = None,
                    params_decode=None):
    """Greedy decode, fully jitted end-to-end (reference
    InferenceEngine.generate :229-304; greedy path matches
    validation.py:552-580 when sampling is off).
    `params_decode` (e.g. from prepare_serving_params) swaps the tree used
    inside the decode scan only. Returns (tokens, lengths)."""
    p_static = _prefix_len(model.cfg)
    max_cache = max_cache or (p_static + prompt_ids.shape[1]
                              + max_new_tokens + 8)
    fn = _generate_fn(model, max_new_tokens, eos_id, max_cache)
    return fn(params, params_decode, batch_bev, images, view_valid,
              prompt_ids, prompt_len)


def sam_grid_side(cfg: ModelConfig) -> int:
    """Token-grid side after SAM's patcher and the two VARY stride-2 convs
    (16 at the product config: 1024/16/4, reference FIXED_GRID_SIDE)."""
    return cfg.sam.img_size // cfg.sam.patch_size // 4


def _prefix_len(cfg: ModelConfig) -> int:
    n_tokens = cfg.adapter.num_views * sam_grid_side(cfg) ** 2
    n_v = n_tokens // cfg.vat_vision.compression_factor
    return n_v + cfg.vat_lidar.n_queries + 4


# ---------------------------------------------------------------- sampling

def _sample_token(key, logits, temperature: float, top_k: int,
                  top_p: float):
    """Temperature + top-k + nucleus sampling over [B, V] logits."""
    logits = logits.astype(jnp.float32) / jnp.maximum(temperature, 1e-5)
    if top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits < kth, -1e30, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum((cum < top_p).astype(jnp.int32), axis=-1)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None],
                                     axis=-1)
        logits = jnp.where(logits < cutoff, -1e30, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


@functools.cache
def _sample_fn(model: "VQAModel", max_new_tokens: int, eos_id: int,
               max_cache: int, temperature: float, top_k: int, top_p: float):
    def impl(rng, params, batch_bev, images, view_valid, prompt_ids,
             prompt_len):
        b = prompt_ids.shape[0]
        cache = init_cache(model.cfg.llm, b, max_cache, dtype=model.dtype)
        last_logits, cache = model.apply(
            {"params": params}, batch_bev, images, view_valid, prompt_ids,
            prompt_len, cache, method=VQAModel.prefill)

        def body(state, key):
            last_logits, cache, done = state
            nxt = _sample_token(key, last_logits, temperature, top_k, top_p)
            nxt = jnp.where(done, eos_id, nxt)
            logits, cache = model.apply({"params": params}, nxt, cache,
                                        method=VQAModel.decode_step)
            done = done | (nxt == eos_id)
            return (logits, cache, done), nxt

        keys = jax.random.split(rng, max_new_tokens)
        (_, _, _), tokens = jax.lax.scan(
            body, (last_logits, cache, jnp.zeros((b,), bool)), keys)
        tokens = tokens.T
        not_eos = tokens != eos_id
        lengths = jnp.sum(jnp.cumprod(not_eos.astype(jnp.int32), axis=1),
                          axis=1)
        return tokens, lengths

    return jax.jit(impl)


def sample_generate(model: VQAModel, params, rng, batch_bev, images,
                    view_valid, prompt_ids, prompt_len, *,
                    max_new_tokens: int, eos_id: int,
                    temperature: float = 0.7, top_k: int = 50,
                    top_p: float = 0.9, max_cache: Optional[int] = None):
    """Sampled decode (reference validation.py:552-580 samples with
    temperature/top-k/top-p unless both modality toggles are off, in which
    case use greedy_generate)."""
    p_static = _prefix_len(model.cfg)
    max_cache = max_cache or (p_static + prompt_ids.shape[1]
                              + max_new_tokens + 8)
    fn = _sample_fn(model, max_new_tokens, eos_id, max_cache,
                    float(temperature), int(top_k), float(top_p))
    return fn(rng, params, batch_bev, images, view_valid, prompt_ids,
              prompt_len)
