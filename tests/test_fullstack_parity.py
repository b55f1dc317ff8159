"""Full-stack composed torch-oracle parity: the WHOLE reference pipeline
(SAM+VARY -> CLIP patch-bypass -> concat -> projector -> adapter -> VATs ->
special-token splice -> Qwen greedy decode) built from locally-initialized
torch modules, weights shared into VQAModel via the converters, asserting
greedy answer-token equality at fp32.

This is the strongest parity statement available offline (BASELINE.json
"north_star" is answer-token parity with the real released weights, which
zero egress blocks): every module participates with its real converter, and
the splice layout follows reference inference_engine.py:139-227 semantics.

Torch mirrors follow the reference modules exactly:
- VATBlock      training/models/vat_blocks.py:7-47
- VATLiDAR      training/models/vat_lidar.py:42-304
- VATVision     training/models/vat_vision.py:20-235
- VisionAdapter training/models/vision_adapter.py:35-145
- DeepEncoder   deepencoder/deepencoder_infer.py:385-557 (SAM->CLIP->concat
                ->projector), VARY head sam_vary_sdpa.py:171-184
- splice        inference/inference_engine.py:139-227 + train.py:187 scale
"""
import dataclasses
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from lvv_tpu import config as C
from lvv_tpu.convert import (convert_clip_state, convert_projector_state,
                             convert_sam_state, convert_vat_lidar_state,
                             convert_vat_vision_state,
                             convert_vision_adapter_state,
                             from_transformers_clip, from_transformers_sam,
                             merge_params)
from lvv_tpu.convert.qwen_hf import convert_qwen_state
from lvv_tpu.models import VQAModel
from lvv_tpu.models.vqa import greedy_generate

NUM_VIEWS = 6
STEPS = 8
EOS = 511


def _cfg():
    cfg = C.tiny_config()
    # clip grid (image/patch = 2) must equal the SAM bypass grid so the
    # pos-table resampling is the identity on both sides (the product
    # config is also identity: 224/14 = 1024/16/4 = 16)
    cfg = C.override(cfg, "model.clip.image_size", 16)
    cfg = C.override(cfg, "model.dtype", "float32")
    # n_q = 24/2 = 12 keeps per-view query groups ACTIVE (12 % 6 == 0)
    cfg = C.override(cfg, "model.vat_vision.compression_factor", 2)
    return cfg


# ---------------------------------------------------------------- torch side

class TVATBlock(torch.nn.Module):
    """reference vat_blocks.py:7-47."""

    def __init__(self, d, heads, d_mlp):
        super().__init__()
        nn = torch.nn
        self.sa_ln = nn.LayerNorm(d)
        self.sa = nn.MultiheadAttention(d, heads, batch_first=True)
        self.ca_ln = nn.LayerNorm(d)
        self.ca = nn.MultiheadAttention(d, heads, batch_first=True)
        self.mlp_ln = nn.LayerNorm(d)
        self.mlp = nn.Sequential(nn.Linear(d, d_mlp), nn.GELU(),
                                 nn.Dropout(0.0), nn.Linear(d_mlp, d),
                                 nn.Dropout(0.0))

    def forward(self, q, kv):
        qn = self.sa_ln(q)
        q = q + self.sa(qn, qn, qn, need_weights=False)[0]
        q = q + self.ca(self.ca_ln(q), kv, kv, need_weights=False)[0]
        return q + self.mlp(self.mlp_ln(q))


class TVATLiDAR(torch.nn.Module):
    """reference vat_lidar.py:42-304 (pe hidden width follows our config
    knob; the reference fixes it to d_model)."""

    def __init__(self, c_in, d, n_q, n_blocks, heads, mlp_ratio, pe_hidden):
        super().__init__()
        nn = torch.nn
        self.refine = nn.Sequential(
            nn.Conv2d(c_in, c_in, 3, padding=1, groups=c_in), nn.GELU())
        self.proj = nn.Conv2d(c_in, d, 1, bias=True)
        self.norm_tokens = nn.LayerNorm(d)
        ph = pe_hidden if pe_hidden > 0 else d
        self.geo_mlp = nn.Sequential(nn.Linear(5, ph), nn.GELU(),
                                     nn.Linear(ph, d))
        self.view_embed = nn.Parameter(torch.randn(NUM_VIEWS, d) * 0.02)
        self.query = nn.Parameter(torch.randn(n_q, d) * 0.02)
        self.blocks = nn.ModuleList(
            [TVATBlock(d, heads, int(mlp_ratio * d)) for _ in range(n_blocks)])
        self.final_ln = nn.LayerNorm(d)
        self.post = nn.Sequential(nn.LayerNorm(d), nn.Linear(d, d),
                                  nn.GELU(), nn.Dropout(0.0),
                                  nn.Linear(d, d))
        self.n_q = n_q

    def forward(self, bev):
        from lvv_tpu.models.vat import bev_geometry
        b, c, h, w = bev.shape
        x = self.refine(bev)
        x = self.proj(x).permute(0, 2, 3, 1).reshape(b, h * w, -1)
        x = self.norm_tokens(x)
        geo_np, sid_np = bev_geometry(h, w)
        geo = torch.from_numpy(geo_np)
        x = x + self.geo_mlp(geo).unsqueeze(0)
        x = x + self.view_embed[torch.from_numpy(sid_np).long()].unsqueeze(0)
        q = self.query.unsqueeze(0).expand(b, -1, -1)
        per = self.n_q // NUM_VIEWS
        chunks = q.split(per, dim=1)
        q = torch.cat([ch + self.view_embed[k].view(1, 1, -1)
                       for k, ch in enumerate(chunks)], dim=1)
        for blk in self.blocks:
            q = blk(q, x)
        return self.post(self.final_ln(q))


class TVATVision(torch.nn.Module):
    """reference vat_vision.py:20-235."""

    def __init__(self, d_in, d_model, n_q, n_blocks, heads, mlp_ratio):
        super().__init__()
        nn = torch.nn
        self.query = nn.Parameter(torch.randn(n_q, d_in) * 0.02)
        self.view_query_embed = nn.Parameter(
            torch.randn(NUM_VIEWS, d_in) * 0.02)
        self.blocks = nn.ModuleList(
            [TVATBlock(d_in, heads, int(mlp_ratio * d_in))
             for _ in range(n_blocks)])
        self.final_ln = nn.LayerNorm(d_in)
        self.post = nn.Sequential(nn.LayerNorm(d_in),
                                  nn.Linear(d_in, d_in), nn.GELU(),
                                  nn.Dropout(0.0), nn.Linear(d_in, d_in))
        self.proj = nn.Sequential(nn.LayerNorm(d_in),
                                  nn.Linear(d_in, d_model), nn.GELU(),
                                  nn.Dropout(0.0),
                                  nn.Linear(d_model, d_model),
                                  nn.LayerNorm(d_model))
        self.n_q = n_q

    def forward(self, kv):
        b = kv.shape[0]
        q = self.query.unsqueeze(0).expand(b, -1, -1)
        per = self.n_q // NUM_VIEWS
        chunks = q.split(per, dim=1)
        q = torch.cat([ch + self.view_query_embed[k].view(1, 1, -1)
                       for k, ch in enumerate(chunks)], dim=1)
        for blk in self.blocks:
            q = blk(q, kv)
        return self.proj(self.post(self.final_ln(q)))


class TAdapter(torch.nn.Module):
    """reference vision_adapter.py:35-145."""

    def __init__(self, d_in):
        super().__init__()
        self.norm = torch.nn.LayerNorm(d_in)
        self.view_embed = torch.nn.Parameter(
            torch.randn(NUM_VIEWS, d_in) * 0.02)

    def forward(self, view_tokens):          # [B, V, T, d]
        b, v, t, d = view_tokens.shape
        x = view_tokens + self.view_embed.view(1, v, 1, d)
        return self.norm(x).reshape(b, v * t, d)


@pytest.fixture(scope="module")
def oracle_stack():
    cfg = _cfg()
    m = cfg.model
    torch.manual_seed(0)
    from transformers import (CLIPVisionConfig, CLIPVisionModel, Qwen2Config,
                              Qwen2ForCausalLM, SamVisionConfig,
                              SamVisionModel)
    sam = SamVisionModel(SamVisionConfig(
        hidden_size=m.sam.embed_dim, num_hidden_layers=m.sam.depth,
        num_attention_heads=m.sam.num_heads, image_size=m.sam.img_size,
        patch_size=m.sam.patch_size, window_size=m.sam.window_size,
        global_attn_indexes=list(m.sam.global_attn_indexes),
        use_rel_pos=True, mlp_ratio=m.sam.mlp_ratio,
        output_channels=m.sam.out_chans, num_channels=3,
        layer_norm_eps=1e-6)).eval()
    net_2 = torch.nn.Conv2d(m.sam.out_chans, m.sam.vary_dims[0], 3,
                            stride=2, padding=1, bias=False)
    net_3 = torch.nn.Conv2d(m.sam.vary_dims[0], m.sam.vary_dims[1], 3,
                            stride=2, padding=1, bias=False)
    clip = CLIPVisionModel(CLIPVisionConfig(
        hidden_size=m.clip.hidden_size,
        intermediate_size=m.clip.intermediate_size,
        num_hidden_layers=m.clip.num_layers,
        num_attention_heads=m.clip.num_heads, image_size=m.clip.image_size,
        patch_size=m.clip.patch_size, hidden_act="quick_gelu",
        layer_norm_eps=m.clip.layer_norm_eps)).eval()
    projector = torch.nn.Linear(m.projector.input_dim, m.projector.n_embed)
    adapter = TAdapter(m.adapter.d_model).eval()
    grid = m.sam.img_size // m.sam.patch_size // 4
    n_tokens = NUM_VIEWS * grid * grid
    vat_vision = TVATVision(
        m.vat_vision.d_in, m.vat_vision.d_model,
        n_tokens // m.vat_vision.compression_factor, m.vat_vision.n_blocks,
        m.vat_vision.n_heads, m.vat_vision.mlp_ratio).eval()
    vat_lidar = TVATLiDAR(
        m.bev_channels, m.vat_lidar.d_model, m.vat_lidar.n_queries,
        m.vat_lidar.n_blocks, m.vat_lidar.n_heads, m.vat_lidar.mlp_ratio,
        m.vat_lidar.pe_hidden).eval()
    qwen = Qwen2ForCausalLM(Qwen2Config(
        vocab_size=m.llm.vocab_size, hidden_size=m.llm.hidden_size,
        num_hidden_layers=m.llm.num_layers,
        num_attention_heads=m.llm.num_heads,
        num_key_value_heads=m.llm.num_kv_heads,
        intermediate_size=m.llm.intermediate_size,
        rope_theta=m.llm.rope_theta,
        max_position_embeddings=m.llm.max_position_embeddings,
        tie_word_embeddings=True, rms_norm_eps=m.llm.rms_norm_eps,
        attention_dropout=0.0)).eval()
    # multimodal special tokens appended after the base vocab
    # (reference model_setup special-token resize)
    qwen.resize_token_embeddings(m.llm.vocab_size
                                 + len(m.llm.special_tokens))
    return cfg, dict(sam=sam, net_2=net_2, net_3=net_3, clip=clip,
                     projector=projector, adapter=adapter,
                     vat_vision=vat_vision, vat_lidar=vat_lidar, qwen=qwen)


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def _conv_k(w):  # torch conv [O, I, kh, kw] -> flax [kh, kw, I, O]
    return np.ascontiguousarray(
        w.detach().numpy().transpose(2, 3, 1, 0))


def _torch_encode_prefix(t, cfg, images, bev):
    """Reference composition: per-view DeepEncoder -> adapter -> VATs ->
    splice scaffold. Returns prefix embeddings [B, P, D]."""
    m = cfg.model
    b = images.shape[0]
    vm = t["clip"].vision_model
    pre_ln = getattr(vm, "pre_layrnorm", None) or vm.pre_layernorm
    view_toks = []
    for v in range(NUM_VIEWS):
        feats = t["sam"](images[:, v]).last_hidden_state    # [B, C, g, g]
        feats = t["net_3"](t["net_2"](feats))               # [B, C', G, G]
        sam_flat = feats.flatten(2).transpose(1, 2)         # [B, G*G, C']
        x = torch.cat([vm.embeddings.class_embedding.view(1, 1, -1)
                       .expand(b, 1, -1), sam_flat], dim=1)
        x = x + vm.embeddings.position_embedding.weight.unsqueeze(0)
        x = pre_ln(x)
        x = vm.encoder(x).last_hidden_state                 # [B, 1+GG, H]
        fused = torch.cat([x[:, 1:], sam_flat], dim=-1)
        view_toks.append(t["projector"](fused))             # [B, GG, D]
    view_tokens = torch.stack(view_toks, dim=1)             # [B, V, GG, D]
    kv = t["adapter"](view_tokens)
    scale = cfg.model.prefix_scale
    v_prefix = t["vat_vision"](kv) * scale
    l_prefix = t["vat_lidar"](bev) * scale
    emb = t["qwen"].get_input_embeddings().weight
    vs, ve, ls, le = (emb[m.llm.vocab_size + i].view(1, 1, -1).expand(
        b, 1, -1) for i in range(4))
    return torch.cat([vs, v_prefix, ve, ls, l_prefix, le], dim=1)


def test_fullstack_answer_token_parity(oracle_stack):
    cfg, t = oracle_stack
    m = cfg.model
    rng = np.random.default_rng(7)
    B = 3                                                   # >= 3 prompts
    s = m.sam.img_size
    images = rng.normal(size=(B, NUM_VIEWS, 3, s, s)).astype(np.float32) * .5
    bev = rng.normal(size=(B, m.bev_channels) + tuple(m.bev_hw)
                     ).astype(np.float32)
    prompts = rng.integers(1, m.llm.vocab_size - 2, (B, 6)).astype(np.int32)

    # ---- torch greedy ----
    with torch.no_grad():
        prefix_t = _torch_encode_prefix(t, cfg, torch.from_numpy(images),
                                        torch.from_numpy(bev))
        ids = torch.from_numpy(prompts.astype(np.int64))
        done = torch.zeros(B, dtype=torch.bool)
        ref_tokens = []
        for _ in range(STEPS):
            te = t["qwen"].get_input_embeddings()(ids)
            embeds = torch.cat([prefix_t, te], dim=1)
            logits = t["qwen"](inputs_embeds=embeds).logits
            nxt = logits[:, -1].argmax(-1)
            nxt = torch.where(done, torch.full_like(nxt, EOS), nxt)
            ref_tokens.append(nxt.numpy().copy())
            done = done | (nxt == EOS)
            ids = torch.cat([ids, nxt[:, None]], dim=1)
    ref_tokens = np.stack(ref_tokens, axis=1)               # [B, STEPS]

    # ---- convert every module through the real converters ----
    from lvv_tpu.models import VQABatch
    model = VQAModel(m)
    batch = VQABatch(
        bev=jnp.asarray(bev), images=jnp.asarray(images),
        view_valid=jnp.ones((B, NUM_VIEWS), bool),
        text_ids=jnp.asarray(prompts),
        text_len=jnp.full((B,), prompts.shape[1], jnp.int32),
        labels=jnp.full(prompts.shape, -100, jnp.int32),
        use_vision=jnp.asarray(True), use_lidar=jnp.asarray(True))
    init = model.init(jax.random.PRNGKey(0), batch)["params"]
    sam_conv = convert_sam_state(from_transformers_sam(_sd(t["sam"])),
                                 depth=m.sam.depth)
    sam_conv["net_2"] = {"kernel": _conv_k(t["net_2"].weight)}
    sam_conv["net_3"] = {"kernel": _conv_k(t["net_3"].weight)}
    clip_conv = convert_clip_state(from_transformers_clip(
        _sd(t["clip"])), num_layers=m.clip.num_layers)
    # the bypass path never instantiates CLIP's own patch conv
    clip_conv.pop("patch_embed", None)
    conv = {
        "deepencoder": {
            "sam": sam_conv,
            "clip": clip_conv,
            "projector": convert_projector_state(
                {f"layers.{k}": v
                 for k, v in _sd(t["projector"]).items()}, "linear"),
        },
        "adapter": convert_vision_adapter_state(_sd(t["adapter"])),
        "vat_vision": convert_vat_vision_state(_sd(t["vat_vision"])),
        "vat_lidar": convert_vat_lidar_state(_sd(t["vat_lidar"])),
        "llm": convert_qwen_state(_sd(t["qwen"]),
                                  num_layers=m.llm.num_layers),
    }
    params = merge_params(init, conv)

    # ---- prefix parity first (diagnosable failure before token compare) --
    prefix_j = model.apply({"params": params}, jnp.asarray(bev),
                           jnp.asarray(images),
                           jnp.ones((B, NUM_VIEWS), bool),
                           method=VQAModel.encode_prefix)
    np.testing.assert_allclose(np.asarray(prefix_j), prefix_t.numpy(),
                               atol=2e-3, rtol=2e-3)

    # ---- greedy answer-token equality through the REAL serving path ----
    tokens, _ = greedy_generate(
        model, params, jnp.asarray(bev), jnp.asarray(images),
        jnp.ones((B, NUM_VIEWS), bool), jnp.asarray(prompts),
        jnp.full((B,), prompts.shape[1], jnp.int32),
        max_new_tokens=STEPS, eos_id=EOS)
    np.testing.assert_array_equal(np.asarray(tokens), ref_tokens)


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_projector_converter_key_shapes(oracle_stack):
    """The projector converter must produce exactly the flax param names
    (guards the mlp_gelu Sequential-index walk)."""
    sd = {"layers.weight": np.zeros((8, 4)), "layers.bias": np.zeros(8)}
    out = convert_projector_state(sd, "linear")
    assert out["proj"]["kernel"].shape == (4, 8)
    sd2 = {"layers.0.weight": np.zeros((8, 4)),
           "layers.0.bias": np.zeros(8),
           "layers.2.weight": np.zeros((8, 8)),
           "layers.2.bias": np.zeros(8)}
    out2 = convert_projector_state(sd2, "mlp_gelu")
    assert set(out2) == {"mlp_0", "mlp_1"}
