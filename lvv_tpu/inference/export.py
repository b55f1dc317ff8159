"""Ahead-of-time serving artifacts via `jax.export` (StableHLO).

Beyond-reference deployment capability: the reference ships a python
checkpoint loader (`src/encoder-decoder/inference/model_loader.py`) and
re-traces the model in every serving process; here the traced + lowered
serving programs themselves are serialized once, so a deployment host
runs them without the model code, flax, or a re-trace — the TPU analog
of a TorchScript/ONNX bundle.

A bundle directory holds:
- ``generate.jaxexp``       — (params, bev, images, view_valid, prompt_ids,
                              prompt_len) -> (tokens, lengths), the fully
                              fused greedy pipeline of `greedy_generate`.
- ``encode_prefix.jaxexp``  — (params, bev, images, view_valid) -> prefix,
                              the prefix-cache encoder (serving split).
- ``meta.json``             — arg shapes/dtypes, model config, decode
                              constants, jax version.

Params stay OUTSIDE the artifact (they are call arguments): one bundle
serves any checkpoint of the same architecture, and weights keep flowing
through the existing orbax checkpoints — exactly how the serving engines
consume them.

Portability notes:
- An export records the lowering platform(s). CPU exports lower the pure
  XLA paths; TPU exports contain `tpu_custom_call`s for the pallas
  kernels, which `jax.export` only allows behind an explicit
  DisabledSafetyCheck (custom-call ABI is not guaranteed stable across
  libtpu releases) — we opt in, mirroring what any pallas deployment
  accepts.
"""
from __future__ import annotations

import json
import pathlib
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

GENERATE = "generate.jaxexp"
ENCODE_PREFIX = "encode_prefix.jaxexp"
META = "meta.json"


def _arg_structs(model, batch: int, prompt_len: int):
    """ShapeDtypeStructs of the serving call signature (f32 sensor inputs,
    matching what the engines device_put)."""
    cfg = model.cfg
    c, (h, w) = cfg.bev_channels, cfg.bev_hw
    s = cfg.sam.img_size
    f32, i32 = jnp.float32, jnp.int32
    sd = jax.ShapeDtypeStruct
    return dict(
        bev=sd((batch, c, h, w), f32),
        images=sd((batch, 6, 3, s, s), f32),
        view_valid=sd((batch, 6), jnp.bool_),
        prompt_ids=sd((batch, prompt_len), i32),
        prompt_len=sd((batch,), i32),
    )


def _param_structs(model, args) -> Any:
    from ..models import VQABatch
    b = args["bev"].shape[0]
    batch = VQABatch(
        bev=args["bev"], images=args["images"],
        view_valid=args["view_valid"], text_ids=args["prompt_ids"],
        text_len=args["prompt_len"],
        labels=jax.ShapeDtypeStruct(args["prompt_ids"].shape, jnp.int32),
        use_vision=jax.ShapeDtypeStruct((), jnp.bool_),
        use_lidar=jax.ShapeDtypeStruct((), jnp.bool_))
    vs = jax.eval_shape(model.init, jax.random.PRNGKey(0), batch)
    return vs["params"]


def _export_fn(fn, in_structs, platforms: Optional[Sequence[str]]):
    kw = {}
    if platforms:
        kw["platforms"] = list(platforms)
    # pallas kernels lower to tpu_custom_call; exporting them requires the
    # explicit opt-out below (no-op for CPU-only exports)
    kw["disabled_checks"] = [
        jax.export.DisabledSafetyCheck.custom_call("tpu_custom_call"),
        jax.export.DisabledSafetyCheck.custom_call("Sharding"),
    ]
    exp = jax.export.export(jax.jit(fn), **kw)(*in_structs)
    return exp.serialize()


def export_serving_bundle(model, out_dir, *, batch: int = 1,
                          prompt_len: int = 48, max_new_tokens: int = 32,
                          eos_id: int = -1,
                          platforms: Optional[Sequence[str]] = None,
                          cfg_dict: Optional[Dict] = None) -> Dict[str, str]:
    """Serialize the generate + prefix-encode programs for one
    (batch, prompt_len, max_new_tokens) serving shape. Returns the file
    map. Engines compile one program per batch bucket; export once per
    bucket you deploy."""
    from ..models import greedy_generate
    from ..models.vqa import VQAModel

    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    args = _arg_structs(model, batch, prompt_len)
    params = _param_structs(model, args)

    def gen(p, bev, images, view_valid, prompt_ids, prompt_len_):
        return greedy_generate(model, p, bev, images, view_valid,
                               prompt_ids, prompt_len_,
                               max_new_tokens=max_new_tokens, eos_id=eos_id)

    def enc(p, bev, images, view_valid):
        return model.apply({"params": p}, bev, images, view_valid,
                           method=VQAModel.encode_prefix)

    (out / GENERATE).write_bytes(_export_fn(
        gen, (params, args["bev"], args["images"], args["view_valid"],
              args["prompt_ids"], args["prompt_len"]), platforms))
    (out / ENCODE_PREFIX).write_bytes(_export_fn(
        enc, (params, args["bev"], args["images"], args["view_valid"]),
        platforms))

    meta = {
        "batch": batch, "prompt_len": prompt_len,
        "max_new_tokens": max_new_tokens, "eos_id": eos_id,
        "platforms": list(platforms) if platforms else
            [jax.default_backend()],
        "jax_version": jax.__version__,
        "args": {k: {"shape": list(v.shape), "dtype": str(v.dtype)}
                 for k, v in args.items()},
        "model_config": cfg_dict,
    }
    (out / META).write_text(json.dumps(meta, indent=2))
    return {"generate": str(out / GENERATE),
            "encode_prefix": str(out / ENCODE_PREFIX),
            "meta": str(out / META)}


class ExportedServing:
    """Loads a bundle and serves it with no model code.

    >>> srv = ExportedServing("bundle/")
    >>> tokens, lengths = srv.generate(params, bev, images, vv, ids, lens)
    """

    def __init__(self, bundle_dir):
        d = pathlib.Path(bundle_dir)
        self.meta = json.loads((d / META).read_text())
        self._gen = jax.export.deserialize((d / GENERATE).read_bytes())
        p = d / ENCODE_PREFIX
        self._enc = jax.export.deserialize(p.read_bytes()) if p.exists() \
            else None

    def generate(self, params, bev, images, view_valid, prompt_ids,
                 prompt_len):
        toks, lens = self._gen.call(params, bev, images, view_valid,
                                    prompt_ids, prompt_len)
        return np.asarray(toks), np.asarray(lens)

    def encode_prefix(self, params, bev, images, view_valid):
        if self._enc is None:
            raise FileNotFoundError(ENCODE_PREFIX)
        return self._enc.call(params, bev, images, view_valid)
