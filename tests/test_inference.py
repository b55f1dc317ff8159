"""Inference subsystem: ModelLoader + InferenceEngine round trip (reference
inference/model_loader.py + inference_engine.py contracts)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lvv_tpu import config as C
from lvv_tpu.data import ByteTokenizer
from lvv_tpu.inference import InferenceEngine, ModelLoader
from lvv_tpu.models import VQABatch, VQAModel
from lvv_tpu.parallel import create_state
from lvv_tpu.train.checkpoints import CheckpointManager
from lvv_tpu.train.optim import make_optimizer


@pytest.fixture(scope="module")
def saved_checkpoint(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ckpt")
    cfg = C.override(C.tiny_config(), "model.dtype", "float32")
    # ranks must come from the config — ModelLoader rebuilds from config.json
    model = VQAModel(cfg.model,
                     llm_lora_rank=cfg.model.llm_lora.r,
                     llm_lora_alpha=cfg.model.llm_lora.alpha,
                     clip_lora_rank=cfg.model.clip_lora.r,
                     clip_lora_alpha=cfg.model.clip_lora.alpha)
    c, (h, w) = cfg.model.bev_channels, cfg.model.bev_hw
    s = cfg.model.sam.img_size
    batch = VQABatch(
        bev=jnp.zeros((1, c, h, w)), images=jnp.zeros((1, 6, 3, s, s)),
        view_valid=jnp.ones((1, 6), bool),
        text_ids=jnp.zeros((1, 8), jnp.int32),
        text_len=jnp.full((1,), 8, jnp.int32),
        labels=jnp.full((1, 8), -100, jnp.int32),
        use_vision=jnp.asarray(True), use_lidar=jnp.asarray(True))
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    tx, _ = make_optimizer(cfg.train.optim, params, 10)
    state = create_state(params, tx, jax.random.PRNGKey(1))
    mgr = CheckpointManager(tmp / "checkpoints")
    mgr.save(state, step=3, tag="latest", cfg=cfg)
    return cfg, tmp / "checkpoints", params


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_loader_rebuilds_and_restores(saved_checkpoint):
    cfg, ckpt_dir, orig_params = saved_checkpoint
    loader = ModelLoader(str(ckpt_dir))
    assert loader.cfg.model.llm.hidden_size == cfg.model.llm.hidden_size
    model, params = loader.load_all()
    a = orig_params["vat_lidar"]["queries"]
    b = params["vat_lidar"]["queries"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_engine_generates(saved_checkpoint):
    cfg, ckpt_dir, _ = saved_checkpoint
    loader = ModelLoader(str(ckpt_dir))
    model, params = loader.load_all()
    tk = ByteTokenizer(cfg.model.llm.special_tokens)
    engine = InferenceEngine(model, params, tk, max_prompt=16,
                             max_new_tokens=4)
    bev = np.zeros((cfg.model.bev_channels, *cfg.model.bev_hw), np.float32)
    outs = engine.generate_batch(["What is ahead?", "Count the cars."],
                                 [bev, bev])
    assert len(outs) == 2
    assert all(isinstance(o, str) for o in outs)
    # deterministic greedy: same question twice -> same answer
    outs2 = engine.generate("What is ahead?", bev)
    assert outs2 == engine.generate("What is ahead?", bev)
