"""Trainer + checkpoint round-trip smoke tests on a synthetic dataset
(reference training-test/test_checkpoints.py's Dummy-module pattern, scaled
to the real Trainer with the tiny config)."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvv_tpu import config as C
from lvv_tpu.train.checkpoints import CheckpointManager


@pytest.fixture
def synth_data(tmp_path):
    """Synthetic BEV features + QA JSONs matching the tiny config dims."""
    cfg = C.tiny_config()
    bev_dir = tmp_path / "bev"
    bev_dir.mkdir()
    c, (h, w) = cfg.model.bev_channels, cfg.model.bev_hw
    rng = np.random.default_rng(0)
    cap, grd = [], []
    for i in range(8):
        tok = f"tok{i:02d}"
        np.save(bev_dir / f"{tok}.npy",
                rng.normal(size=(c, h, w)).astype(np.float16))
        cap.append({"sample_token": tok, "question": f"What is in scene {i}?",
                    "answer": f"A car number {i}."})
        grd.append({"sample_token": tok, "question": "Where is the car?",
                    "answer_lidar": "[1, 2, 0, 4, 2, 1.5, 0.1]",
                    "template_type": "det_area"})
    (tmp_path / "cap.json").write_text(json.dumps(cap))
    (tmp_path / "grd.json").write_text(json.dumps(grd))
    cfg = C.override(cfg, "data.bev_features_dir", str(bev_dir))
    cfg = C.override(cfg, "data.caption_json", str(tmp_path / "cap.json"))
    cfg = C.override(cfg, "data.grounding_json", str(tmp_path / "grd.json"))
    cfg = C.override(cfg, "data.val_fraction", 0.25)
    cfg = C.override(cfg, "train.epochs", 1)
    cfg = C.override(cfg, "train.batch_size", 2)
    cfg = C.override(cfg, "train.max_prompt_tokens", 24)
    cfg = C.override(cfg, "train.max_answer_tokens", 8)
    cfg = C.override(cfg, "train.output_dir", str(tmp_path / "run"))
    cfg = C.override(cfg, "train.inference_samples", 2)
    cfg = C.override(cfg, "train.log_every", 1)
    cfg = C.override(cfg, "model.dtype", "float32")
    cfg = C.override(cfg, "mesh.model", 1)
    return cfg, tmp_path


def test_trainer_one_epoch(synth_data):
    from lvv_tpu.train import Trainer
    cfg, tmp = synth_data
    tr = Trainer(cfg)
    result = tr.train()
    assert result["steps"] >= 1
    hist = result["history"][0]
    assert np.isfinite(hist["train_loss"])
    assert np.isfinite(hist["val_loss"])
    assert "inference" in hist
    assert (tmp / "run" / "history.json").exists()
    assert (tmp / "run" / "train.log").exists()
    # latest checkpoint written and restorable via a fresh Trainer resume
    assert (tmp / "run" / "checkpoints" / "latest" / "state").exists()
    tr2 = Trainer(cfg)
    assert tr2.start_step == result["steps"]


@pytest.mark.fast
def test_checkpoint_roundtrip_and_prune(tmp_path):
    mgr = CheckpointManager(tmp_path / "ck", keep_last=2)
    state = {"params": {"w": jnp.arange(4.0)}, "step": jnp.asarray(7)}
    for s in [10, 20, 30, 40]:
        mgr.save({**state, "step": jnp.asarray(s)}, step=s)
    avail = [n for _, n in mgr.available()]
    assert avail == ["step_30", "step_40"]  # pruned to keep_last
    restored = mgr.restore("step_40", state)
    assert int(restored["step"]) == 40
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.arange(4.0))


def test_checkpoint_best_protected(tmp_path):
    mgr = CheckpointManager(tmp_path / "ck", keep_last=1)
    state = {"x": jnp.ones(2)}
    mgr.save(state, step=1, is_best=True)
    for s in [2, 3, 4]:
        mgr.save(state, step=s)
    names = [n for _, n in mgr.available()]
    assert "step_1" in names  # best survives pruning
    assert "step_4" in names


def test_checkpoint_corrupt_fallback(tmp_path):
    mgr = CheckpointManager(tmp_path / "ck", keep_last=5)
    state = {"x": jnp.ones(2)}
    mgr.save(state, step=1)
    mgr.save(state, step=2)
    # corrupt the newest
    import shutil
    shutil.rmtree(tmp_path / "ck" / "step_2" / "state")
    (tmp_path / "ck" / "step_2" / "state").mkdir()
    restored, step = mgr.try_restore_newest(state)
    assert restored is not None and step == 1
