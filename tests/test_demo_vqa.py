"""tools/demo_vqa.py: multi-frame VQA through the serving engine, answer
JSONL contract, and rerun export (exercised against a stub rerun module —
the sdk is absent in this image, exactly as the reference gates its viz)."""
import json
import pathlib
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                       / "tools"))

from lvv_tpu import config as C
from lvv_tpu.data import ByteTokenizer
from lvv_tpu.inference.server import ServingEngine
from lvv_tpu.models import VQABatch, VQAModel


@pytest.fixture(scope="module")
def engine_and_frames(tmp_path_factory):
    cfg = C.override(C.tiny_config(), "model.dtype", "float32")
    model = VQAModel(cfg.model)
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
    tk = ByteTokenizer(cfg.model.llm.special_tokens)
    eng = ServingEngine(model, params, tk, max_batch=4, max_wait_ms=100.0,
                        max_new_tokens=3)

    root = tmp_path_factory.mktemp("frames")
    rng = np.random.default_rng(0)
    rows = []
    for i in range(3):
        np.save(root / f"f{i}.npy",
                rng.normal(size=(c, h, w)).astype(np.float16))
        rows.append({"bev_path": f"f{i}.npy"})
    np.save(root / "pts.npy", rng.normal(size=(50, 4)).astype(np.float32))
    rows[0]["points_path"] = "pts.npy"
    rows[0]["question"] = "custom question?"
    yield eng, rows, root
    eng.close()


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_run_frames_batched(engine_and_frames):
    from demo_vqa import run_frames

    eng, rows, root = engine_and_frames
    results = run_frames(eng, rows, root, "default q?")
    assert len(results) == 3
    assert results[0]["question"] == "custom question?"
    assert results[1]["question"] == "default q?"
    for r in results:
        assert isinstance(r["answer"], str)
    # all three frames coalesced into one bucket-4 program
    assert eng.stats()["batch_sizes"] == [3]


def test_export_rerun_with_stub(engine_and_frames, monkeypatch):
    import demo_vqa
    from lvv_tpu.viz import rerun_viz

    eng, rows, root = engine_and_frames
    logged = []
    stub = types.SimpleNamespace(
        init=lambda *a, **k: logged.append(("init",)),
        save=lambda p: logged.append(("save", p)),
        set_time_sequence=lambda *a: logged.append(("time", a)),
        log=lambda path, obj: logged.append(("log", path)),
        Points3D=lambda xyz: ("points", np.asarray(xyz).shape),
        TextDocument=lambda s: ("text", s),
    )
    monkeypatch.setitem(sys.modules, "rerun", stub)
    monkeypatch.setattr(rerun_viz, "RERUN_AVAILABLE", True)

    results = [{"question": "q", "answer": f"a{i}"} for i in range(3)]
    ok = demo_vqa.export_rerun(rows, results, root, rrd="x.rrd")
    assert ok
    assert ("save", "x.rrd") in logged
    assert sum(1 for e in logged if e[0] == "log") == 4  # 3 QA + 1 points


def test_export_rerun_absent_is_false(engine_and_frames):
    import demo_vqa

    eng, rows, root = engine_and_frames
    assert demo_vqa.export_rerun(rows, [], root) is False
