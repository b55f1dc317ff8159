"""Config system tests (replacing the reference's three config styles,
SURVEY.md §5)."""
import json

from lvv_tpu import config as C


def test_default_roundtrip():
    cfg = C.default_config()
    d = C.to_dict(cfg)
    cfg2 = C.from_dict(C.VQAConfig, d)
    assert cfg == cfg2
    assert cfg.model.llm.hidden_size == 896
    assert cfg.model.prefix_scale == 0.2


def test_override_dotted():
    cfg = C.default_config()
    cfg2 = C.override(cfg, "model.llm.hidden_size", 1024)
    assert cfg2.model.llm.hidden_size == 1024
    assert cfg.model.llm.hidden_size == 896  # frozen original untouched


def test_apply_overrides_parses_json():
    cfg = C.default_config()
    cfg = C.apply_overrides(cfg, [
        "train.epochs=7", "model.dtype=float32",
        "model.vat_lidar.n_queries=64",
    ])
    assert cfg.train.epochs == 7
    assert cfg.model.dtype == "float32"
    assert cfg.model.vat_lidar.n_queries == 64


def test_unknown_key_rejected():
    import pytest
    with pytest.raises(KeyError):
        C.from_dict(C.VQAConfig, {"nope": 1})


def test_base_inheritance(tmp_path):
    base = tmp_path / "base.json"
    child = tmp_path / "child.json"
    base.write_text(json.dumps({"train": {"epochs": 5, "seed": 1}}))
    child.write_text(json.dumps({"_base_": "base.json",
                                 "train": {"epochs": 9}}))
    data = C.load_file(child)
    assert data["train"] == {"epochs": 9, "seed": 1}


def test_save_load(tmp_path):
    cfg = C.tiny_config()
    p = tmp_path / "cfg.json"
    C.save(cfg, p)
    cfg2 = C.from_dict(C.VQAConfig, C.load_file(p))
    assert cfg == cfg2


def test_tiny_config_consistent():
    cfg = C.tiny_config()
    assert cfg.model.vat_vision.d_in == cfg.model.adapter.d_model
    assert cfg.model.vat_lidar.d_model == cfg.model.llm.hidden_size
