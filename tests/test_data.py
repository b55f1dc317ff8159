"""Data layer tests: dataset indexing, leakage filter, packing, sampler
determinism (reference training-test/test_utils.py + sampler behavior)."""
import json

import numpy as np
import pytest

from lvv_tpu.data import (ByteTokenizer, Collator, DeterministicSampler,
                          MixedNuDataset, load_qa_rows, pack_text,
                          split_rows)


@pytest.fixture
def data_dir(tmp_path):
    bev = tmp_path / "bev" / "train"
    bev.mkdir(parents=True)
    for tok in ["tok_a", "tok_b", "tok_c"]:
        np.save(bev / f"{tok}.npy", np.ones((4, 6, 6), np.float16))
    cap = [{"sample_token": "tok_a", "question": "Describe the scene.",
            "answer": "A car ahead."},
           {"sample_token": "tok_missing", "question": "q", "answer": "a"}]
    grd = [{"sample_token": "tok_b", "question": "Where is the car?",
            "answer_lidar": "[1,2,0,4,2,1.5,0.2]", "template_type": "det_area"},
           {"sample_token": "tok_c", "question": "leak?",
            "answer_lidar": "x", "template_type": "det_distance"}]
    (tmp_path / "cap.json").write_text(json.dumps(cap))
    (tmp_path / "grd.json").write_text(json.dumps(grd))
    return tmp_path


def test_dataset_indexing_and_leakage_filter(data_dir):
    ds = MixedNuDataset(str(data_dir / "bev"), str(data_dir / "cap.json"),
                        str(data_dir / "grd.json"))
    # tok_missing dropped (no BEV); det_distance dropped (leakage filter,
    # reference dataset.py:86-91)
    assert len(ds) == 2
    tokens = {ds[i]["token"] for i in range(2)}
    assert tokens == {"tok_a", "tok_b"}
    item = ds[0]
    assert item["bev"].shape == (4, 6, 6)
    assert item["bev"].dtype == np.float32


def test_jsonl_rows(tmp_path):
    p = tmp_path / "rows.jsonl"
    p.write_text('{"sample_token": "t", "question": "q", "answer": "a"}\n'
                 '{"sample_token": "u", "question": "q2", "answer": "b"}\n')
    rows = load_qa_rows(str(p))
    assert len(rows) == 2


def test_pack_text_layout():
    tk = ByteTokenizer(["<vs>", "<ve>", "<ls>", "<le>"])
    ids, labels, length, n_p = pack_text(tk, "hi", "yes", max_prompt=50,
                                         max_answer=8)
    assert ids.shape == labels.shape == (50 + 8 + 1,)
    # answer span: labels equal ids there, -100 elsewhere
    span = slice(n_p, length)
    np.testing.assert_array_equal(labels[span], ids[span])
    assert (labels[:n_p] == -100).all()
    assert ids[length - 1] == tk.eos_id
    assert (ids[length:] == tk.pad_id).all()


def test_pack_text_truncation():
    tk = ByteTokenizer()
    ids, labels, length, n_p = pack_text(tk, "q" * 100, "a" * 100,
                                         max_prompt=10, max_answer=5)
    assert n_p == 10
    assert length == 10 + 5 + 1  # truncated answer + eos


def test_sampler_determinism_and_sharding():
    s1 = DeterministicSampler(list(range(20)), seed=3)
    s1.set_epoch(2)
    s2 = DeterministicSampler(list(range(20)), seed=3)
    s2.set_epoch(2)
    assert list(s1) == list(s2)
    s2.set_epoch(3)
    assert list(s1) != list(s2)
    shards = [list(DeterministicSampler(list(range(21)), seed=0,
                                        num_shards=4, shard=i))
              for i in range(4)]
    all_items = sum(shards, [])
    assert len(all_items) == 20  # drop_last to divisible
    assert len(set(all_items)) == 20


def test_split_rows_disjoint():
    tr, va = split_rows(100, 0.1, seed=0)
    assert len(va) == 10 and len(tr) == 90
    assert not set(tr.tolist()) & set(va.tolist())


def test_collator_shapes(data_dir):
    ds = MixedNuDataset(str(data_dir / "bev"), str(data_dir / "cap.json"),
                        str(data_dir / "grd.json"))
    tk = ByteTokenizer(["<a>", "<b>", "<c>", "<d>"])
    col = Collator(tk, max_prompt=16, max_answer=8, image_size=32,
                   bev_shape=(4, 6, 6))
    batch = col([ds[0], ds[1]])
    assert batch.bev.shape == (2, 4, 6, 6)
    assert batch.images.shape == (2, 6, 3, 32, 32)
    assert batch.text_ids.shape == (2, 25)
    assert not bool(batch.view_valid.any())  # no camera files in fixture
