"""HTTP serving front-end (tools/serve_vqa.py): request/response contract,
concurrent clients sharing one batch, stats + health endpoints. Runs on
localhost only (no egress)."""
import json
import pathlib
import sys
import threading
import urllib.request
from http.server import ThreadingHTTPServer

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
def http_server(tmp_path_factory):
    from serve_vqa import make_handler

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
    engine = ServingEngine(model, params, tk, max_batch=2,
                           max_wait_ms=100.0, max_new_tokens=3)

    root = tmp_path_factory.mktemp("bev")
    np.save(root / "frame0.npy",
            np.zeros((c, h, w), np.float32))

    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine, root))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base
    srv.shutdown()
    engine.close()


def _get(url):
    with urllib.request.urlopen(url, timeout=300) as r:
        return r.status, json.loads(r.read())


def _post(url, obj):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_healthz(http_server):
    status, body = _get(http_server + "/healthz")
    assert status == 200 and body == {"ok": True}


def test_vqa_roundtrip_and_concurrent_batching(http_server):
    results = {}
    lock = threading.Lock()

    def client(i):
        status, body = _post(http_server + "/v1/vqa",
                             {"question": f"what is near? {i}",
                              "bev_path": "frame0.npy"})
        with lock:
            results[i] = (status, body)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)

    assert set(results) == {0, 1}
    for status, body in results.values():
        assert status == 200, body     # 500 carries {"error": repr(e)}
        assert isinstance(body["answer"], str)
        assert body["latency_s"] > 0

    status, stats = _get(http_server + "/v1/stats")
    assert status == 200
    assert stats["requests"] >= 2


def test_missing_bev_is_400(http_server):
    status, body = _post(http_server + "/v1/vqa",
                         {"question": "q", "bev_path": "nope.npy"})
    assert status == 400


def test_unknown_route_404(http_server):
    status, _ = _post(http_server + "/v1/unknown", {})
    assert status == 404
