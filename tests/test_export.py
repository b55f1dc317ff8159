"""AOT serving bundle (jax.export) round-trip: serialized programs must be
token-identical to the live model — the deployment-artifact analogue of the
reference's model_loader round-trip (which re-traces python each start)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvv_tpu.config import tiny_config
from lvv_tpu.models import VQAModel, greedy_generate
from lvv_tpu.models.vqa import VQAModel as _VQAModel


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    from lvv_tpu.config.core import to_dict
    from lvv_tpu.inference.export import export_serving_bundle

    cfg = tiny_config()
    model = VQAModel(cfg.model, dtype=jnp.float32)
    out = tmp_path_factory.mktemp("bundle")
    b, t, new = 2, 12, 6
    files = export_serving_bundle(model, out, batch=b, prompt_len=t,
                                  max_new_tokens=new, eos_id=-1,
                                  cfg_dict=to_dict(cfg.model))
    return cfg, model, out, files, (b, t, new)


def _inputs(cfg, b, t):
    rng = np.random.default_rng(1)
    s = cfg.model.sam.img_size
    hw = cfg.model.bev_hw
    bev = jnp.asarray(rng.normal(
        size=(b, cfg.model.bev_channels, *hw)).astype(np.float32))
    images = jnp.asarray(
        rng.uniform(-1, 1, (b, 6, 3, s, s)).astype(np.float32))
    vv = jnp.ones((b, 6), bool)
    ids = jnp.asarray(rng.integers(0, 500, (b, t)), jnp.int32)
    plen = jnp.asarray([t, t - 3], jnp.int32)
    return bev, images, vv, ids, plen


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_bundle_files(bundle):
    import json
    _, _, out, files, (b, t, new) = bundle
    meta = json.loads((out / "meta.json").read_text())
    assert meta["batch"] == b and meta["max_new_tokens"] == new
    assert meta["args"]["images"]["shape"][0] == b
    assert (out / "generate.jaxexp").stat().st_size > 0


def test_exported_generate_token_identical(bundle):
    from lvv_tpu.inference.export import ExportedServing

    cfg, model, out, _, (b, t, new) = bundle
    bev, images, vv, ids, plen = _inputs(cfg, b, t)
    # params init AFTER export: the bundle must be weight-agnostic
    from lvv_tpu.models import VQABatch
    batch = VQABatch(bev=bev, images=images, view_valid=vv, text_ids=ids,
                     text_len=plen, labels=jnp.full_like(ids, -100),
                     use_vision=jnp.asarray(True),
                     use_lidar=jnp.asarray(True))
    params = model.init(jax.random.PRNGKey(0), batch)["params"]

    want_toks, want_lens = greedy_generate(
        model, params, bev, images, vv, ids, plen,
        max_new_tokens=new, eos_id=-1)

    srv = ExportedServing(out)
    got_toks, got_lens = srv.generate(params, bev, images, vv, ids, plen)
    np.testing.assert_array_equal(got_toks, np.asarray(want_toks))
    np.testing.assert_array_equal(got_lens, np.asarray(want_lens))


def test_exported_prefix_matches_live(bundle):
    from lvv_tpu.inference.export import ExportedServing
    from lvv_tpu.models import VQABatch

    cfg, model, out, _, (b, t, _) = bundle
    bev, images, vv, ids, plen = _inputs(cfg, b, t)
    batch = VQABatch(bev=bev, images=images, view_valid=vv, text_ids=ids,
                     text_len=plen, labels=jnp.full_like(ids, -100),
                     use_vision=jnp.asarray(True),
                     use_lidar=jnp.asarray(True))
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    want = model.apply({"params": params}, bev, images, vv,
                       method=_VQAModel.encode_prefix)
    srv = ExportedServing(out)
    got = srv.encode_prefix(params, bev, images, vv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
