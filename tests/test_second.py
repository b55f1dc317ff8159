"""SECOND family: forward, anchor-loss wiring, detect."""
import pytest  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

from lvv_tpu.config import tiny_config
from lvv_tpu.models.registry import build_detector
from lvv_tpu.models.second import SECONDDetector


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_second_forward_loss_detect():
    cfg = tiny_config()
    det = build_detector("SECOND", cfg.model.voxelnext, cfg.voxelize)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-7.5, 7.5, (300, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2.5, 0.5, 300)
    points, n = jnp.asarray(pts), jnp.int32(300)
    params = det.init(jax.random.PRNGKey(0), points, n)
    out = det.apply(params, points, n)
    assert out["anchors"].shape[0] == out["preds"]["cls"].shape[0]

    gt = jnp.asarray([[0, 0, -1, 4.6, 1.95, 1.72, 0.0, 0, 0]], jnp.float32)
    loss, aux = det.apply(params, out, gt, jnp.asarray([0], jnp.int32),
                          jnp.asarray([True]), method=SECONDDetector.loss)
    assert np.isfinite(float(loss))

    dets = det.apply(params, points, n, method=SECONDDetector.detect)
    assert np.isfinite(np.asarray(dets.boxes)).all()
