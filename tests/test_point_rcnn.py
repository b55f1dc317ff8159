"""PointRCNN assembly: proposal decode inverse + end-to-end forward."""
import pytest  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

from lvv_tpu.config import tiny_config
from lvv_tpu.models.point_head import point_targets
from lvv_tpu.models.point_rcnn import (PointRCNNDetector,
                                       decode_point_proposals)
from lvv_tpu.models.registry import build_detector


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_proposal_decode_inverts_targets():
    pts = jnp.asarray([[1.0, 2.0, -0.5, 0.9]])
    gt = jnp.asarray([[2.0, 3.0, 0.0, 4.0, 2.0, 1.5, 0.4, 0, 0]],
                     jnp.float32)
    t = point_targets(pts, gt, jnp.asarray([0], jnp.int32),
                      jnp.asarray([True]))
    boxes = decode_point_proposals(pts, {"box": t["box"]})
    np.testing.assert_allclose(np.asarray(boxes[0]),
                               np.asarray(gt[0, :7]), atol=1e-5)


def test_pointrcnn_forward_detect():
    cfg = tiny_config()
    det = build_detector("PointRCNN", cfg.model.voxelnext, cfg.voxelize)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-7.5, 7.5, (512, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2.5, 0.5, 512)
    points, n = jnp.asarray(pts), jnp.int32(500)
    params = det.init(jax.random.PRNGKey(0), points, n)
    out = det.apply(params, points, n)
    d = out["detections"]
    assert d.boxes.shape == (det.num_rois, 9)
    assert np.isfinite(np.asarray(d.boxes)).all()
    assert out["point_features"].shape == (512, 64)
