"""PV-RCNN: BEV bilinear sampling, VSA, full two-stage assembly."""
import pytest  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

from lvv_tpu.config import tiny_config
from lvv_tpu.models.pv_rcnn import PVRCNNDetector, bev_bilinear


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_bev_bilinear_exact_at_centers():
    bev = jnp.zeros((2, 4, 4)).at[0, 1, 2].set(5.0)
    # grid over [-8, 8] with 4 cells -> 4m cells; cell (y=1, x=2) center at
    # x = -8 + (2+0.5)*4 = 2, y = -8 + (1+0.5)*4 = -2
    xy = jnp.asarray([[2.0, -2.0]])
    out = bev_bilinear(bev, xy, (-8.0, -8.0, -3, 8.0, 8.0, 1), (4.0, 4.0))
    np.testing.assert_allclose(np.asarray(out)[0], [5.0, 0.0], atol=1e-5)


def test_pvrcnn_forward_detect():
    cfg = tiny_config()
    det = PVRCNNDetector(det_cfg=cfg.model.voxelnext, vox_cfg=cfg.voxelize,
                         num_keypoints=64)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-7.5, 7.5, (400, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2.5, 0.5, 400)
    points, n = jnp.asarray(pts), jnp.int32(400)
    params = det.init(jax.random.PRNGKey(0), points, n)
    out = det.apply(params, points, n)
    assert out["keypoints"].shape == (64, 3)
    assert out["keypoint_features"].shape[0] == 64
    d = out["detections"]
    assert d.boxes.shape[1] == 9
    assert np.isfinite(np.asarray(d.boxes)).all()
    assert ((np.asarray(d.scores) >= 0)
            & (np.asarray(d.scores) <= 1 + 1e-6)).all()
