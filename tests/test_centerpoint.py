"""CenterPoint family forward/detect contract."""
import pytest  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

from lvv_tpu.config import tiny_config
from lvv_tpu.models.centerpoint import CenterPointDetector, \
    height_compression
from lvv_tpu.models.registry import build_detector
from lvv_tpu.ops.sparse import from_voxels


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_height_compression():
    coords = np.full((4, 3), -1, np.int32)
    coords[0] = [1, 2, 3]   # z=1, y=2, x=3
    feats = np.zeros((4, 2), np.float32)
    feats[0] = [5.0, 7.0]
    st = from_voxels(jnp.asarray(coords), jnp.asarray(feats), (4, 4, 2))
    out = height_compression(st)
    assert out.shape == (2 * 2, 4, 4)   # C*nz, ny, nx
    # layout is channel-major: flat index = c*nz + z
    assert float(out[0 * 2 + 1, 2, 3]) == 5.0
    assert float(out[1 * 2 + 1, 2, 3]) == 7.0


def test_centerpoint_forward_and_detect():
    cfg = tiny_config()
    det = build_detector("CenterPoint", cfg.model.voxelnext, cfg.voxelize)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-7.5, 7.5, (300, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2.5, 0.5, 300)
    points, n = jnp.asarray(pts), jnp.int32(300)
    params = det.init(jax.random.PRNGKey(0), points, n)
    out = det.apply(params, points, n)
    assert np.isfinite(np.asarray(out["preds"]["hm"])).all()
    dets = det.apply(params, points, n, method=CenterPointDetector.detect)
    assert dets.boxes.shape[1] == 9
    assert np.isfinite(np.asarray(dets.boxes)).all()
