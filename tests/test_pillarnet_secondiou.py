"""PillarNet + SECONDNetIoU families (reference detectors/pillarnet.py,
second_net_iou.py + roi_heads/second_head.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvv_tpu.config import tiny_config
from lvv_tpu.models.registry import build_detector
from lvv_tpu.models.second_iou import (SECONDNetIoUDetector,
                                       cal_scores_by_npoints,
                                       roi_grid_points)


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-7.5, 7.5, (256, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2.5, 0.5, 256)
    return jnp.asarray(pts), jnp.int32(256)


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_roi_grid_points_rotated_lattice():
    rois = jnp.asarray([[0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0]])
    pts = roi_grid_points(rois, grid=2)             # [1, 4, 2]
    # axis-aligned box: lattice at +-dx/4, +-dy/4
    got = np.sort(np.asarray(pts[0]), axis=0)
    np.testing.assert_allclose(got[:, 0], [-1, -1, 1, 1], atol=1e-6)
    np.testing.assert_allclose(got[:, 1], [-0.5, -0.5, 0.5, 0.5], atol=1e-6)
    # 90deg rotation swaps extents
    rois90 = rois.at[0, 6].set(np.pi / 2)
    got90 = np.abs(np.asarray(roi_grid_points(rois90, grid=2)[0]))
    np.testing.assert_allclose(np.max(got90, axis=0), [0.5, 1.0], atol=1e-6)


def test_cal_scores_by_npoints_blend():
    cls = jnp.asarray([0.8, 0.8, 0.8])
    iou = jnp.asarray([0.2, 0.2, 0.2])
    n = jnp.asarray([5.0, 55.0, 500.0])
    out = np.asarray(cal_scores_by_npoints(cls, iou, n))
    assert out[0] == pytest.approx(0.8)     # few points: trust cls
    assert out[2] == pytest.approx(0.2)     # many points: trust IoU head
    assert 0.2 < out[1] < 0.8               # ramp between


def test_second_iou_forward_detect_loss(cloud):
    cfg = tiny_config()
    det = build_detector("SECONDNetIoU", cfg.model.voxelnext, cfg.voxelize)
    params = det.init(jax.random.PRNGKey(0), *cloud)
    out = det.apply(params, *cloud)
    assert np.isfinite(np.asarray(out["iou_logits"])).all()
    dets = det.apply(params, *cloud, method=SECONDNetIoUDetector.detect)
    assert np.isfinite(np.asarray(dets.scores)).all()

    gt = jnp.zeros((4, 9)).at[0].set(
        jnp.asarray([1.0, 2.0, -1.0, 4.0, 2.0, 1.5, 0.3, 0, 0]))
    gm = jnp.zeros((4,), bool).at[0].set(True)

    def loss_fn(p):
        o = det.apply(p, *cloud)
        loss, _ = det.loss(o, gt, jnp.zeros((4,), jnp.int32), gm)
        return loss

    loss, g = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_flatten_with_path(g)[0]
    iou_norm = sum(float(jnp.sum(jnp.abs(l))) for p, l in leaves
                   if "iou_head" in jax.tree_util.keystr(p))
    assert iou_norm > 0


def test_pillarnet_forward_and_detect(cloud):
    cfg = tiny_config()
    det = build_detector("PillarNet", cfg.model.voxelnext, cfg.voxelize)
    params = det.init(jax.random.PRNGKey(0), *cloud)
    out = det.apply(params, *cloud)
    assert np.isfinite(np.asarray(out["preds"]["hm"])).all()
    from lvv_tpu.models.pillarnet import PillarNetDetector
    dets = det.apply(params, *cloud, method=PillarNetDetector.detect)
    assert dets.boxes.shape[1] == 9
    assert np.isfinite(np.asarray(dets.boxes)).all()
