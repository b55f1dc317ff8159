"""Point head: targets, loss, forward."""
import jax
import jax.numpy as jnp
import numpy as np

from lvv_tpu.models.point_head import (PointHead, point_head_loss,
                                       point_targets)


def test_point_targets():
    pts = jnp.asarray([[0.0, 0, 0, 1], [10, 10, 10, 1], [0.5, 0, 0, 1]])
    gt = jnp.asarray([[0, 0, 0, 4, 2, 1.5, 0.0, 0, 0]], jnp.float32)
    t = point_targets(pts, gt, jnp.asarray([2], jnp.int32),
                      jnp.asarray([True]))
    assert np.asarray(t["fg"]).tolist() == [True, False, True]
    assert np.asarray(t["cls"]).tolist() == [2, -1, 2]
    # offset target for point 0 is the box center relative to it (zeros)
    np.testing.assert_allclose(np.asarray(t["box"][0, :3]), [0, 0, 0],
                               atol=1e-6)


def test_point_head_forward_and_loss(rng):
    feats = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-3, 3, (32, 4)).astype(np.float32))
    gt = jnp.asarray([[0, 0, 0, 3, 3, 3, 0.2, 0, 0]], jnp.float32)
    head = PointHead(num_classes=3, predict_boxes=True, fc_channels=(16,))
    params = head.init(jax.random.PRNGKey(0), feats)
    preds = head.apply(params, feats)
    assert preds["cls"].shape == (32, 3) and preds["box"].shape == (32, 8)
    t = point_targets(pts, gt, jnp.asarray([1], jnp.int32),
                      jnp.asarray([True]))
    loss, aux = point_head_loss(preds, t, num_classes=3)
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert "point_reg_loss" in aux
