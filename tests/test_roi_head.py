"""RoI refinement head: canonical coder round trip, targets, loss, forward."""
import jax
import jax.numpy as jnp
import numpy as np

import pytest

from lvv_tpu.models.roi_head import (RoIHead, canonical_decode,
                                     canonical_encode, proposal_targets,
                                     refine_boxes, roi_head_loss)


def test_canonical_roundtrip(rng):
    rois = jnp.asarray(np.stack([
        rng.uniform(-10, 10, 8), rng.uniform(-10, 10, 8),
        rng.uniform(-2, 0, 8), rng.uniform(2, 5, 8),
        rng.uniform(1, 3, 8), rng.uniform(1, 2, 8),
        rng.uniform(-np.pi, np.pi, 8)], 1).astype(np.float32))
    gt = rois + jnp.asarray(rng.normal(scale=0.2, size=(8, 7))
                            .astype(np.float32))
    deltas = canonical_encode(gt, rois)
    back = canonical_decode(deltas, rois)
    np.testing.assert_allclose(np.asarray(back), np.asarray(gt), atol=1e-4,
                               rtol=1e-3)


@pytest.mark.fast
def test_proposal_targets():
    rois = jnp.asarray([[0, 0, 0, 4, 2, 1.5, 0.0],
                        [10, 10, 0, 4, 2, 1.5, 0.0]], jnp.float32)
    gt = jnp.asarray([[0.2, 0, 0, 4, 2, 1.5, 0.05, 0, 0]], jnp.float32)
    t = proposal_targets(rois, gt, jnp.asarray([True]))
    assert bool(t.fg_mask[0]) and not bool(t.fg_mask[1])
    assert float(t.cls_tgt[0]) > 0.9
    assert float(t.cls_tgt[1]) == 0.0


def test_roi_head_forward_loss_refine(rng):
    pts = jnp.asarray(rng.uniform(-5, 5, (128, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(128, 8)).astype(np.float32))
    rois = jnp.asarray([[0, 0, 0, 4, 2, 1.5, 0.2],
                        [2, 2, 0, 2, 2, 1.5, 0.0]], jnp.float32)
    head = RoIHead(grid=3, fc_channels=(32,))
    params = head.init(jax.random.PRNGKey(0), pts, feats, rois)
    preds = head.apply(params, pts, feats, rois)
    assert preds["cls"].shape == (2,) and preds["reg"].shape == (2, 7)

    gt = jnp.asarray([[0.1, 0, 0, 4, 2, 1.5, 0.2, 0, 0]], jnp.float32)
    t = proposal_targets(rois, gt, jnp.asarray([True]))
    loss, aux = roi_head_loss(preds, t)
    assert np.isfinite(float(loss))

    boxes, conf = refine_boxes(preds, rois)
    assert boxes.shape == (2, 7)
    assert ((0 <= np.asarray(conf)) & (np.asarray(conf) <= 1)).all()


def test_roi_head_trains(rng):
    import optax
    pts = jnp.asarray(rng.uniform(-5, 5, (128, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(128, 8)).astype(np.float32))
    rois = jnp.asarray([[0, 0, 0, 4, 2, 1.5, 0.2]], jnp.float32)
    gt = jnp.asarray([[0.3, 0.1, 0, 4.2, 2, 1.5, 0.3, 0, 0]], jnp.float32)
    t = proposal_targets(rois, gt, jnp.asarray([True]))
    head = RoIHead(grid=3, fc_channels=(32,))
    params = head.init(jax.random.PRNGKey(0), pts, feats, rois)

    def loss_fn(p):
        return roi_head_loss(head.apply(p, pts, feats, rois), t)[0]

    tx = optax.adam(1e-2)
    opt = tx.init(params)
    l0 = float(loss_fn(params))
    for _ in range(10):
        g = jax.grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        params = optax.apply_updates(params, up)
    assert float(loss_fn(params)) < l0