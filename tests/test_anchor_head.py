"""Anchor head family: coder round trip, assignment, loss direction,
decode."""
import pytest  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

from lvv_tpu.config import tiny_config
from lvv_tpu.models.anchor_head import (AnchorHead, ResidualBoxCoder,
                                        anchor_head_loss,
                                        assign_anchor_targets,
                                        decode_anchor_preds,
                                        generate_anchors)


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_coder_roundtrip(rng):
    anchors = jnp.asarray(
        np.stack([rng.uniform(-10, 10, 16), rng.uniform(-10, 10, 16),
                  rng.uniform(-2, 0, 16), rng.uniform(1, 4, 16),
                  rng.uniform(1, 4, 16), rng.uniform(1, 3, 16),
                  rng.uniform(-np.pi, np.pi, 16)], 1).astype(np.float32))
    boxes = anchors + jnp.asarray(
        rng.normal(scale=0.3, size=(16, 7)).astype(np.float32))
    deltas = ResidualBoxCoder.encode(boxes, anchors)
    back = ResidualBoxCoder.decode(deltas, anchors)
    np.testing.assert_allclose(np.asarray(back), np.asarray(boxes),
                               atol=1e-4, rtol=1e-4)


def test_generate_anchors_layout():
    anchors, cls = generate_anchors(
        (2, 3), [(4.0, 2.0, 1.5), (0.8, 0.8, 1.8)],
        point_range=(-6, -4, -3, 6, 4, 1), stride_m=(4.0, 4.0))
    assert anchors.shape == (2 * 3 * 2 * 2, 7)
    assert set(cls.tolist()) == {0, 1}
    # first cell center at range_min + stride/2
    assert anchors[0, 0] == -4.0 and anchors[0, 1] == -2.0


def test_assignment_pos_neg():
    anchors = jnp.asarray([[0, 0, -1, 4, 2, 1.5, 0.0],
                           [20, 20, -1, 4, 2, 1.5, 0.0],
                           [0, 0, -1, 0.8, 0.8, 1.8, 0.0]], jnp.float32)
    anchor_cls = jnp.asarray([0, 0, 1], jnp.int32)
    gt = jnp.asarray([[0.1, 0, -1, 4, 2, 1.5, 0.1, 0, 0]], jnp.float32)
    t = assign_anchor_targets(anchors, anchor_cls, gt,
                              jnp.asarray([0], jnp.int32),
                              jnp.asarray([True]))
    tgt = np.asarray(t["cls"])
    assert tgt[0] == 1       # class-0 anchor on the gt -> positive (label+1)
    assert tgt[1] == 0       # far anchor -> negative
    assert tgt[2] == 0       # wrong-class anchor -> negative


def test_anchor_head_forward_and_loss():
    cfg = tiny_config()
    ncls = 2
    head = AnchorHead(num_classes=ncls, anchors_per_cell=4)
    bev = jnp.ones((8, 4, 4))
    params = head.init(jax.random.PRNGKey(0), bev)
    preds = head.apply(params, bev)
    n = 4 * 4 * 4
    assert preds["cls"].shape == (n, ncls)
    assert preds["box"].shape == (n, 7)

    anchors, acls = generate_anchors(
        (4, 4), [(4.0, 2.0, 1.5), (1.0, 1.0, 1.8)],
        point_range=(-8, -8, -3, 8, 8, 1), stride_m=(4.0, 4.0))
    gt = jnp.asarray([[0, 0, -1, 4, 2, 1.5, 0.0, 0, 0]], jnp.float32)
    t = assign_anchor_targets(jnp.asarray(anchors), jnp.asarray(acls), gt,
                              jnp.asarray([0], jnp.int32),
                              jnp.asarray([True]))
    loss, aux = anchor_head_loss(preds, t, ncls)
    assert np.isfinite(float(loss)) and float(loss) > 0

    dets = decode_anchor_preds(preds, jnp.asarray(anchors),
                               jnp.asarray(acls), cfg.model.voxelnext)
    assert dets.boxes.shape[1] == 9
    assert np.isfinite(np.asarray(dets.boxes)).all()


def test_loss_decreases_with_training():
    """Few gradient steps on the anchor head must reduce its loss."""
    import optax
    ncls = 2
    head = AnchorHead(num_classes=ncls, anchors_per_cell=4)
    bev = jnp.asarray(np.random.default_rng(0).normal(
        size=(8, 4, 4)).astype(np.float32))
    params = head.init(jax.random.PRNGKey(0), bev)
    anchors, acls = generate_anchors(
        (4, 4), [(4.0, 2.0, 1.5), (1.0, 1.0, 1.8)],
        point_range=(-8, -8, -3, 8, 8, 1), stride_m=(4.0, 4.0))
    gt = jnp.asarray([[0, 0, -1, 4, 2, 1.5, 0.3, 0, 0]], jnp.float32)
    t = assign_anchor_targets(jnp.asarray(anchors), jnp.asarray(acls), gt,
                              jnp.asarray([0], jnp.int32),
                              jnp.asarray([True]))

    def loss_fn(p):
        preds = head.apply(p, bev)
        loss, _ = anchor_head_loss(preds, t, ncls)
        return loss

    tx = optax.adam(1e-2)
    opt = tx.init(params)
    l0 = float(loss_fn(params))
    for _ in range(10):
        g = jax.grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        params = optax.apply_updates(params, up)
    assert float(loss_fn(params)) < l0