"""Detector train-step + recall-stat tests."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from lvv_tpu.config import tiny_config
from lvv_tpu.models.registry import build_detector
from lvv_tpu.train.detector import make_detector_train_step, recall_stats


def test_detector_train_step_reduces_loss():
    cfg = tiny_config()
    det = build_detector("VoxelNeXt", cfg.model.voxelnext, cfg.voxelize)
    rng = np.random.default_rng(0)
    b, n = 1, 300
    pts = rng.uniform(-7.5, 7.5, (b, n, 4)).astype(np.float32)
    pts[..., 2] = rng.uniform(-2.5, 0.5, (b, n))
    batch = {
        "points": jnp.asarray(pts),
        "num_points": jnp.full((b,), n, jnp.int32),
        "gt_boxes": jnp.asarray([[[0.0, 0, -1, 4, 2, 1.5, 0.3, 0, 0]]],
                                jnp.float32),
        "gt_labels": jnp.zeros((b, 1), jnp.int32),
        "gt_mask": jnp.ones((b, 1), bool),
    }
    params = det.init(jax.random.PRNGKey(0), batch["points"][0],
                      batch["num_points"][0])
    tx = optax.adam(1e-3)
    step = make_detector_train_step(det, tx, cfg.model.voxelnext,
                                    cfg.voxelize)
    state = (params, tx.init(params["params"]))
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # optimizing the same batch must descend


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_recall_stats():
    gt = np.array([[0, 0, 0, 4, 2, 1.5, 0.0],
                   [10, 10, 0, 4, 2, 1.5, 0.0]], np.float32)
    pred = np.array([[0.1, 0, 0, 4, 2, 1.5, 0.0]], np.float32)
    out = recall_stats(pred, 1, gt)
    assert out["gt"] == 2
    assert out["recall_0.3"] == 0.5  # one of two matched
    assert out["recall_0.7"] in (0.0, 0.5)
    empty = recall_stats(pred, 0, gt)
    assert empty["recall_0.5"] == 0.0


def _tiny_batch(rng, b=1, n=300, n_cls=3):
    pts = rng.uniform(-7.5, 7.5, (b, n, 4)).astype(np.float32)
    pts[..., 2] = rng.uniform(-2.5, 0.5, (b, n))
    return {
        "points": jnp.asarray(pts),
        "num_points": jnp.full((b,), n, jnp.int32),
        "gt_boxes": jnp.asarray([[[0.0, 0, -1, 4, 2, 1.5, 0.3, 0, 0]]],
                                jnp.float32),
        "gt_labels": jnp.zeros((b, 1), jnp.int32),
        "gt_mask": jnp.ones((b, 1), bool),
    }


@pytest.mark.parametrize("family", ["PointPillars", "CenterPoint",
                                    "SECOND", "TransFusion"])
def test_generic_train_step_covers_family(family):
    """The CLI's train step dispatches a real loss for every point-cloud
    family (reference: per-detector get_training_loss overrides)."""
    cfg = tiny_config()
    det = build_detector(family, cfg.model.voxelnext, cfg.voxelize)
    rng = np.random.default_rng(0)
    batch = _tiny_batch(rng)
    params = det.init(jax.random.PRNGKey(0), batch["points"][0],
                      batch["num_points"][0])
    tx = optax.adam(1e-3)
    step = make_detector_train_step(det, tx, cfg.model.voxelnext,
                                    cfg.voxelize)
    state = (params, tx.init(params["params"]))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0


def test_dense_center_loss_descends():
    from lvv_tpu.models.voxelnext_loss import dense_center_loss

    cfg = tiny_config()
    det = build_detector("PointPillars", cfg.model.voxelnext, cfg.voxelize)
    rng = np.random.default_rng(1)
    batch = _tiny_batch(rng)
    params = det.init(jax.random.PRNGKey(0), batch["points"][0],
                      batch["num_points"][0])
    tx = optax.adam(3e-3)
    step = make_detector_train_step(det, tx, cfg.model.voxelnext,
                                    cfg.voxelize)
    state = (params, tx.init(params["params"]))
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


@pytest.mark.fast
def test_bucketed_train_step_zero_drops():
    """Capacity-bucketed trainer: the exact host planner routes a small
    cloud to the small bucket and a dense cloud to the big one; the picked
    program reports ZERO dropped voxels downstream of the voxelizer, and
    both bucket programs train the SAME variables."""
    import lvv_tpu.ops.sparse as sp
    from lvv_tpu.train.detector import make_bucketed_detector_train_step

    cfg = tiny_config()
    rng = np.random.default_rng(0)
    b, n = 1, 800
    small = rng.uniform(-2.0, 2.0, (b, n, 4)).astype(np.float32)
    small[..., 2] = rng.uniform(-1.0, 0.0, (b, n))
    dense = rng.uniform(-7.8, 7.8, (b, n, 4)).astype(np.float32)
    dense[..., 2] = rng.uniform(-2.8, 2.8, (b, n))

    base_sched = cfg.model.voxelnext.capacity_schedule or \
        (512, 256, 128, 64, 32)
    n_st = len(base_sched)
    small_sched = tuple(max(s // 4, 16) for s in base_sched)
    buckets = ((256, small_sched), (4096, tuple(base_sched)))
    tx = optax.adam(1e-3)
    steps, pick = make_bucketed_detector_train_step(
        "VoxelNeXt", cfg.model.voxelnext, cfg.voxelize, tx, buckets)

    num = jnp.full((b,), n, jnp.int32)
    i_small = pick(small, np.full(b, n))
    i_dense = pick(dense, np.full(b, n))
    assert i_small == 0 and i_dense == 1

    det = build_detector("VoxelNeXt", cfg.model.voxelnext, cfg.voxelize)
    params = det.init(jax.random.PRNGKey(0), jnp.asarray(small[0]), num[0])
    state = (params, tx.init(params["params"]))
    gt = {"gt_boxes": jnp.asarray([[[0.0, 0, -1, 4, 2, 1.5, 0.3, 0, 0]]],
                                  jnp.float32),
          "gt_labels": jnp.zeros((b, 1), jnp.int32),
          "gt_mask": jnp.ones((b, 1), bool)}
    for pts, idx in ((small, i_small), (dense, i_dense)):
        batch = {"points": jnp.asarray(pts), "num_points": num, **gt}
        sp.set_overflow_debug(True)
        sp.reset_overflow_log()
        try:
            state, metrics = steps[idx](state, batch)
            jax.block_until_ready(metrics["loss"])
        finally:
            sp.set_overflow_debug(False)
        assert np.isfinite(float(metrics["loss"]))
        downstream = {k: v for k, v in sp.overflow_log().items()
                      if not k.startswith("voxelize")}
        dropped = {k: v for k, v in downstream.items()
                   if v.get("dropped", v.get("overflow", 0)) > 0}
        assert not dropped, dropped
