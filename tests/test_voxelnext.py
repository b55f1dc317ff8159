"""VoxelNeXt detector tests (tiny grids): forward shape contract, BEV
bridge, decode, loss/target assignment, gradient flow."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvv_tpu.config import tiny_config
from lvv_tpu.models.voxelnext import (VoxelNeXtDetector, decode_detections)
from lvv_tpu.models.voxelnext_loss import (assign_targets,
                                           gaussian_focal_loss,
                                           voxelnext_loss)


@pytest.fixture(scope="module")
def det():
    cfg = tiny_config()
    model = VoxelNeXtDetector(det_cfg=cfg.model.voxelnext,
                              vox_cfg=cfg.voxelize)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-7.5, 7.5, (600, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2.5, 0.5, 600)
    points = jnp.asarray(pts)
    n = jnp.int32(600)
    params = model.init(jax.random.PRNGKey(0), points, n)
    return cfg, model, params, points, n


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_forward_bev_contract(det):
    cfg, model, params, points, n = det
    out = model.apply(params, points, n)
    grid = model.voxel_grid().grid_size
    stride = 8
    c = cfg.model.voxelnext.out_channels
    # dense BEV is [C, ny/stride, nx/stride] — the L2->L4 bridge
    assert out["bev_dense"].shape == (c, -(-grid[1] // stride),
                                      -(-grid[0] // stride))
    assert np.isfinite(np.asarray(out["bev_dense"])).all()
    assert int(out["bev_sparse"].num_active()) > 0


def test_head_outputs(det):
    cfg, model, params, points, n = det
    out = model.apply(params, points, n)
    preds = out["preds"]
    ncls = cfg.model.voxelnext.num_classes
    assert preds["hm"].features.shape[-1] == ncls
    assert preds["center"].features.shape[-1] == 2
    assert preds["dim"].features.shape[-1] == 3
    assert preds["rot"].features.shape[-1] == 2


def test_decode_detections(det):
    cfg, model, params, points, n = det
    dets = model.apply(params, points, n, method=VoxelNeXtDetector.detect)
    kmax = cfg.model.voxelnext.nms_post_max
    assert dets.boxes.shape == (kmax, 9)
    assert dets.scores.shape == (kmax,)
    assert int(dets.count) >= 0
    b = np.asarray(dets.boxes[: int(dets.count)])
    if len(b):
        # decoded centers must lie in the point range
        pr = cfg.voxelize.point_range
        assert (b[:, 0] >= pr[0] - 1).all() and (b[:, 0] <= pr[3] + 1).all()
        assert (b[:, 3:6] > 0).all()   # positive dims via exp


def test_assign_targets_and_loss(det):
    cfg, model, params, points, n = det
    out = model.apply(params, points, n)
    bev = out["bev_sparse"]
    # centers chosen to sit ON distinct stride-8 BEV cells (the tiny grid is
    # only 2x2 at stride 8: cell centers at x,y in {-8, 0})
    gt_boxes = jnp.asarray([[0.0, 0, -1, 4, 2, 1.5, 0.3, 0, 0],
                            [-7.9, -7.9, -1, 2, 2, 1.0, 0.0, 0, 0],
                            [0.0] * 9], jnp.float32)
    gt_labels = jnp.asarray([0, 2, 0], jnp.int32)
    gt_mask = jnp.asarray([True, True, False])
    targets = assign_targets(bev, gt_boxes, gt_labels, gt_mask,
                             cfg.model.voxelnext, cfg.voxelize, stride=8)
    hm = np.asarray(targets["hm"])
    assert hm.shape == (bev.ids.shape[0], cfg.model.voxelnext.num_classes)
    assert hm.max() > 0.5           # some site close to a gt center
    assert hm[:, 1].max() == 0.0    # class 1 unused
    assert int(np.asarray(targets["reg_mask"]).sum()) == 2

    loss, aux = voxelnext_loss(out["preds"], bev, gt_boxes, gt_labels,
                               gt_mask, cfg.model.voxelnext, cfg.voxelize,
                               stride=8)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_focal_loss_direction():
    """Loss must drop when predictions match the target."""
    v = 16
    tgt = jnp.zeros((v, 2)).at[0, 0].set(1.0)
    valid = jnp.ones((v,), bool)
    good = jnp.full((v, 2), -8.0).at[0, 0].set(8.0)
    bad = jnp.full((v, 2), -8.0).at[0, 0].set(-8.0)
    assert float(gaussian_focal_loss(good, tgt, valid)) < \
        float(gaussian_focal_loss(bad, tgt, valid))


def test_detector_grad_flow(det):
    cfg, model, params, points, n = det
    gt_boxes = jnp.asarray([[0.0, 0, -1, 4, 2, 1.5, 0.3, 0, 0]], jnp.float32)
    gt_labels = jnp.asarray([0], jnp.int32)
    gt_mask = jnp.asarray([True])

    def loss_fn(p):
        out = model.apply(p, points, n)
        loss, _ = voxelnext_loss(out["preds"], out["bev_sparse"], gt_boxes,
                                 gt_labels, gt_mask, cfg.model.voxelnext,
                                 cfg.voxelize, stride=8)
        return loss

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert max(float(jnp.abs(l).max()) for l in leaves) > 0


def test_capacity_schedule_honored():
    """A configured per-stage capacity schedule overrides the legacy 3/4
    shrink (audited nuScenes preset: models/voxelnext.py
    NUSCENES_CAPACITY_SCHEDULE)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from lvv_tpu.config import tiny_config
    from lvv_tpu.models.registry import build_detector

    cfg = tiny_config()
    det_cfg = dataclasses.replace(cfg.model.voxelnext,
                                  capacity_schedule=(48, 24, 12, 12, 12))
    det = build_detector("VoxelNeXt", det_cfg, cfg.voxelize)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-7.5, 7.5, (200, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2.5, 0.5, 200)
    params = det.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                      jnp.int32(200))
    out = det.apply(params, jnp.asarray(pts), jnp.int32(200))
    assert np.isfinite(np.asarray(out["bev_dense"])).all()


def test_sparse_conv_layer_masked_bn():
    """norm="bn": moments over VALID rows only; running stats update under
    mutable apply; eval uses the running average (reference norm_fn
    BatchNorm1d(eps=1e-3, momentum=0.01) over active voxels)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from lvv_tpu.models.voxelnext import SparseConvLayer
    from lvv_tpu.ops.sparse import SENTINEL, SparseTensor

    rng = np.random.default_rng(0)
    n, c = 32, 8
    ids = np.arange(n, dtype=np.int64)
    ids[20:] = SENTINEL          # 12 invalid rows
    feats = rng.normal(size=(n, c)).astype(np.float32)
    st = SparseTensor(jnp.asarray(ids), jnp.asarray(feats), (4, 4, 4))

    layer = SparseConvLayer(out_ch=c, kernel=1, norm="bn")
    variables = layer.init(jax.random.PRNGKey(0), st)
    assert "batch_stats" in variables

    # train-mode apply: stats must move toward the masked batch moments
    out, mutated = layer.apply(variables, st, mutable=["batch_stats"])
    stats = mutated["batch_stats"]
    mean = np.asarray(jax.tree_util.tree_leaves(stats)[0])
    assert np.any(mean != 0)

    # masked moments: an enormous INVALID feature must not perturb stats
    feats2 = feats.copy()
    feats2[25] = 1e6
    st2 = SparseTensor(jnp.asarray(ids), jnp.asarray(feats2), (4, 4, 4))
    _, mutated2 = layer.apply(variables, st2, mutable=["batch_stats"])
    for a, b in zip(jax.tree_util.tree_leaves(mutated["batch_stats"]),
                    jax.tree_util.tree_leaves(mutated2["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # eval-mode apply (no mutable): uses running stats, still finite
    out_eval = layer.apply(variables, st)
    assert np.all(np.isfinite(np.asarray(out_eval.features)))


def test_voxelnext_bn_mode_trains():
    """Full VoxelNeXt with norm="bn" through the generic train step."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from lvv_tpu.config import tiny_config
    from lvv_tpu.models.registry import build_detector
    from lvv_tpu.train.detector import make_detector_train_step

    cfg = tiny_config()
    det_cfg = dataclasses.replace(cfg.model.voxelnext, norm="bn")
    det = build_detector("VoxelNeXt", det_cfg, cfg.voxelize)
    rng = np.random.default_rng(0)
    b, n = 1, 128
    pts = rng.uniform(-3, 3, size=(b, n, 4)).astype(np.float32)
    batch = {
        "points": jnp.asarray(pts),
        "num_points": jnp.full((b,), n, jnp.int32),
        "gt_boxes": jnp.asarray([[[0.0, 0, -1, 4, 2, 1.5, 0.3, 0, 0]]],
                                jnp.float32),
        "gt_labels": jnp.zeros((b, 1), jnp.int32),
        "gt_mask": jnp.ones((b, 1), bool),
    }
    variables = det.init(jax.random.PRNGKey(0), batch["points"][0],
                         batch["num_points"][0])
    assert "batch_stats" in variables
    tx = optax.adam(1e-3)
    step = make_detector_train_step(det, tx, det_cfg, cfg.voxelize)
    state = (variables, tx.init(variables["params"]))
    before = jax.tree_util.tree_leaves(variables["batch_stats"])[0]
    for _ in range(2):
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    after = jax.tree_util.tree_leaves(state[0]["batch_stats"])[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
