"""Augmentation ops + collectives (single-process paths)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvv_tpu.data.augment import (augment, random_flip, random_rotation,
                                  random_scaling)
from lvv_tpu.parallel.collectives import (all_gather_arrays,
                                          gather_metric_dicts,
                                          reduce_mean_scalar)


def _fixtures():
    pts = jnp.asarray([[1.0, 2.0, 0.5, 0.9], [-3.0, 0.5, -1.0, 0.1]])
    boxes = jnp.asarray([[1.0, 2.0, 0.0, 4.0, 2.0, 1.5, 0.3, 1.0, 0.5]])
    return pts, boxes


def test_rotation_preserves_radius():
    pts, boxes = _fixtures()
    key = jax.random.PRNGKey(0)
    p2, b2 = random_rotation(key, pts, boxes, rot_range=(0.5, 0.5))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(p2[:, :2]), axis=1),
        np.linalg.norm(np.asarray(pts[:, :2]), axis=1), atol=1e-5)
    assert abs(float(b2[0, 6]) - (0.3 + 0.5)) < 1e-5
    # velocity rotated too
    np.testing.assert_allclose(np.linalg.norm(np.asarray(b2[0, 7:9])),
                               np.linalg.norm(np.asarray(boxes[0, 7:9])),
                               atol=1e-6)


def test_scaling_scales_everything():
    pts, boxes = _fixtures()
    p2, b2 = random_scaling(jax.random.PRNGKey(0), pts, boxes,
                            scale_range=(2.0, 2.0))
    np.testing.assert_allclose(np.asarray(p2[:, :3]),
                               np.asarray(pts[:, :3]) * 2, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b2[0, 3:6]),
                               np.asarray(boxes[0, 3:6]) * 2, atol=1e-6)


def test_flip_consistency():
    """A point at a box center stays at the box center through any flip."""
    pts = jnp.asarray([[1.0, 2.0, 0.0, 0.5]])
    boxes = jnp.asarray([[1.0, 2.0, 0.0, 4.0, 2.0, 1.5, 0.3, 0.2, 0.1]])
    for axis in ("x", "y"):
        for seed in range(4):
            p2, b2 = random_flip(jax.random.PRNGKey(seed), pts, boxes, axis)
            np.testing.assert_allclose(np.asarray(p2[0, :3]),
                                       np.asarray(b2[0, :3]), atol=1e-6)


def test_augment_chain_runs_and_jits():
    pts, boxes = _fixtures()
    f = jax.jit(lambda k: augment(k, pts, boxes, translate_std=0.1))
    p2, b2 = f(jax.random.PRNGKey(3))
    assert p2.shape == pts.shape and b2.shape == boxes.shape
    assert np.isfinite(np.asarray(p2)).all()


def test_collectives_single_process():
    x = np.arange(6.0).reshape(2, 3)
    np.testing.assert_array_equal(all_gather_arrays(x), x)
    assert reduce_mean_scalar(3.5) == 3.5
    out = gather_metric_dicts({"loss": 1.0, "acc": 0.5})
    assert out == {"acc": 0.5, "loss": 1.0}


def test_local_rotation_moves_interior_points():
    """Per-box rotation: interior points rotate about the box center,
    outside points stay (reference augmentor_utils.local_rotation)."""
    import jax
    import jax.numpy as jnp
    from lvv_tpu.data.augment import random_local_rotation

    boxes = jnp.asarray([[10.0, 0, 0, 4, 4, 4, 0.0, 0, 0]])
    pts = jnp.asarray([[11.0, 0.0, 0.0, 1.0],     # inside, 1 m +x of center
                       [30.0, 0.0, 0.0, 1.0]])    # outside
    p, b = random_local_rotation(jax.random.PRNGKey(0), pts, boxes,
                                 rot_range=(np.pi / 2, np.pi / 2))
    # interior point swings to 1 m +y of the center
    np.testing.assert_allclose(np.asarray(p[0, :3]), (10.0, 1.0, 0.0),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(p[1, :3]), (30.0, 0.0, 0.0))
    assert float(b[0, 6]) == pytest.approx(np.pi / 2)


def test_local_scaling_and_translation():
    import jax
    import jax.numpy as jnp
    from lvv_tpu.data.augment import (random_local_scaling,
                                      random_local_translation)

    boxes = jnp.asarray([[0.0, 0, 0, 2, 2, 2, 0.3, 0, 0]])
    pts = jnp.asarray([[0.5, 0.0, 0.0, 1.0]])
    p, b = random_local_scaling(jax.random.PRNGKey(1), pts, boxes,
                                scale_range=(2.0, 2.0))
    np.testing.assert_allclose(np.asarray(p[0, :3]), (1.0, 0.0, 0.0),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(b[0, 3:6]), (4, 4, 4))
    p2, b2 = random_local_translation(jax.random.PRNGKey(2), pts, boxes,
                                      std=0.5)
    # point moves WITH the box: relative offset preserved
    np.testing.assert_allclose(np.asarray(p2[0, :3] - b2[0, :3]),
                               (0.5, 0, 0), atol=1e-6)


def test_frustum_dropout_masks():
    import jax
    import jax.numpy as jnp
    from lvv_tpu.data.augment import global_frustum_dropout

    pts = jnp.asarray(np.random.default_rng(0).uniform(
        -10, 10, (200, 4)).astype(np.float32))
    keep_top = global_frustum_dropout(jax.random.PRNGKey(0), pts,
                                      intensity_range=(0.3, 0.3),
                                      direction="top")
    kept = np.asarray(pts[keep_top, 2])
    assert keep_top.sum() < 200
    assert kept.max() <= float(pts[:, 2].max())
    keep_az = global_frustum_dropout(jax.random.PRNGKey(1), pts,
                                     intensity_range=(0.25, 0.25),
                                     direction="azimuth")
    # ~25% of the azimuth circle dropped
    assert 0.6 < float(keep_az.mean()) < 0.9
