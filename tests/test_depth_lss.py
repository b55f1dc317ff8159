"""Depth-LSS camera branch: geometry + lift-splat + fuser."""
import jax
import jax.numpy as jnp
import numpy as np

from lvv_tpu.models.depth_lss import (ConvFuser, ConvImageBackbone,
                                      DepthLSSTransform, frustum_grid,
                                      frustum_to_ego)


def _cam():
    # pinhole: fx=fy=100, principal point (32, 32); camera looks +z = ego +x
    intr = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]], np.float32)
    cam2ego = np.array([[0, 0, 1, 0],     # ego x <- cam z (depth forward)
                        [-1, 0, 0, 0],    # ego y <- -cam x
                        [0, -1, 0, 1.6],  # ego z <- -cam y + height
                        [0, 0, 0, 1]], np.float32)
    return jnp.asarray(intr), jnp.asarray(cam2ego)


def test_frustum_to_ego_geometry():
    intr, c2e = _cam()
    # principal-point pixel at depth 10 -> straight ahead: ego (10, 0, 1.6)
    uvd = jnp.asarray([[[32.0, 32.0, 10.0]]])
    ego = np.asarray(frustum_to_ego(uvd, intr, c2e))[0, 0]
    np.testing.assert_allclose(ego, [10.0, 0.0, 1.6], atol=1e-5)
    # pixel right of center -> negative ego y (right-hand side)
    uvd = jnp.asarray([[[52.0, 32.0, 10.0]]])
    ego = np.asarray(frustum_to_ego(uvd, intr, c2e))[0, 0]
    assert ego[1] < 0 and abs(ego[0] - 10.0) < 1e-4


def test_depth_lss_places_mass_ahead():
    intr, c2e = _cam()
    m = DepthLSSTransform(out_channels=8, depth_bins=(1.0, 17.0, 2.0),
                          img_stride=8, bev_hw=(32, 32),
                          point_range=(-16, -16, -3, 16, 16, 1))
    feats = jnp.ones((1, 4, 8, 8))
    params = m.init(jax.random.PRNGKey(0), feats, intr[None], c2e[None])
    bev = m.apply(params, feats, intr[None], c2e[None])
    assert bev.shape == (8, 32, 32)
    mass = np.abs(np.asarray(bev)).sum(axis=0)   # [H, W] = [y, x]
    # camera looks toward +x: mass concentrated in x > center columns
    assert mass[:, 16:].sum() > 5 * mass[:, :16].sum()


def test_conv_backbone_and_fuser():
    bb = ConvImageBackbone(channels=(8, 8, 16))
    img = jnp.ones((3, 64, 64))
    p = bb.init(jax.random.PRNGKey(0), img)
    f = bb.apply(p, img)
    assert f.shape == (16, 8, 8)

    fuser = ConvFuser(out_channels=24)
    cam = jnp.ones((8, 16, 16))
    lidar = jnp.ones((32, 16, 16))
    pf = fuser.init(jax.random.PRNGKey(0), cam, lidar)
    out = fuser.apply(pf, cam, lidar)
    assert out.shape == (24, 16, 16)
