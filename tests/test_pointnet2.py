"""PointNet++ backbone tests (fixed-shape SA/FP over the sampling ops)."""
import pytest  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

from lvv_tpu.models.pointnet2 import (FeaturePropagation, PointNet2Backbone,
                                      SetAbstraction, SetAbstractionMSG)


def _cloud(rng, n=256, c=2):
    xyz = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    feats = rng.normal(size=(n, c)).astype(np.float32)
    return jnp.asarray(np.concatenate([xyz, feats], 1))


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_set_abstraction_shapes(rng):
    pts = _cloud(rng)
    sa = SetAbstraction(npoint=32, radius=2.0, nsample=8, mlp=(16, 32))
    params = sa.init(jax.random.PRNGKey(0), pts[:, :3], pts[:, 3:])
    nx, nf, nv = sa.apply(params, pts[:, :3], pts[:, 3:])
    assert nx.shape == (32, 3) and nf.shape == (32, 32)
    assert np.asarray(nv).any()
    assert np.isfinite(np.asarray(nf)).all()


def test_msg_concat(rng):
    pts = _cloud(rng)
    sa = SetAbstractionMSG(npoint=16, radii=(1.0, 2.0), nsamples=(4, 8),
                           mlps=((8, 8), (8, 16)))
    params = sa.init(jax.random.PRNGKey(0), pts[:, :3], pts[:, 3:])
    _, nf, _ = sa.apply(params, pts[:, :3], pts[:, 3:])
    assert nf.shape == (16, 8 + 16)


def test_feature_propagation(rng):
    src_xyz = jnp.asarray(rng.uniform(-4, 4, (16, 3)).astype(np.float32))
    src_f = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
    dst_xyz = jnp.asarray(rng.uniform(-4, 4, (64, 3)).astype(np.float32))
    fp = FeaturePropagation(mlp=(8,))
    params = fp.init(jax.random.PRNGKey(0), dst_xyz, None, src_xyz, src_f)
    out = fp.apply(params, dst_xyz, None, src_xyz, src_f)
    assert out.shape == (64, 8)


def test_backbone_end_to_end(rng):
    pts = _cloud(rng, n=512)
    bb = PointNet2Backbone(npoints=(128, 32, 16, 8),
                           radii=(1.0, 2.0, 3.0, 4.0),
                           nsamples=(8, 8, 8, 8),
                           channels=(8, 16, 16, 32), out_channels=16)
    params = bb.init(jax.random.PRNGKey(0), pts)
    out = bb.apply(params, pts)
    assert out.shape == (512, 16)
    assert np.isfinite(np.asarray(out)).all()
    # gradient flow
    g = jax.grad(lambda p: jnp.sum(bb.apply(p, pts) ** 2))(params)
    assert max(float(jnp.abs(l).max())
               for l in jax.tree_util.tree_leaves(g)) > 0
