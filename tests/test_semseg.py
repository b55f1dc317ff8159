"""Multimodal focal-conv image branch: ResNet feature trunk, pyramid
channel reduce, voxel->pixel projection math, and image-fused focal conv
(reference focal_sparse_conv/SemanticSeg/* + focal_sparse_conv.py use_img
path)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lvv_tpu.models import semseg
from lvv_tpu.models.semseg import (BasicBlock2D, PyramidFeat2D,
                                   ResNetFeatures, gather_image_features,
                                   project_voxels_to_image)


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_resnet_layer1_stride_and_channels():
    m = ResNetFeatures(layers_out=("layer1",))
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert set(out) == {"layer1"}
    assert out["layer1"].shape == (1, 16, 16, 256)   # stride 4, 64*4 ch


def test_resnet_two_layers():
    m = ResNetFeatures(layers_out=("layer1", "layer2"))
    x = jnp.zeros((1, 64, 64, 3))
    out = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert out["layer2"].shape == (1, 8, 8, 512)     # stride 8, 128*4 ch


def test_pyramid_channel_reduce():
    m = PyramidFeat2D(feat_layers=("layer1",), reduce_out=(32,))
    x = jnp.zeros((1, 32, 32, 3))
    out = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert out["layer1_feat2d"].shape == (1, 8, 8, 32)


def test_projection_math():
    """Identity-ish camera: x right (u), y down (v), z forward (depth)."""
    proj = jnp.asarray([[1.0, 0, 0, 0],
                        [0, 1.0, 0, 0],
                        [0, 0, 1.0, 0]])
    coords = jnp.asarray([[4, 6, 2],     # center (2.0, 3.0, 1.0) -> (2, 3)
                          [0, 0, 0]])    # center (0, 0, 0) -> behind
    uv, valid = project_voxels_to_image(
        coords, voxel_size=(0.5, 0.5, 0.5), pc_range=(0, 0, 0, 1, 1, 1),
        proj=proj)
    assert uv[0].tolist() == [2, 3]
    assert bool(valid[0]) and not bool(valid[1])    # z=0 is behind


def test_gather_zero_fills_out_of_image():
    img = jnp.arange(2 * 3 * 4, dtype=jnp.float32).reshape(2, 3, 4)
    uv = jnp.asarray([[1, 0], [5, 0], [0, 9]])      # in, u-oob, v-oob
    valid = jnp.asarray([True, True, True])
    g = gather_image_features(img, uv, valid)
    np.testing.assert_array_equal(np.asarray(g[0]), np.asarray(img[0, 1]))
    assert float(jnp.abs(g[1]).sum()) == 0
    assert float(jnp.abs(g[2]).sum()) == 0


def test_focal_conv_use_img_fuses():
    """Image-fused focal conv runs, and the image actually changes both
    the importance and the output features (gradient flows from img)."""
    from lvv_tpu.models.focal_conv import FocalSparseConv
    from lvv_tpu.ops.sparse import SparseTensor, linearize

    rng = np.random.default_rng(0)
    grid = (8, 8, 4)
    coords = np.stack(np.meshgrid(np.arange(4), np.arange(4), [1],
                                  indexing="ij"), -1).reshape(-1, 3)
    ids = linearize(jnp.asarray(coords, jnp.int32), grid)
    order = jnp.argsort(ids)
    feats = jnp.asarray(rng.normal(size=(len(coords), 8)), jnp.float32)
    st = SparseTensor(ids[order], feats[order], grid)

    proj = jnp.asarray([[4.0, 0, 0, 0], [0, 4.0, 0, 0], [0, 0, 1.0, 0.5]])
    img_a = jnp.asarray(rng.normal(size=(16, 16, 8)), jnp.float32)
    vs, pr = (1.0, 1.0, 1.0), (0, 0, 0, 8, 8, 4)

    m = FocalSparseConv(out_ch=8, spawn=16, use_img=True)
    params = m.init(jax.random.PRNGKey(1), st, img_a, proj, vs, pr)
    out_a, imp_a = m.apply(params, st, img_a, proj, vs, pr)
    out_b, imp_b = m.apply(params, st, img_a * 0.0, proj, vs, pr)
    assert out_a.features.shape[0] == st.ids.shape[0] + 16
    assert not np.allclose(np.asarray(imp_a), np.asarray(imp_b))
    assert not np.allclose(np.asarray(out_a.features),
                           np.asarray(out_b.features))

    g = jax.grad(lambda im: jnp.sum(
        m.apply(params, st, im, proj, vs, pr)[0].features ** 2))(img_a)
    assert float(jnp.abs(g).sum()) > 0


def test_voxelrcnn_focal_multimodal_assembly():
    """The registered VoxelRCNN with the focal trunk + camera branch
    (reference kitti_models/voxel_rcnn_car_focal_multimodal.yaml):
    forward, detections, and a finite loss incl. loss_box_of_pts with
    gradients reaching the image branch."""
    import dataclasses
    from lvv_tpu.config import tiny_config
    from lvv_tpu.models.registry import build_detector

    cfg = tiny_config()
    det_cfg = dataclasses.replace(cfg.model.voxelnext, focal=True,
                                  focal_use_img=True, focal_spawn=16)
    det = build_detector("VoxelRCNN", det_cfg, cfg.voxelize)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-7.5, 7.5, (128, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2.5, 0.5, 128)
    image = jnp.asarray(rng.uniform(size=(32, 32, 3)), jnp.float32)
    proj = jnp.asarray([[2.0, 0, 0, 16.0],
                        [0, 2.0, 0, 16.0],
                        [0, 0, 1.0, 10.0]])   # everything in front
    args = (jnp.asarray(pts), jnp.int32(128), image, proj)
    params = det.init(jax.random.PRNGKey(0), *args)
    out = det.apply(params, *args)
    assert len(out["focal_aux"]) == 4        # multimodal + focal1..3
    assert np.isfinite(np.asarray(out["detections"].boxes)).all()

    gt = jnp.zeros((4, 9)).at[0].set(
        jnp.asarray([1.0, 2.0, -1.0, 4.0, 2.0, 1.5, 0.3, 0, 0]))
    gm = jnp.zeros((4,), bool).at[0].set(True)

    def loss_fn(p):
        o = det.apply(p, *args)
        loss, stats = det.loss(o, gt, jnp.zeros((4,), jnp.int32), gm)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    g_img = grads["params"]["semseg"]
    leaves = jax.tree_util.tree_leaves(g_img)
    assert sum(float(jnp.abs(l).sum()) for l in leaves) > 0


def test_focal_conv_use_img_requires_inputs():
    from lvv_tpu.models.focal_conv import FocalSparseConv
    from lvv_tpu.ops.sparse import SparseTensor, linearize

    grid = (4, 4, 2)
    ids = linearize(jnp.asarray([[1, 1, 1]], jnp.int32), grid)
    st = SparseTensor(ids, jnp.ones((1, 4)), grid)
    m = FocalSparseConv(out_ch=4, spawn=4, use_img=True)
    with pytest.raises(ValueError, match="use_img"):
        m.init(jax.random.PRNGKey(0), st)


@pytest.mark.fast
def test_deeplabv3_converter_torch_parity():
    """Converted torchvision-layout weights reproduce the torch eval
    forward exactly (stem + layer1, frozen-BN trunk): a local torch
    replica of torchvision resnet50's stem+layer1 is the oracle
    (torchvision itself is absent; reference sem_deeplabv3.py:34-76)."""
    import torch
    import torch.nn as tnn

    torch.manual_seed(0)

    class TorchBottleneck(tnn.Module):
        def __init__(self, cin, width, stride=1):
            super().__init__()
            out = width * 4
            self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(width)
            self.conv2 = tnn.Conv2d(width, width, 3, stride, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(width)
            self.conv3 = tnn.Conv2d(width, out, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(out)
            self.relu = tnn.ReLU()
            self.downsample = None
            if cin != out or stride != 1:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, out, 1, stride, bias=False),
                    tnn.BatchNorm2d(out))

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            return self.relu(y + idt)

    class TorchTrunk(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU()
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            self.layer1 = tnn.Sequential(
                TorchBottleneck(64, 64), TorchBottleneck(256, 64),
                TorchBottleneck(256, 64))

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            return self.layer1(x)

    trunk = TorchTrunk()
    # non-trivial BN stats (fresh BN has mean 0 / var 1)
    with torch.no_grad():
        for m in trunk.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.1)
                m.bias.normal_(0, 0.1)
    trunk.eval()

    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        ref = trunk(x).numpy()

    from lvv_tpu.convert import merge_params
    from lvv_tpu.convert.deeplabv3_torch import convert_deeplabv3_state
    sd = {"backbone." + k: v.numpy() for k, v in
          trunk.state_dict().items()}
    converted = convert_deeplabv3_state(sd)

    model = semseg.ResNetFeatures(layers_out=("layer1",), norm="frozen_bn")
    xn = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    init = model.init(jax.random.PRNGKey(0), xn)["params"]
    got = np.asarray(model.apply(
        {"params": merge_params(init, converted)}, xn)["layer1"])
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref,
                               rtol=2e-4, atol=2e-4)
