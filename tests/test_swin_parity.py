"""Swin backbone numeric parity vs transformers SwinModel (random weights)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from lvv_tpu.convert import merge_params
from lvv_tpu.convert.swin_torch import convert_swin_state
from lvv_tpu.models.swin import (SwinBackbone, relative_position_index,
                                 shifted_window_mask)


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_relative_position_index_shape():
    idx = relative_position_index(4)
    assert idx.shape == (16, 16)
    assert idx.max() == (2 * 4 - 1) ** 2 - 1
    assert idx[0, 0] == idx[5, 5]  # same relative offset -> same entry


def test_shifted_window_mask_blocks_cross_regions():
    m = shifted_window_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    assert (m == 0).any() and (m == -100).any()
    # the top-left window has no region boundary: fully unmasked
    assert (m[0] == 0).all()


@pytest.mark.parametrize("depths,heads", [((2, 2), (2, 4))])
def test_swin_matches_transformers(key, depths, heads):
    from transformers import SwinConfig, SwinModel
    tc = SwinConfig(image_size=32, patch_size=4, embed_dim=16,
                    depths=list(depths), num_heads=list(heads),
                    window_size=4, mlp_ratio=2.0, num_channels=3,
                    hidden_dropout_prob=0.0,
                    attention_probs_dropout_prob=0.0, drop_path_rate=0.0,
                    layer_norm_eps=1e-5)
    torch.manual_seed(0)
    oracle = SwinModel(tc, add_pooling_layer=False).eval()

    model = SwinBackbone(embed_dim=16, depths=depths, num_heads=heads,
                        window=4, mlp_ratio=2.0)
    x = np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(
        np.float32)
    params = model.init(key, jnp.asarray(x))["params"]
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = merge_params(params, convert_swin_state(sd, depths))

    out = model.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x)).last_hidden_state.numpy()
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-4, rtol=3e-4)
