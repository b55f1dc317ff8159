"""CLIP tower parity vs transformers CLIPVisionModel (random weights) +
bypass-path contract tests (reference test_clip_sdpa.py asserts the
[2,257,1024]-style shape; we additionally pin numerics)."""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from lvv_tpu.convert import merge_params
from lvv_tpu.convert.clip_torch import convert_clip_state, \
    from_transformers_clip
from lvv_tpu.models.clip import CLIPVisionTower, resample_abs_pos

CFG = dict(image_size=32, patch_size=8, hidden_size=32, num_layers=2,
           num_heads=2, intermediate_size=64)


def _oracle():
    from transformers import CLIPVisionConfig, CLIPVisionModel
    tc = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                          num_hidden_layers=2, num_attention_heads=2,
                          image_size=32, patch_size=8,
                          hidden_act="quick_gelu", layer_norm_eps=1e-5)
    torch.manual_seed(0)
    return CLIPVisionModel(tc).eval()


def test_clip_matches_transformers(key):
    oracle = _oracle()
    model = CLIPVisionTower(**CFG)
    x = np.random.default_rng(1).normal(size=(2, 3, 32, 32)).astype(np.float32)
    params = model.init(key, pixel_values=jnp.asarray(x))["params"]
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = merge_params(params, convert_clip_state(
        from_transformers_clip(sd), num_layers=2))
    out = model.apply({"params": params}, pixel_values=jnp.asarray(x))
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x)).last_hidden_state.numpy()
    assert out.shape == ref.shape == (2, 17, 32)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-4)


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_clip_bypass_shape(key):
    """SAM bypass: [B, H, G, G] patch features -> [B, 1+G*G, H] (reference
    clip_sdpa.py:147-169)."""
    model = CLIPVisionTower(**CFG)
    pe = jnp.ones((2, 32, 2, 2))
    params = model.init(key, patch_embeds=pe)
    out = model.apply(params, patch_embeds=pe)
    assert out.shape == (2, 5, 32)


def test_pos_resample_identity_and_resize():
    pos = jnp.asarray(np.random.default_rng(0).normal(
        size=(1 + 4 * 4, 8)).astype(np.float32))
    same = resample_abs_pos(pos, 4)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(pos))
    smaller = resample_abs_pos(pos, 2)
    assert smaller.shape == (1 + 2 * 2, 8)
    np.testing.assert_array_equal(np.asarray(smaller[0]), np.asarray(pos[0]))


def test_clip_layer_quant8_close_to_float(rng):
    import jax
    import numpy as np
    from lvv_tpu.models.clip import CLIPEncoderLayer
    from lvv_tpu.ops import fused_mlp
    x = jnp.asarray(rng.normal(size=(2, 16, 256)), jnp.float32)
    fused_mlp.set_interpret(True)
    try:
        lay = CLIPEncoderLayer(num_heads=4, intermediate_size=512)
        p = lay.init(jax.random.PRNGKey(0), x)
        ref = np.asarray(lay.apply(p, x))
        layq = CLIPEncoderLayer(num_heads=4, intermediate_size=512,
                                quant8=True)
        out = np.asarray(layq.apply(p, x))
    finally:
        fused_mlp.set_interpret(False)
    assert np.abs(out - ref).max() <= 0.05 * np.abs(ref).max()
