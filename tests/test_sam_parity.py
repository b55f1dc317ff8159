"""SAM tower numeric parity vs torch (transformers SamVisionModel oracle with
random weights — no downloads; SURVEY.md §4 'add numeric golden tests')."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from lvv_tpu.convert import convert_sam_state, from_transformers_sam, \
    merge_params
from lvv_tpu.models.sam import SAMImageEncoder, window_partition, \
    window_unpartition


def _small_cfgs():
    from transformers import SamVisionConfig
    tc = SamVisionConfig(
        hidden_size=32, num_hidden_layers=3, num_attention_heads=2,
        image_size=32, patch_size=8, window_size=2, global_attn_indexes=[1],
        use_rel_pos=True, mlp_ratio=2.0, output_channels=16, mlp_dim=64,
        num_channels=3, layer_norm_eps=1e-6)
    jc = dict(img_size=32, patch_size=8, embed_dim=32, depth=3, num_heads=2,
              mlp_ratio=2.0, out_chans=16, window_size=2,
              global_attn_indexes=(1,), use_rel_pos=True, vary_dims=(8, 8))
    return tc, jc


def test_sam_matches_transformers_oracle(key):
    from transformers import SamVisionModel
    tc, jc = _small_cfgs()
    torch.manual_seed(0)
    oracle = SamVisionModel(tc).eval()

    model = SAMImageEncoder(**jc)
    x = np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(np.float32)
    params = model.init(key, jnp.asarray(x))["params"]

    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    converted = convert_sam_state(from_transformers_sam(sd), depth=3)
    params = merge_params(params, converted)

    with torch.no_grad():
        ref = oracle(torch.from_numpy(x)).last_hidden_state.numpy()

    # compare at the neck output: run our model but capture pre-VARY features
    # by building a model without the VARY head... instead recompute VARY
    # manually: our forward returns post-net_2/net_3. Use a probe module.
    from flax import linen as flax_nn

    class NeckProbe(SAMImageEncoder):
        @flax_nn.compact
        def __call__(self, x_nchw):
            import jax.numpy as jnp
            from flax import linen as nn
            from lvv_tpu.models.sam import SAMBlock, LayerNorm2d
            x = jnp.transpose(x_nchw, (0, 2, 3, 1))
            grid = self.img_size // self.patch_size
            x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                        strides=self.patch_size, padding="VALID",
                        name="patch_embed")(x)
            pos = self.param("pos_embed", nn.initializers.normal(0.02),
                             (1, grid, grid, self.embed_dim))
            x = x + pos
            for i in range(self.depth):
                ws = 0 if i in self.global_attn_indexes else self.window_size
                x = SAMBlock(self.num_heads, window_size=ws,
                             mlp_ratio=self.mlp_ratio,
                             use_rel_pos=self.use_rel_pos,
                             input_size=(grid, grid),
                             name=f"block_{i}")(x)
            x = nn.Conv(self.out_chans, (1, 1), use_bias=False,
                        name="neck_conv1")(x)
            x = LayerNorm2d(name="neck_ln1")(x)
            x = nn.Conv(self.out_chans, (3, 3), padding="SAME",
                        use_bias=False, name="neck_conv2")(x)
            x = LayerNorm2d(name="neck_ln2")(x)
            return jnp.transpose(x, (0, 3, 1, 2))

    probe = NeckProbe(**jc)
    sub = {k: v for k, v in params.items() if not k.startswith("net_")}
    out = probe.apply({"params": sub}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-4)


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_window_partition_roundtrip(key):
    x = jax.random.normal(key, (2, 10, 12, 8))
    w, padded = window_partition(x, 4)
    assert w.shape == (2 * 3 * 3, 4, 4, 8)
    back = window_unpartition(w, 4, padded, (10, 12))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_sam_full_output_shape(key):
    _, jc = _small_cfgs()
    model = SAMImageEncoder(**jc)
    x = jnp.ones((1, 3, 32, 32))
    params = model.init(key, x)
    out = model.apply(params, x)
    # 32/8 = 4 token grid, two stride-2 convs -> 1x1
    assert out.shape == (1, 8, 1, 1)
