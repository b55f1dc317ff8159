"""Mesh/pjit tests on the 8-virtual-device CPU platform — the rebuild's
version of the reference's cluster-free distributed tests
(training-test/test_distributed.py:31-60)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvv_tpu.config import MeshConfig, tiny_config
from lvv_tpu.models import VQABatch, VQAModel
from lvv_tpu.parallel import (TrainState, create_state, make_mesh,
                              make_train_step, shard_batch, shard_params)
from lvv_tpu.train.optim import count_by_group, make_optimizer, param_group


def _tiny_batch(b=4):
    cfg = tiny_config()
    rng = np.random.default_rng(0)
    hw = cfg.model.bev_hw
    t = 8
    return cfg, VQABatch(
        bev=jnp.asarray(rng.normal(size=(b, cfg.model.bev_channels, *hw))
                        .astype(np.float32)),
        images=jnp.asarray(rng.uniform(-1, 1, (b, 6, 3, 64, 64))
                           .astype(np.float32)),
        view_valid=jnp.ones((b, 6), bool),
        text_ids=jnp.asarray(rng.integers(0, 500, (b, t)), jnp.int32),
        text_len=jnp.full((b,), t, jnp.int32),
        labels=jnp.asarray(rng.integers(0, 500, (b, t)), jnp.int32),
        use_vision=jnp.asarray(True), use_lidar=jnp.asarray(True))


@pytest.mark.fast
def test_mesh_shapes():
    mesh = make_mesh(MeshConfig(data=-1, model=2))
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh(MeshConfig(data=-1, model=1))
    assert mesh.shape == {"data": 8, "model": 1}
    with pytest.raises(ValueError):
        make_mesh(MeshConfig(data=3, model=2))


def test_param_group_assignment():
    assert param_group(("vat_lidar", "block_0", "mlp")) == "vat_lidar"
    assert param_group(("llm", "layer_0", "attn", "q_proj",
                        "lora_a")) == "llm_lora"
    assert param_group(("llm", "layer_0", "attn", "q_proj",
                        "kernel")) == "frozen"
    assert param_group(("deepencoder", "clip", "layer_1", "attn", "q_proj",
                        "lora_b")) == "clip_lora"
    assert param_group(("deepencoder", "projector", "proj",
                        "kernel")) == "adapter"
    assert param_group(("deepencoder", "sam", "net_2", "kernel")) == "adapter"
    assert param_group(("deepencoder", "sam", "block_0", "attn", "qkv",
                        "kernel")) == "frozen"
    assert param_group(("adapter", "view_embed")) == "adapter"


def test_frozen_params_do_not_move():
    cfg, batch = _tiny_batch(b=2)
    model = VQAModel(cfg.model, llm_lora_rank=2, llm_lora_alpha=4)
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    tx, _ = make_optimizer(cfg.train.optim, params, total_steps=10)
    mesh = make_mesh(MeshConfig(data=2, model=1), devices=jax.devices()[:2])
    step = make_train_step(model, tx, mesh, donate=False)
    state = create_state(params, tx, jax.random.PRNGKey(1))
    new_state, metrics = step(state, shard_batch(batch, mesh))
    assert np.isfinite(float(metrics["loss"]))
    # frozen: SAM backbone kernel identical; trainable: vat_lidar moved
    before = params["deepencoder"]["sam"]["block_0"]["attn"]["qkv"]["kernel"]
    after = new_state.params["deepencoder"]["sam"]["block_0"]["attn"]["qkv"]["kernel"]
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))
    b_q = params["vat_lidar"]["queries"]
    a_q = new_state.params["vat_lidar"]["queries"]
    assert np.abs(np.asarray(a_q) - np.asarray(b_q)).max() > 0
    # llm base frozen, lora moves
    np.testing.assert_array_equal(
        np.asarray(params["llm"]["layer_0"]["attn"]["q_proj"]["kernel"]),
        np.asarray(new_state.params["llm"]["layer_0"]["attn"]["q_proj"]["kernel"]))


def test_dp_step_multidevice():
    """4-way DP over the virtual mesh: two steps reduce loss deterministically."""
    cfg, batch = _tiny_batch(b=4)
    model = VQAModel(cfg.model)
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    tx, _ = make_optimizer(cfg.train.optim, params, total_steps=10)
    mesh = make_mesh(MeshConfig(data=4, model=2))
    params = shard_params(params, mesh)
    step = make_train_step(model, tx, mesh, donate=False)
    state = create_state(params, tx, jax.random.PRNGKey(1))
    sb = shard_batch(batch, mesh)
    state1, m1 = step(state, sb)
    state2, m2 = step(state1, sb)
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    # same batch twice with lr>0 must change loss
    assert float(m1["loss"]) != float(m2["loss"])


def test_count_by_group_sane():
    cfg, batch = _tiny_batch(b=2)
    model = VQAModel(cfg.model, llm_lora_rank=2)
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    counts = count_by_group(params)
    assert counts["frozen"] > counts["llm_lora"] > 0
    assert counts["vat_lidar"] > 0 and counts["vat_vision"] > 0


def test_dp_matches_single_device():
    """GSPMD semantics are global: the DP(4)xTP(2) step must produce the
    SAME numbers as the single-device step — the strongest cheap
    correctness claim about the sharded path without real hardware."""
    cfg, batch = _tiny_batch(b=4)
    model = VQAModel(cfg.model)
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    tx, _ = make_optimizer(cfg.train.optim, params, total_steps=10)

    results = []
    for mesh_cfg, n_dev in ((MeshConfig(data=4, model=2), 8),
                            (MeshConfig(data=1, model=1), 1)):
        mesh = make_mesh(mesh_cfg, devices=jax.devices()[:n_dev])
        p = shard_params(params, mesh)
        step = make_train_step(model, tx, mesh, donate=False)
        state = create_state(p, tx, jax.random.PRNGKey(1))
        state, metrics = step(state, shard_batch(batch, mesh))
        q = np.asarray(state.params["vat_lidar"]["queries"])
        results.append((float(metrics["loss"]), q))
    (loss_dp, q_dp), (loss_1, q_1) = results
    np.testing.assert_allclose(loss_dp, loss_1, rtol=2e-5)
    np.testing.assert_allclose(q_dp, q_1, rtol=2e-4, atol=2e-6)


def test_sharded_checkpoint_roundtrip(tmp_path):
    """Checkpoint save -> restore UNDER A SHARDED MESH: params written from
    a 4x2-sharded state must restore bit-identically into sharded targets
    and keep training."""
    from lvv_tpu.train.checkpoints import CheckpointManager

    cfg, batch = _tiny_batch(b=4)
    model = VQAModel(cfg.model)
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    tx, _ = make_optimizer(cfg.train.optim, params, total_steps=10)
    mesh = make_mesh(MeshConfig(data=4, model=2))
    params = shard_params(params, mesh)
    step = make_train_step(model, tx, mesh, donate=False)
    state = create_state(params, tx, jax.random.PRNGKey(1))
    sb = shard_batch(batch, mesh)
    state, _ = step(state, sb)

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(state, step=1)
    restored = mgr.restore(mgr.latest(), state)

    flat_a = jax.tree_util.tree_leaves(state.params)
    flat_b = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the restored state keeps stepping on the mesh and matches the
    # original trajectory exactly
    s_a, m_a = step(state, sb)
    s_b, m_b = step(restored, sb)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-6)
