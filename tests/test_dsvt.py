"""True-DSVT tests: window coords, rotated-set partition contract,
block/backbone forward (reference dsvt.py get_window_coors /
get_set_single_shift / DSVTBlock scheduling)."""
import pytest  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

from lvv_tpu.models.dsvt import (DSVTBackbone, DSVTBlock,
                                 rotated_set_partition, window_coords)
from lvv_tpu.ops.sparse import delinearize, from_voxels


def _sparse(rng, grid=(16, 16, 4), n=40, c=8, cap=64):
    nx, ny, nz = grid
    lin = rng.choice(nx * ny * nz, size=n, replace=False)
    z, y, x = lin // (nx * ny), (lin // nx) % ny, lin % nx
    coords = np.full((cap, 3), -1, np.int32)
    coords[:n] = np.stack([z, y, x], 1)
    feats = np.zeros((cap, c), np.float32)
    feats[:n] = rng.normal(size=(n, c))
    return from_voxels(jnp.asarray(coords), jnp.asarray(feats), grid)


def test_window_coords_grouping_and_shift(rng):
    st = _sparse(rng)
    wid, inner = window_coords(st, (4, 4, 4), shift=False)
    wid = np.asarray(wid)
    coords = np.asarray(delinearize(st.ids, st.grid))
    valid = np.asarray(st.valid)
    for i in np.nonzero(valid)[0]:
        for j in np.nonzero(valid)[0]:
            same = (coords[i] // 4 == coords[j] // 4).all()
            assert (wid[i] == wid[j]) == same
    # in-window coords stay within the window
    inner = np.asarray(inner)[valid]
    assert inner.min() >= 0 and (inner < 4).all()
    # half-window shift regroups at least one straddling pair
    wid_s, inner_s = window_coords(st, (4, 4, 4), shift=True)
    assert not np.array_equal(np.asarray(wid_s)[valid], wid[valid])


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_rotated_set_partition_contract(rng):
    st = _sparse(rng)
    wid, inner = window_coords(st, (4, 4, 4), shift=False)
    valid = st.valid
    max_sets = 64
    rows = {}
    for axis in ("y", "x"):
        row, col, ok = rotated_set_partition(wid, inner, valid, (4, 4, 4),
                                             set_size=4, max_sets=max_sets,
                                             axis=axis)
        row, col, okn = np.asarray(row), np.asarray(col), np.asarray(ok)
        v = np.asarray(valid)
        assert (okn == v).all()          # every valid voxel lands in a set
        # (row, col) pairs unique
        pairs = row[v] * 100 + col[v]
        assert len(set(pairs.tolist())) == v.sum()
        # all voxels in one set share a window
        widn = np.asarray(wid)
        for r in np.unique(row[v]):
            members = v & (row == r)
            assert len(set(widn[members].tolist())) == 1
        rows[axis] = (row, col)
    # the two axis partitions genuinely differ (rotated sets)
    same = (rows["y"][0] == rows["x"][0]) & (rows["y"][1] == rows["x"][1])
    assert not same[np.asarray(valid)].all()


def test_dsvt_block_preserves_structure(rng):
    st = _sparse(rng)
    blk = DSVTBlock(num_heads=2, window=(4, 4, 4), set_size=4, max_sets=64)
    params = blk.init(jax.random.PRNGKey(0), st)
    out = blk.apply(params, st)
    np.testing.assert_array_equal(np.asarray(out.ids), np.asarray(st.ids))
    inactive = ~np.asarray(st.valid)
    assert np.abs(np.asarray(out.features)[inactive]).max() == 0
    assert np.isfinite(np.asarray(out.features)).all()


def test_dsvt_backbone_forward_and_grad(rng):
    st = _sparse(rng)
    bb = DSVTBackbone(channels=16, num_blocks=2, num_heads=2,
                      window=(4, 4, 4), set_size=4)
    params = bb.init(jax.random.PRNGKey(0), st)
    out = bb.apply(params, st)
    assert out.features.shape == (64, 16)

    def loss(p):
        o = bb.apply(p, st)
        return jnp.sum(o.features.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(params)
    total = sum(float(jnp.sum(jnp.abs(l)))
                for l in jax.tree_util.tree_leaves(g))
    assert total > 0 and np.isfinite(total)


def test_plan_max_sets_prevents_overflow_drops():
    """Worst-case scattered cloud: one voxel per window needs one SET per
    window — far more than ceil(V/set_size). The planner must cover it and
    the backbone, given the planned capacity, must drop nothing."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from lvv_tpu.models.dsvt import (DSVTBackbone, plan_max_sets,
                                     rotated_set_partition, window_coords)
    from lvv_tpu.ops.sparse import SENTINEL, SparseTensor

    grid = (64, 64, 4)
    window = (4, 8, 8)
    set_size = 32
    # voxels on a sparse lattice: every occupied window holds exactly one
    rng = np.random.default_rng(0)
    xs = np.arange(0, 64, 8)
    ys = np.arange(0, 64, 8)
    coords = np.stack(np.meshgrid(ys, xs, indexing="ij"), -1).reshape(-1, 2)
    ids = (0 * (64 * 64) + coords[:, 0] * 64 + coords[:, 1]).astype(np.int64)
    v = len(ids)                                     # 64 voxels
    cap = 128
    ids_pad = np.full((cap,), SENTINEL, np.int64)
    ids_pad[:v] = ids
    feats = rng.normal(size=(cap, 8)).astype(np.float32)
    st = SparseTensor(jnp.asarray(ids_pad), jnp.asarray(feats), grid)

    naive = -(-cap // set_size) * 2                  # backbone default: 8
    planned = plan_max_sets(ids_pad, grid, window, set_size, bucket=1)
    assert planned >= v                              # one set per window
    assert planned > naive

    # with the planned capacity nothing is dropped in either partition
    for shift in (False, True):
        wid, inner = window_coords(st, window, shift)
        for axis in ("y", "x"):
            _, _, ok = rotated_set_partition(
                wid, inner, st.valid, window, set_size, planned, axis)
            assert int(jnp.sum(ok)) == v

    # and the backbone runs with the planned capacity
    bb = DSVTBackbone(channels=16, num_blocks=2, num_heads=2, window=window,
                      set_size=set_size, max_sets=planned)
    params = bb.init(jax.random.PRNGKey(0), st)
    out = bb.apply(params, st)
    assert np.all(np.isfinite(np.asarray(out.features)[:v]))


def test_dsvt_detector_forward_detect_and_train():
    """Registered DSVT assembly: voxelize -> rotated-set trunk -> BEV
    column-sum -> dense center head (reference waymo dsvt_pillar.yaml
    topology), trainable through the generic detector step."""
    import dataclasses
    import optax
    from lvv_tpu.config import tiny_config
    from lvv_tpu.models.registry import build_detector
    from lvv_tpu.train.detector import make_detector_train_step

    cfg = tiny_config()
    det_cfg = dataclasses.replace(
        cfg.model.voxelnext, dsvt_channels=16, dsvt_blocks=2,
        dsvt_heads=2, dsvt_window=(8, 4, 4), dsvt_set_size=8)
    det = build_detector("DSVT", det_cfg, cfg.voxelize)

    rng = np.random.default_rng(0)
    b, n = 1, 300
    pts = rng.uniform(-7.5, 7.5, (b, n, 4)).astype(np.float32)
    pts[..., 2] = rng.uniform(-2.5, 0.5, (b, n))
    points, npts = jnp.asarray(pts[0]), jnp.int32(n)
    params = det.init(jax.random.PRNGKey(0), points, npts)
    out = det.apply(params, points, npts)
    nx = int(round((cfg.voxelize.point_range[3]
                    - cfg.voxelize.point_range[0])
                   / cfg.voxelize.voxel_size[0]))
    assert out["preds"]["hm"].shape == (det_cfg.num_classes, nx, nx)
    assert np.isfinite(np.asarray(out["preds"]["hm"])).all()
    dets = det.apply(params, points, npts, method=type(det).detect)
    assert dets.boxes.shape[1] == 9
    assert np.isfinite(np.asarray(dets.boxes)).all()

    batch = {
        "points": jnp.asarray(pts),
        "num_points": jnp.full((b,), n, jnp.int32),
        "gt_boxes": jnp.asarray([[[0.0, 0, -1, 4, 2, 1.5, 0.3, 0, 0]]],
                                jnp.float32),
        "gt_labels": jnp.zeros((b, 1), jnp.int32),
        "gt_mask": jnp.ones((b, 1), bool),
    }
    tx = optax.adam(1e-3)
    step = make_detector_train_step(det, tx, det_cfg, cfg.voxelize)
    state = (params, tx.init(params["params"]))
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_zpool_attention_matches_torch_oracle(rng):
    """ZPoolAttention vs the reference Stage_ReductionAtt_Block semantics
    (pcdet dsvt.py:292-310): maxpool query, pos-embedded keys, one MHA,
    LN(attn + query), grouped by (z//stride, y, x)."""
    import pytest
    torch = pytest.importorskip("torch")
    import numpy as np
    from lvv_tpu.models.dsvt import ZPoolAttention
    from lvv_tpu.ops.sparse import SENTINEL, SparseTensor, delinearize

    nx, ny, nz, c, stride = 4, 3, 8, 16, 4
    r = np.random.default_rng(0)
    all_ids = r.permutation(nx * ny * nz)[:20]
    ids = np.sort(np.concatenate(
        [all_ids, np.full((6,), int(SENTINEL))]).astype(np.int64))
    ids = np.asarray(ids, np.int32)
    feats = r.normal(size=(ids.shape[0], c)).astype(np.float32)
    feats[ids == int(SENTINEL)] = 0
    st = SparseTensor(jnp.asarray(ids), jnp.asarray(feats), (nx, ny, nz))

    mod = ZPoolAttention(stride=stride, num_heads=4)
    params = mod.init(jax.random.PRNGKey(0), st)["params"]
    out = mod.apply({"params": params}, st)
    assert out.grid == (nx, ny, nz // stride)

    # torch oracle over the same groups with the converted weights
    tm = torch.nn.MultiheadAttention(c, 4, batch_first=True)
    p = params
    with torch.no_grad():
        wq = np.asarray(p["q_proj"]["kernel"]).T
        wk = np.asarray(p["k_proj"]["kernel"]).T
        wv = np.asarray(p["v_proj"]["kernel"]).T
        tm.in_proj_weight.copy_(torch.from_numpy(
            np.concatenate([wq, wk, wv], 0)))
        tm.in_proj_bias.copy_(torch.from_numpy(np.concatenate(
            [np.asarray(p[k]["bias"]) for k in
             ("q_proj", "k_proj", "v_proj")])))
        tm.out_proj.weight.copy_(torch.from_numpy(
            np.asarray(p["o_proj"]["kernel"]).T))
        tm.out_proj.bias.copy_(torch.from_numpy(
            np.asarray(p["o_proj"]["bias"])))
    ln_w = torch.from_numpy(np.asarray(p["norm"]["scale"]))
    ln_b = torch.from_numpy(np.asarray(p["norm"]["bias"]))
    pos = np.asarray(p["pos_embedding"])

    coords = np.asarray(delinearize(st.ids, st.grid))
    valid = ids != int(SENTINEL)
    groups = {}
    for i in np.nonzero(valid)[0]:
        z, y, x = coords[i]
        groups.setdefault((z // stride, y, x), []).append(i)
    got = np.asarray(out.features)
    got_ids = np.asarray(out.ids)
    for (zp, y, x), members in groups.items():
        lid = (zp * ny + y) * nx + x
        j = int(np.nonzero(got_ids == lid)[0][0])
        pre = np.zeros((stride, c), np.float32)
        mask = np.ones((stride,), bool)
        for i in members:
            pre[coords[i][0] % stride] = feats[i]
            mask[coords[i][0] % stride] = False
        q = np.where(mask[:, None], -np.inf, pre).max(0, initial=-np.inf)
        q = np.where(np.isfinite(q), q, 0.0)[None]
        key = pre + pos
        with torch.no_grad():
            o = tm(torch.from_numpy(q[None]),
                   torch.from_numpy(key[None]),
                   torch.from_numpy(pre[None]),
                   key_padding_mask=torch.from_numpy(mask[None]))[0]
            ref = torch.nn.functional.layer_norm(
                o[0] + torch.from_numpy(q), (c,), ln_w, ln_b).numpy()[0]
        np.testing.assert_allclose(got[j], ref, atol=2e-5, rtol=2e-5)


def test_dsvt_multistage_progressive_downsample(rng):
    """Stage topology: windows z 8 -> 2 -> 1 with strides [4, 2] must end
    on an nz==1 grid with finite grads (reference dsvt_voxel.yaml shape)."""
    from lvv_tpu.models.dsvt import DSVTBackbone
    from lvv_tpu.ops.sparse import SENTINEL, SparseTensor

    nx, ny, nz, cin = 8, 8, 8, 6
    r = np.random.default_rng(1)
    ids = np.sort(np.concatenate(
        [r.permutation(nx * ny * nz)[:40],
         np.full((8,), int(SENTINEL))]).astype(np.int64)).astype(np.int32)
    feats = r.normal(size=(ids.shape[0], cin)).astype(np.float32)
    feats[ids == int(SENTINEL)] = 0
    st = SparseTensor(jnp.asarray(ids), jnp.asarray(feats), (nx, ny, nz))

    bb = DSVTBackbone(channels=16, num_heads=2, set_size=8,
                      stage_blocks=(1, 1, 1),
                      stage_windows=((8, 4, 4), (2, 4, 4), (1, 4, 4)),
                      downsample=(4, 2))
    params = bb.init(jax.random.PRNGKey(0), st)
    out = bb.apply(params, st)
    assert out.grid == (nx, ny, 1)
    assert np.isfinite(np.asarray(out.features)).all()

    def loss(p):
        return jnp.sum(bb.apply(p, st).features ** 2)

    g = jax.grad(lambda p: loss(p))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
