"""Segment-op tests (ingroup_inds parity with the reference CUDA extension's
contract: per-group running indices, pcdet/ops/ingroup_inds)."""
import jax.numpy as jnp
import numpy as np

from lvv_tpu.ops.segment import (ingroup_inds, run_ranks_sorted, segment_mean,
                                 segment_sum, unique_with_inverse)


def test_run_ranks_sorted():
    ids = jnp.asarray([3, 3, 3, 7, 7, 9])
    assert np.asarray(run_ranks_sorted(ids)).tolist() == [0, 1, 2, 0, 1, 0]


def test_ingroup_inds_unsorted():
    ids = jnp.asarray([5, 2, 5, 2, 2, 9, 5])
    out = np.asarray(ingroup_inds(ids))
    # within each group, indices are 0..count-1 assigned in input order
    for g in [5, 2, 9]:
        got = out[np.asarray(ids) == g]
        assert sorted(got.tolist()) == list(range(len(got)))
        assert got.tolist() == sorted(got.tolist())  # stable: input order


def test_ingroup_inds_valid_mask():
    ids = jnp.asarray([1, 1, 1, 1])
    valid = jnp.asarray([True, False, True, True])
    out = np.asarray(ingroup_inds(ids, valid))
    assert out.tolist() == [0, -1, 1, 2]


def test_segment_mean():
    data = jnp.asarray([[1.0], [3.0], [10.0]])
    ids = jnp.asarray([0, 0, 2])
    out = np.asarray(segment_mean(data, ids, 3))
    np.testing.assert_allclose(out[:, 0], [2.0, 0.0, 10.0])


def test_unique_with_inverse():
    ids = jnp.asarray([7, 3, 7, 3, 3, 2147483647, 9])
    fill = 2147483647
    uids, inv, counts, nu = unique_with_inverse(ids, fill, max_unique=8)
    assert int(nu) == 3
    uids = np.asarray(uids)
    assert uids[:3].tolist() == [3, 7, 9]
    counts = np.asarray(counts)
    assert counts[:3].tolist() == [3, 2, 1]
    assert counts[3:].sum() == 0
    inv = np.asarray(inv)
    for i, v in enumerate(np.asarray(ids)):
        if v != fill:
            assert uids[inv[i]] == v


def test_unique_overflow_capacity():
    ids = jnp.asarray([1, 2, 3, 4, 5])
    uids, inv, counts, nu = unique_with_inverse(ids, 2147483647, max_unique=3)
    # ids beyond capacity land in the overflow slot (max_unique-1)
    assert int(nu) == 5  # true count reported even when truncated
    assert np.asarray(uids)[:2].tolist() == [1, 2]
