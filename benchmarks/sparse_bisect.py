#!/usr/bin/env python
"""Floor-proof bisect of the sparse detector forward's primitive costs.

detector_train_micro measured the half-scale VoxelNeXt forward at ~690 ms
— far above any FLOP roofline. This times the candidate culprits in
isolation (in-jit fori_loop, floor-subtracted): the voxelizer, from_voxels
argsort, one subm conv (60k cap), one strided sparse conv (60k cap, whose
unique_with_inverse sorts 27*V ids), and the raw XLA sort at both sizes.

Writes benchmarks/sparse_bisect.json (ms, floor-corrected).
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

K = 32
CAP = 60_000
NPTS = 120_000


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from lvv_tpu.ops.sparse import (build_subm_rulebook, from_voxels,
                                    sparse_conv, submanifold_conv)
    from lvv_tpu.ops.segment import unique_with_inverse
    from lvv_tpu.ops.voxelize import VoxelGrid, voxelize_mean

    rng = np.random.default_rng(0)
    results = {}
    outp = pathlib.Path(__file__).parent / "sparse_bisect.json"

    def timed(fn, *xs, iters=5, warmup=2):
        for _ in range(warmup):
            float(fn(*xs))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(fn(*xs))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    def loop(f, k=K):
        def body(x):
            out = f(x)
            leaves = [l for l in jax.tree_util.tree_leaves(out)
                      if hasattr(l, "astype")]
            eps = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return x + (eps * 1e-24).astype(x.dtype)
        return jax.jit(lambda x: jnp.sum(
            lax.fori_loop(0, k, lambda _, h: body(h), x)
            .astype(jnp.float32)))

    def floor_for(x, k=K):
        return timed(jax.jit(lambda h: jnp.sum(
            lax.fori_loop(0, k, lambda _, hh: hh, h).astype(jnp.float32))),
            x)

    def rec(name, secs, floor, k=K):
        results[name] = round((secs - floor) / k * 1e3, 3)
        outp.write_text(json.dumps(results, indent=1))
        print(f"{name}: {results[name]:.3f} ms", flush=True)

    grid = VoxelGrid.create((-54., -54., -5., 54., 54., 3.),
                            (0.15, 0.15, 0.2))
    pts = rng.uniform(-54, 54, (NPTS, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-5, 3, NPTS)
    pts[:, 3] = rng.uniform(0, 1, NPTS)
    pts = jnp.asarray(pts)

    # 1. voxelizer (sort+unique over 120k point ids + segment means)
    fl = floor_for(pts)
    results["floor_ms"] = round(fl / K * 1e3, 3)
    f_vox = lambda p: voxelize_mean(p, jnp.asarray(NPTS), grid, CAP)
    rec("voxelize_mean_120k", timed(loop(f_vox), pts), fl)

    vox = jax.jit(f_vox)(pts)
    coords, feats = vox.coords, vox.features
    g = grid.grid_size
    st = jax.jit(lambda c, f: from_voxels(c, f, g))(coords, feats)
    # re-pin the grid as static python ints (NamedTuple fields that cross a
    # jit boundary come back as traced arrays)
    from lvv_tpu.ops.sparse import SparseTensor
    st = SparseTensor(st.ids, st.features, tuple(int(x) for x in g))
    fx = jax.device_put(st.features)

    # id computations must DEPEND on the loop carry or XLA hoists the
    # sorts/searches out of the timing loop (they are functions of the
    # static ids alone): thread a zero-valued int derived from the carry
    def dep(f):
        z = (f.ravel()[0] * 0).astype(jnp.int32)
        return st._replace(ids=st.ids + z, features=f)

    # 2. from_voxels (argsort over 60k ids)
    f_fv = lambda f: from_voxels(
        coords + (f.ravel()[0] * 0).astype(jnp.int32), f, g)
    flf = floor_for(fx)
    rec("from_voxels_60k", timed(loop(f_fv), fx), flf)

    # 3. one subm conv 16ch at 60k cap (+ rulebook build)
    w16 = jnp.asarray(rng.normal(size=(27, 4, 16)).astype(np.float32)) * .1
    f_subm = lambda f: submanifold_conv(dep(f), w16).features
    rec("subm_conv_60k_4to16", timed(loop(f_subm), fx), flf)

    # 3b. rulebook build alone
    f_rb = lambda f: build_subm_rulebook(dep(f))[0]
    rec("rulebook_build_60k", timed(loop(f_rb), fx), flf)

    # 4. one strided sparse conv 16ch (unique over 27*60k ids)
    f_sc = lambda f: sparse_conv(dep(f), w16,
                                 out_capacity=CAP).features
    rec("strided_conv_60k_4to16", timed(loop(f_sc), fx), flf)

    # 5. unique_with_inverse on 27*60k ids
    big_ids = jnp.asarray(
        rng.integers(0, 2 ** 26, 27 * CAP).astype(np.int32))
    flb = floor_for(big_ids, 8)
    f_uq = lambda i: unique_with_inverse(i, 2 ** 30, max_unique=CAP)[0]
    rec("unique_1p6M", timed(loop(f_uq, 8), big_ids), flb, 8)

    # 6. raw sort at both sizes
    f_s1 = lambda i: jnp.sort(i)
    rec("sort_1p6M", timed(loop(f_s1, 8), big_ids), flb, 8)
    small_ids = jnp.asarray(rng.integers(0, 2 ** 26, CAP).astype(np.int32))
    fls = floor_for(small_ids)
    rec("sort_60k", timed(loop(f_s1), small_ids), fls)


if __name__ == "__main__":
    main()
