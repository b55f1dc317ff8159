"""Small shared helpers (reference training/utils/helpers.py:10-30)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def seed_all(seed: int) -> jax.Array:
    """Seed numpy (host-side data path) and return the root JAX PRNG key.

    JAX is functionally random so, unlike the reference's global
    torch/cuda seeding (helpers.py:10-15, common_utils.py:120-135), the key
    is threaded explicitly; numpy still needs global seeding for samplers.
    """
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def count_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "shape"))


def tree_bytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "dtype"))


def param_summary(params, name: str = "params") -> str:
    n = count_params(params)
    return f"{name}: {n:,} params ({tree_bytes(params) / 1e6:.1f} MB)"


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def astype_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree)


def enable_compile_cache(path: str | None = None) -> bool:
    """Turn on JAX's persistent compilation cache.

    Full-model TPU compiles take 6-10 min through the axon relay
    (ROUND_NOTES); with the cache a FRESH PROCESS reuses prior
    compilations, so bench/serving cold starts drop to seconds. Safe
    no-op when the backend doesn't support serialization (returns False).
    Opt out with LVV_COMPILE_CACHE=0.
    """
    import os
    if os.environ.get("LVV_COMPILE_CACHE", "1") != "1":
        return False
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                  "/tmp/lvv_jax_cache")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        try:
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except Exception:
            pass  # knob name varies across jax versions
    except Exception:
        return False
    return True
