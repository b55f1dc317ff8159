"""Test harness: force an 8-device virtual CPU platform before JAX import.

Mirrors the reference's device-free distributed tests
(src/encoder-decoder/training-test/test_distributed.py:31-60, which patch
torch.distributed instead of needing a cluster): we get 8 XLA host devices so
mesh/pjit/shard_map paths are exercised for real, on CPU, with tiny shapes.
"""
import os

# The sandbox exports JAX_PLATFORMS=axon (the tunneled TPU); tests must run
# on the virtual CPU mesh, so force-override rather than setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize imports jax at interpreter start; the backend is
# still uninitialized at that point, so overriding the platform here works.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
assert len(jax.devices()) == 8, (
    "expected 8 virtual CPU devices; axon sitecustomize may have "
    "initialized the TPU backend first")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
