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

# ---------------------------------------------------------------------------
# Tiered suite: every test is `fast` unless its file (or an explicit marker)
# says `slow`. `pytest -m fast` is the smoke tier — it finishes in ~5 min on
# one CPU core (the full 500+-test suite cannot run whole on a small host).
# The file classification comes from a measured per-file timing sweep
# (tests/FILE_TIMINGS.json, tools/time_test_files.py); re-run the sweep when
# adding heavyweight files.
# ---------------------------------------------------------------------------
FAST_FILES = set()
_timings = os.path.join(os.path.dirname(__file__), "FILE_TIMINGS.json")
if os.path.exists(_timings):
    import json as _json
    with open(_timings) as _f:
        FAST_FILES = {k for k, v in _json.load(_f).items()
                      if v.get("tier") == "fast"}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        if item.get_closest_marker("fast"):
            # explicit fast marker overrides a slow FILE classification:
            # heavyweight files cherry-pick one cheap smoke test into the
            # `-m fast` tier so every subsystem keeps smoke coverage
            continue
        # conservative default: a file is only in the fast tier if the
        # timing sweep MEASURED it fast — unmeasured files are slow until
        # swept (tools/time_test_files.py), so an unswept heavyweight file
        # can never silently blow the <5 min smoke budget
        if fname in FAST_FILES and not item.get_closest_marker("slow"):
            item.add_marker(pytest.mark.fast)
        else:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
