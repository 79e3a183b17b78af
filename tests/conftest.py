"""Test configuration: run on an 8-device virtual CPU mesh.

The reference tests multi-device behavior over TVM RPC to phones
(/root/reference/tests/debug/compare_lib.py:94-112); our analog is JAX's
host-platform device-count simulation, so sharding/collective tests run
anywhere (SURVEY.md §4).
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the TPU
# platform, but the test suite runs on a virtual 8-device CPU mesh.
# TPU-only tests (Pallas compiled-mode) are run explicitly via bench.py.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The TPU plugin in this image force-prepends its platform to
# jax_platforms at import time, ignoring the env var — override the
# config directly (backends initialize lazily, so this wins).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# Disable the persistent compilation cache for the CPU suite: it is
# shared across sessions/machines, XLA:CPU AOT results are
# machine-feature-dependent ("Machine type ... doesn't match" loader
# errors), and a loaded-vs-freshly-compiled executable can differ in
# low-order float bits — which flips near-tie sampled tokens and made
# the seed-determinism test flake. The cache exists for the slow
# tunneled TPU compiles (mlc_llm_tpu/__init__.py), not for CPU tests.
jax.config.update("jax_enable_compilation_cache", False)

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_sharding_globals():
    """shard_params flips process-wide routing state (sharded_params +
    current_mesh). Reset after every test so a sharding test can't leak
    kernel-routing decisions into unrelated tests."""
    yield
    from mlc_llm_tpu import ops

    ops.set_sharded_params(False)
    ops.set_current_mesh(None)
