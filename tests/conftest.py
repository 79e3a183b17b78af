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
if "xla_cpu_multi_thread_eigen" not in flags:
    # deterministic CPU reductions: under machine load, Eigen's threaded
    # GEMM can flip low-order bits between identical runs, which flips a
    # near-tie sampled token and breaks the seed-reproducibility tests
    # (observed as a rare test_seeded_sampling_deterministic flake).
    # TPU execution is deterministic; this only pins the CPU test mesh.
    flags = (flags + " --xla_cpu_multi_thread_eigen=false").strip()
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The TPU plugin in this image force-prepends its platform to
# jax_platforms at import time, ignoring the env var — override the
# config directly (backends initialize lazily, so this wins).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
