"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is only used by bench.py; tests must be runnable anywhere
(the reference's tests likewise ran on "any OpenCL device",
`src/tests/test_rng.c:65`). x64 is enabled because the framework supports
long/ulong/double element types like the reference's CloType table
(`src/cl_ops/common/clo_common.c:54-68`).
"""

import os

# Force CPU even when the environment points JAX at a tunneled TPU
# (JAX_PLATFORMS=axon): tests must not contend for the bench chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The tunneled-TPU plugin rewrites jax_platforms to "axon,cpu" at import time,
# overriding the env var — force CPU again post-import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Never write the persistent compile cache from tests: in-process bench-CLI
# tests (test_bench_cli.py) set jax_compilation_cache_dir for the TPU use
# case, and serializing a CPU shard_map+Pallas executable for that cache
# segfaults jaxlib 0.9 (observed: put_executable_and_time ->
# executable.serialize() SIGSEGV). Disabling the cache master switch here
# keeps later config updates inert for the whole suite.
jax.config.update("jax_enable_compilation_cache", False)
