"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is only used by bench.py; tests must be runnable anywhere
(the reference's tests likewise ran on "any OpenCL device",
`src/tests/test_rng.c:65`). x64 is enabled because the framework supports
long/ulong/double element types like the reference's CloType table
(`src/cl_ops/common/clo_common.c:54-68`).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
