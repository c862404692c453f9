"""Platform detection helpers.

The reference selects an OpenCL device at runtime (interactive menu,
`src/benchmarks/clo_sort_bench.c:148-149`); here the analogous decision is
whether Pallas kernels run compiled (TPU) or interpreted (CPU tests — the
framework's "any device" portability story, matching the reference's tests
running on any OpenCL device, `src/tests/test_rng.c:65`).
"""

from __future__ import annotations

import functools

import jax


@functools.cache
def backend() -> str:
    return jax.default_backend()


@functools.cache
def on_tpu() -> bool:
    """True when the default backend is a TPU (incl. tunneled 'axon' chips)."""
    try:
        return jax.devices()[0].platform.startswith("tpu")
    except Exception:
        return False


def pallas_interpret() -> bool:
    """Whether pallas_call must run in interpret mode (non-TPU backends)."""
    return not on_tpu()


def honor_env_platform() -> None:
    """Re-apply JAX_PLATFORMS after plugin overrides.

    The tunneled-TPU plugin rewrites jax_platforms to "axon,cpu" at import
    time; a user who explicitly set JAX_PLATFORMS=cpu (e.g. CLI smoke tests)
    still means it. Call before the first computation.
    """
    import os
    want = os.environ.get("JAX_PLATFORMS")
    if want and "axon" not in want:
        jax.config.update("jax_platforms", want)
        backend.cache_clear()
        on_tpu.cache_clear()
