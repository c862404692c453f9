"""Seed-hash functions for device-side (DEV_GID) seeding.

Parity with the predefined hashes of the reference's init kernel
(`src/cl_ops/rng/clo_rng_init.cl:27-38`): KNUTH (multiplicative, result masked
to 32 bits) and XS1 (xor-shift-multiply), plus identity when no hash is given.
The reference lets callers splice arbitrary OpenCL-C hash macros
(`clo_rng.c:101-128`); here a caller may pass any Python callable
u64 array -> u64 array instead.
"""

from __future__ import annotations

from typing import Callable, Optional, Union

import jax.numpy as jnp

from cl_ops_tpu.core.errors import BadArgsError


def knuth(x):
    """x = (x * 2654435761) % 2^32, computed in 64-bit like the OpenCL macro."""
    x = jnp.asarray(x, jnp.uint64)
    return (x * jnp.uint64(2654435761)) % jnp.uint64(0x100000000)


def xs1(x):
    """Three xor-shift-multiply rounds on the full 64-bit value."""
    x = jnp.asarray(x, jnp.uint64)
    x = ((x >> jnp.uint64(16)) ^ x) * jnp.uint64(0x45D9F3B)
    x = ((x >> jnp.uint64(16)) ^ x) * jnp.uint64(0x45D9F3B)
    x = (x >> jnp.uint64(16)) ^ x
    return x


_HASHES = {None: lambda x: x, "": lambda x: x, "knuth": knuth, "xs1": xs1}


def apply_hash(name_or_fn: Union[str, Callable, None], seeds):
    if callable(name_or_fn):
        return name_or_fn(seeds)
    try:
        fn = _HASHES[name_or_fn]
    except KeyError:
        raise BadArgsError(
            f"unknown seed hash {name_or_fn!r}; known: knuth, xs1") from None
    return fn(seeds)
