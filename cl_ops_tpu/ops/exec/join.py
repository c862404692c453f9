"""Join: fact-table probe against a keyed build side.

North-star operator (BASELINE.json: "Distributed hash join: 1B-row fact x
100M-row dim"). No referent in the reference library. Single-chip strategy
is sort + vectorized binary-search probe (TPU has no efficient random
VMEM scatter, so classic linear-probing tables lose to sorted probes); the
distributed strategy hash-partitions both sides over the mesh with
all_to_all so each chip joins only its partition (parallel/ layer).

v1 semantics: inner equi-join where build keys are unique (the dimension-
table case). Probe rows with no match are flagged, not emitted.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.jit
def _probe_sorted(build_keys_sorted, build_vals_sorted, probe_keys):
    idx = jnp.searchsorted(build_keys_sorted, probe_keys)
    idx = jnp.minimum(idx, build_keys_sorted.shape[0] - 1)
    found = jnp.take(build_keys_sorted, idx) == probe_keys
    vals = jnp.take(build_vals_sorted, idx)
    return found, vals


def hash_join(build_keys, build_vals, probe_keys, *, build_sorted=False,
              sorter=None):
    """Inner join probe: for each probe key, the matching build value.

    Args:
      build_keys: unique keys of the build (dimension) side.
      build_vals: values carried per build key.
      probe_keys: fact-side keys to look up.
      build_sorted: set True when build_keys are already ascending.
      sorter: registry Sorter for the build side (default "xla").

    Returns:
      (found, vals): bool mask of matches and the joined values
      (undefined where not found).
    """
    if not build_sorted:
        from cl_ops_tpu.ops.sort import sort_new
        if sorter is None:
            sorter = sort_new("xla", elem_dtype=build_keys.dtype)
        build_keys, build_vals = sorter.sort_with_device_data(
            build_keys, build_vals)
    return _probe_sorted(build_keys, build_vals, probe_keys)


@functools.partial(jax.jit, static_argnames=("table_bits",))
def hash_u32(keys, table_bits: int):
    """Multiplicative hash of u32/i32 keys into [0, 2^table_bits).

    The partition hash for the distributed shuffle (Fibonacci constant).
    """
    k = keys.astype(jnp.uint32)
    return ((k * jnp.uint32(2654435769)) >> jnp.uint32(32 - table_bits)
            ).astype(jnp.int32)
