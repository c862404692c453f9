"""Join: fact-table probe against a keyed build side.

North-star operator (BASELINE.json: "Distributed hash join: 1B-row fact x
100M-row dim"). No referent in the reference library. Single-chip strategy
is sort + merge-join probe (TPU has no efficient random VMEM scatter, so
classic linear-probing tables lose to sorted probes); the distributed
strategy hash-partitions both sides over the mesh with all_to_all so each
chip joins only its partition (parallel/ layer).

v1 semantics: inner equi-join where build keys are unique (the dimension-
table case). Probe rows with no match are flagged, not emitted.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cl_ops_tpu.ops.exec import psort
from cl_ops_tpu.ops.sort import keys as keymod


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def _probe_sorted(build_keys_sorted, build_vals_sorted, probe_keys,
                  use_pallas: bool = True):
    """Merge-join probe: sorts instead of per-probe binary search.

    jnp.searchsorted costs ~log2(nb) rounds of random 16M-gathers on TPU
    (~3.4 s for the 16M x 1M config); merging the two sorted relations
    and counting dims-before-probe by position needs only sorts, a prefix
    rank, and two monotone gathers (~10x faster).

    Steps: sort (key, tag) with dims tagged 0 so equal keys place the dim
    before the probe; a probe's merged position minus its rank among
    probes = number of dims <= its key, whose predecessor is the matching
    dim for unique build keys. Results return to original probe order by
    one more sort on the carried source index.

    The Pallas path (default) runs all three sorts through the flagship
    fused bitonic, packing (tag, src) into `tag*m + src` and
    (src, found) into `src*2 + found` so every sort is two i32 columns
    with a unique leading key. Falls back to `jax.lax.sort` for 64-bit
    keys / values or n >= 2^30.
    """
    nb = build_keys_sorted.shape[0]
    m = probe_keys.shape[0]
    nt = nb + m
    pallas_ok = (use_pallas and 2 * nt < 2 ** 31
                 and keymod.num_limbs(build_keys_sorted.dtype) == 1
                 and jnp.dtype(build_vals_sorted.dtype).itemsize == 4)
    if pallas_ok:
        bl = keymod.to_limbs(build_keys_sorted)[0]
        plimb = keymod.to_limbs(probe_keys)[0]
        limb = jnp.concatenate([bl, plimb])
        # merged id: dims 0, probes m + src — sorts dims first among equal
        # keys and carries the probe source index in one column
        merged = jnp.concatenate([
            jnp.zeros((nb,), jnp.int32),
            jnp.int32(m) + jax.lax.broadcasted_iota(jnp.int32, (m,), 0)])
        slimb, smerged = psort.sort_i32_cols((limb, merged))
        st_probe = (smerged >= m).astype(jnp.int32)
        # compact probe rows to the front, merged order preserved
        comb = psort.flag_pos_key(jnp.int32(1) - st_probe, nt)
        scomb, smerged2 = psort.sort_i32_cols((comb, smerged))
        probe_pos = scomb[:m]          # == merged position for probes
        probe_src = smerged2[:m] - jnp.int32(m)
        rank = jax.lax.broadcasted_iota(jnp.int32, (m,), 0)
        dims_before = probe_pos - rank  # count of dims with key <= probe
        idx = jnp.clip(dims_before - 1, 0, nb - 1)
        pk_sorted = jnp.take(slimb, probe_pos)   # monotone gather
        found_s = (jnp.take(bl, idx) == pk_sorted) & (dims_before > 0)
        val_s = jnp.take(psort.as_i32(build_vals_sorted), idx)
        # back to original probe order; found rides the low bit of the key
        key3 = probe_src * 2 + found_s.astype(jnp.int32)
        skey3, sval = psort.sort_i32_cols((key3, val_s))
        return ((skey3 & 1) > 0,
                psort.from_i32(sval, build_vals_sorted.dtype))

    keys = jnp.concatenate([build_keys_sorted, probe_keys])
    tag = jnp.concatenate([jnp.zeros((nb,), jnp.int32),
                           jnp.ones((m,), jnp.int32)])
    srcs = jnp.concatenate([
        jnp.zeros((nb,), jnp.int32),
        jax.lax.broadcasted_iota(jnp.int32, (m,), 0)])
    sk, st, ssrc = jax.lax.sort([keys, tag, srcs], num_keys=2)
    pos = jax.lax.broadcasted_iota(jnp.int32, (nb + m,), 0)
    # compact the probe rows to the front, merged order preserved
    _, probe_pos, probe_src = jax.lax.sort(
        [1 - st, pos, ssrc], num_keys=1, is_stable=True)
    probe_pos = probe_pos[:m]
    probe_src = probe_src[:m]
    rank = jax.lax.broadcasted_iota(jnp.int32, (m,), 0)
    dims_before = probe_pos - rank          # count of dims with key <= probe
    idx = jnp.clip(dims_before - 1, 0, nb - 1)
    pk_sorted = jnp.take(sk, probe_pos)     # monotone gather
    found_s = (jnp.take(build_keys_sorted, idx) == pk_sorted) \
        & (dims_before > 0)
    val_s = jnp.take(build_vals_sorted, idx)  # monotone gather
    # back to original probe order
    _, found, vals = jax.lax.sort(
        [probe_src, found_s.astype(jnp.int32), val_s], num_keys=1)
    return found > 0, vals


@functools.lru_cache(maxsize=None)
def _default_build_sorter(dtype, use_pallas: bool):
    from cl_ops_tpu.ops.sort import sort_new
    name = "abitonic" if (use_pallas
                          and jnp.dtype(dtype).itemsize == 4) else "xla"
    return sort_new(name, elem_dtype=dtype)


def hash_join(build_keys, build_vals, probe_keys, *, build_sorted=False,
              sorter=None, use_pallas: bool = True):
    """Inner join probe: for each probe key, the matching build value.

    Args:
      build_keys: unique keys of the build (dimension) side.
      build_vals: values carried per build key.
      probe_keys: fact-side keys to look up.
      build_sorted: set True when build_keys are already ascending.
      sorter: registry Sorter for the build side (defaults to the Pallas
        "abitonic" for 4-byte keys, else "xla").
      use_pallas: run the probe sorts through the Pallas bitonic.

    Returns:
      (found, vals): bool mask of matches and the joined values
      (undefined where not found).
    """
    if not build_sorted:
        if sorter is None:
            sorter = _default_build_sorter(jnp.dtype(build_keys.dtype).name,
                                           use_pallas)
        build_keys, build_vals = sorter.sort_with_device_data(
            build_keys, build_vals)
    return _probe_sorted(build_keys, build_vals, probe_keys,
                         use_pallas=use_pallas)


@functools.partial(jax.jit, static_argnames=("table_bits",))
def hash_u32(keys, table_bits: int):
    """Multiplicative hash of u32/i32 keys into [0, 2^table_bits).

    The partition hash for the distributed shuffle (Fibonacci constant).
    """
    k = keys.astype(jnp.uint32)
    return ((k * jnp.uint32(2654435769)) >> jnp.uint32(32 - table_bits)
            ).astype(jnp.int32)
