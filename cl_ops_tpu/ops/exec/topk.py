"""ORDER BY ... LIMIT k (top-k) and SELECT DISTINCT.

North-star query operators. No referent in the reference library; they
compose the framework's primitives (psort stable partition, filter
compaction, boundary reduce) the way satradix composes its scan
(`clo_sort_satradix.c:296-300`).

top_k, TPU-first: a full sort moves every row through O(log^2) bitonic
passes, but LIMIT k with k << n only needs the k extreme rows. So:

  1. estimate a threshold t from a strided sample (the (safety*k/n)-th
     sample quantile) — one tiny sort;
  2. ONE filter_compact pass keeps rows <= t (a stable partition through
     the Pallas bitonic — 2 HBM sweeps, the dominant cost);
  3. sort only the first `cap` survivor slots (a static buffer, one small
     sort) and slice k.

The sampled threshold can miss (fewer than k survivors, or more than the
static buffer holds — adversarial duplicates/skew); a lax.cond then routes
to the exact full-sort branch, so the result is exact for EVERY input and
the whole operator stays jittable: no host sync, unlike a retry loop.
Survivor overshoot beyond `cap` only triggers the fallback, never a wrong
answer: with count >= k every dropped row exceeds t >= the k-th value.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cl_ops_tpu.ops.exec import psort
from cl_ops_tpu.ops.sort import keys as keymod
from cl_ops_tpu.utils.bits import nlpo2


def _sort_cols(cols, use_pallas, num_keys=None, pad_safe=False):
    if use_pallas:
        return psort.sort_i32_cols(cols, num_keys=num_keys,
                                   pad_safe=pad_safe)
    return tuple(jax.lax.sort(list(cols),
                              num_keys=num_keys or len(cols)))


@functools.partial(jax.jit, static_argnames=(
    "k", "largest", "use_pallas", "oversample", "cap", "sample_size"))
def top_k(values, k: int, *payload_cols, largest: bool = False,
          use_pallas: bool = True, oversample: int = 4,
          cap: int | None = None, sample_size: int = 16384):
    """The k extreme rows of `values`, sorted, with payload columns.

    Args:
      values: 1-D column (any normalizable dtype).
      k: static LIMIT.
      *payload_cols: same-length columns returned alongside (SELECT cols).
      largest: False (default) returns the k smallest ascending (ORDER BY
        v LIMIT k); True the k largest descending (ORDER BY v DESC).
      use_pallas: False uses lax.sort everywhere (vendor baseline).
      oversample: threshold-quantile safety factor; higher = fewer exact
        fallbacks, more survivors to small-sort.
      cap: static survivor-buffer length (default next_pow2(4*oversample*k),
        min 8192). count > cap routes to the exact fallback.
      sample_size: strided threshold sample length.

    Returns:
      (top_values, *top_payloads), each length k. Exact for every input.
      Ties broken by input position (stable).
    """
    n = values.shape[0]
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    kl = keymod.to_limbs(values)
    if largest:
        kl = [jnp.int32(-1) ^ c for c in kl]  # bitwise NOT reverses order
    pos = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    enc, spec = psort.cols_to_i32(tuple(payload_cols))

    def take_k(sorted_limbs_and_rest):
        vl = [c[:k] for c in sorted_limbs_and_rest[:len(kl)]]
        if largest:
            vl = [jnp.int32(-1) ^ c for c in vl]
        out_vals = keymod.from_limbs(vl, values.dtype)
        rest = sorted_limbs_and_rest[len(kl) + 1:]  # skip pos column
        return (out_vals, *psort.cols_from_i32([c[:k] for c in rest], spec))

    if k >= n or len(kl) > 1 or n <= max(4 * k, sample_size):
        # Small n, k ~ n, or multi-limb keys (a one-limb threshold cannot
        # cut multi-limb order exactly): exact full sort. (key, pos) is a
        # unique prefix, so payloads skip the comparator.
        out = _sort_cols((*kl, pos, *enc), use_pallas,
                         num_keys=len(kl) + 1, pad_safe=True)
        return take_k(out)

    limb = kl[0]
    # --- threshold from a strided sample quantile --------------------------
    m = min(sample_size, n)
    stride = n // m
    sample = limb[:: stride][:m]
    ssorted = jax.lax.sort([sample], num_keys=1)[0]
    j = min(m - 1, (m * k * oversample) // n + 1)
    t = ssorted[j]

    if cap is None:
        cap = max(nlpo2(4 * oversample * k), 8192)
    cap = min(cap, n)

    # --- one partition pass: survivors (limb <= t) to the front ------------
    keep = (limb <= t).astype(jnp.int32)
    count = jnp.sum(keep)
    if use_pallas and 2 * n < 2 ** 31:
        rank = (psort.flag_pos_key(jnp.int32(1) - keep, n),)
    else:
        rank = (jnp.int32(1) - keep, pos)
    packed = _sort_cols((*rank, limb, pos, *enc), use_pallas,
                        num_keys=len(rank), pad_safe=True)[len(rank):]

    ok = (count >= k) & (count <= cap)

    def fast(args):
        pk = args[0]
        return take_k(_sort_cols(tuple(c[:cap] for c in pk), use_pallas,
                                 num_keys=2, pad_safe=True))

    def exact(args):
        _, full = args
        return take_k(_sort_cols(full, use_pallas, num_keys=2,
                                 pad_safe=True))

    return jax.lax.cond(ok, fast, exact, (packed, (limb, pos, *enc)))


@functools.partial(jax.jit, static_argnames=("capacity", "use_pallas"))
def distinct(keys_col, *, capacity: int, use_pallas: bool = True):
    """SELECT DISTINCT: the unique values of a column, ascending.

    Sorts the KEY COLUMN ALONE on normalized limbs, then gathers each
    group's boundary value through the group-by boundary machinery
    (aggregate._boundary_reduce_cols with a free key-ordered gather) —
    no measure column ever rides the sort, so a u32 distinct moves half
    the sort traffic the previous group_aggregate_sorted(count) form
    paid. Returns (unique_values, count): the first `count` slots hold
    the distinct values ascending; later slots are padding. `capacity`
    is the static result-buffer size (distinct count must not exceed
    it).
    """
    from cl_ops_tpu.ops.exec.aggregate import _boundary_reduce_cols
    kl = keymod.to_limbs(keys_col)
    out = _sort_cols(tuple(kl), use_pallas)
    skeys = keymod.from_limbs(list(out), keys_col.dtype)
    # "max" over the key itself with key_ordered=True is a pure ends
    # gather — the boundary machinery yields (group_keys, ..., count)
    # with no cumsum over any measure column.
    gk, _, cnt = _boundary_reduce_cols(
        skeys, (skeys,), num_groups=capacity, aggs=("max",),
        key_ordered=(True,), use_pallas=use_pallas)
    return gk, cnt
