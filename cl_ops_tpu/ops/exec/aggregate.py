"""Hash / group-by aggregation.

North-star operator (BASELINE.json: "GROUP BY over 256M rows, 1M groups").
No referent in the reference library; composes the framework's own
primitives the way satradix composes scan (`clo_sort_satradix.c:296-300`).

Strategies:
  * "direct"  — keys are already dense group ids in [0, num_groups):
    a scatter-add (segment sum) straight into the accumulator table.
  * "sort"    — arbitrary keys: sort rows by (key, value) — by default via
    the flagship Pallas bitonic on normalized limbs — then detect group
    boundaries and reduce per group with cumsum differences and gathers
    (NO scatter: XLA scatter on TPU is element-serialized, ~2 Mrows/s).
    Sorting values as a SECONDARY KEY makes min/max pure gathers too:
    a group's min is its first value, its max its last. Group results come
    out in ascending key order — deterministic, unlike hash-bucket order.

Aggregations: sum, count, min, max, mean.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cl_ops_tpu.ops.exec import psort
from cl_ops_tpu.ops.sort import keys as keymod

_AGGS = ("sum", "count", "min", "max", "mean")


def _accumulate(table, group_id, values, agg):
    if agg in ("sum", "mean", "count"):
        return table.at[group_id].add(values, mode="drop")
    if agg == "min":
        return table.at[group_id].min(values, mode="drop")
    if agg == "max":
        return table.at[group_id].max(values, mode="drop")
    raise ValueError(f"unknown agg {agg!r}; known: {_AGGS}")


def _init_scalar(dtype, agg):
    if agg == "min":
        return (jnp.iinfo(dtype).max
                if jnp.issubdtype(dtype, jnp.integer) else jnp.inf)
    if agg == "max":
        return (jnp.iinfo(dtype).min
                if jnp.issubdtype(dtype, jnp.integer) else -jnp.inf)
    return 0


def _init_table(num_groups, dtype, agg):
    return jnp.full((num_groups,), _init_scalar(dtype, agg), dtype)


@functools.partial(jax.jit, static_argnames=("num_groups", "agg"))
def group_aggregate_direct(group_ids, values, *, num_groups: int,
                           agg: str = "sum"):
    """Aggregate values by dense int group id in [0, num_groups).

    Returns the (num_groups,) aggregate table. Out-of-range ids drop.
    """
    if agg == "count":
        values = jnp.ones_like(group_ids, jnp.int32)
    table = _init_table(num_groups, values.dtype, agg)
    table = _accumulate(table, group_ids, values, agg)
    if agg == "mean":
        counts = jnp.zeros((num_groups,), jnp.int32).at[group_ids].add(
            jnp.ones_like(group_ids, jnp.int32), mode="drop")
        return table / jnp.maximum(counts, 1).astype(table.dtype)
    return table


@functools.partial(jax.jit, static_argnames=("num_groups", "agg",
                                             "use_pallas"))
def _sorted_aggregate_pallas(keys, values, *, num_groups: int, agg: str,
                             use_pallas: bool):
    """Sort rows by (key, value) on normalized limbs, then boundary-reduce.

    Both columns participate as comparison keys (values secondary), so the
    value order within each group is known and min/max become gathers.
    """
    kl = keymod.to_limbs(keys)
    vl = keymod.to_limbs(values)
    out = psort.sort_i32_cols((*kl, *vl)) if use_pallas else tuple(
        jax.lax.sort([*kl, *vl], num_keys=len(kl) + len(vl)))
    skeys = keymod.from_limbs(list(out[:len(kl)]), keys.dtype)
    svals = keymod.from_limbs(list(out[len(kl):]), values.dtype)
    return _boundary_reduce(skeys, svals, num_groups=num_groups, agg=agg,
                            vals_in_key_order=True, use_pallas=use_pallas)


@functools.partial(jax.jit, static_argnames=("num_groups", "agg",
                                             "use_pallas"))
def group_aggregate_prefix(keys, values, n_valid, *, num_groups: int,
                           agg: str = "sum", use_pallas: bool = True):
    """Aggregate only the first n_valid rows — the filter_compact composer.

    filter_compact returns (count, packed...) with kept rows contiguous at
    the front; this aggregates exactly that prefix without materializing a
    dynamic shape: rows sort by (validity, key, value) so the valid prefix
    is key-sorted and _boundary_reduce's n_valid machinery ignores the
    tail. The canonical filter -> GROUP BY pipeline (BASELINE configs 3+4).
    """
    n = keys.shape[0]
    kl = keymod.to_limbs(keys)
    vl = keymod.to_limbs(values)
    inv = (jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
           >= n_valid).astype(jnp.int32)
    cols = (inv, *kl, *vl)
    out = psort.sort_i32_cols(cols) if use_pallas else tuple(
        jax.lax.sort(list(cols), num_keys=len(cols)))
    skeys = keymod.from_limbs(list(out[1:1 + len(kl)]), keys.dtype)
    svals = keymod.from_limbs(list(out[1 + len(kl):]), values.dtype)
    return _boundary_reduce(skeys, svals, num_groups=num_groups, agg=agg,
                            n_valid=n_valid, vals_in_key_order=True,
                            use_pallas=use_pallas)


def group_aggregate_sorted(keys, values, *, num_groups: int, agg: str = "sum",
                           sorter=None, use_pallas: bool = True,
                           keys_sorted: bool = False):
    """Aggregate values by arbitrary key: sort -> boundary scan -> reduce.

    By default rows sort by (key, value) through the flagship Pallas
    bitonic (use_pallas=False keeps the same algorithm on `jax.lax.sort`).
    Passing an explicit registry `sorter` instead sorts by key only with
    values as payload (the reference-style op-composition path); min/max
    then re-sort (group_id, value) once. keys_sorted=True skips the input
    sort entirely — the fusion path for producers that already emit
    key-grouped rows (e.g. hash_join/hash_join_expand with sorted_output:
    an aggregate after a join need not pay the join's restore sort NOR
    its own input sort).

    Returns (group_keys, table, count): the first `count` entries of
    group_keys/table hold one row per distinct key in ascending key order;
    later entries are padding. num_groups is the table capacity
    (distinct-key count must not exceed it).
    """
    if keys.shape[0] == 0:
        if agg == "count":
            table_dt = jnp.dtype(jnp.int32)
        elif agg == "mean":  # same promotion as the divide in the real path
            table_dt = (jnp.zeros((), values.dtype) / jnp.int32(1)).dtype
        else:
            table_dt = values.dtype
        return (jnp.zeros((num_groups,), keys.dtype),
                jnp.zeros((num_groups,), table_dt), jnp.int32(0))
    if keys_sorted:
        return _boundary_reduce(keys, values, num_groups=num_groups,
                                agg=agg, use_pallas=use_pallas)
    if sorter is None:
        return _sorted_aggregate_pallas(keys, values, num_groups=num_groups,
                                        agg=agg, use_pallas=use_pallas)
    skeys, svals = sorter.sort_with_device_data(keys, values)
    return _boundary_reduce(skeys, svals, num_groups=num_groups, agg=agg,
                            use_pallas=use_pallas)


@functools.partial(jax.jit, static_argnames=("num_groups", "agg",
                                             "vals_in_key_order",
                                             "use_pallas"))
def _boundary_reduce(skeys, svals, *, num_groups: int, agg: str,
                     n_valid=None, vals_in_key_order: bool = False,
                     use_pallas: bool = False):
    """Scatter-free segmented reduce over key-sorted rows.

    sum/count/mean: group totals are differences of the running cumsum at
    segment END positions; the (data-dependent) end-position list compacts
    to the front with the same stable-partition key filter_compact uses
    (Pallas bitonic when use_pallas). min/max: when vals_in_key_order
    (rows sorted by (key, value)), a group's min/max are the values at its
    first/last position — pure gathers; otherwise they fall back to the
    XLA scatter table (element-serialized on TPU — prefer the sorted-value
    path at scale).

    n_valid: optional traced count of valid rows. When given, rows at
    positions >= n_valid are ignored entirely (callers sort with the
    inverted valid mask as primary key so valid rows form a prefix) —
    validity never has to be encoded in key space, so any key value,
    including the dtype's extremes, aggregates correctly.
    """
    n = skeys.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    if n_valid is None:
        valid = jnp.ones((n,), jnp.bool_)
    else:
        valid = pos < n_valid
    prev = jnp.concatenate([skeys[:1], skeys[:-1]])
    is_new = valid & jnp.concatenate([jnp.ones((1,), jnp.bool_),
                                      (skeys != prev)[1:]])
    group_id = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    count = group_id[-1] + 1

    if agg in ("min", "max") and not vals_in_key_order:
        # Values arrived in arbitrary within-group order (explicit-sorter
        # path: key-only sort, values as payload). One (group_id, value)
        # column sort makes min/max pure run-boundary gathers — the XLA
        # scatter table this replaced is element-serialized on TPU
        # (~2 Mrows/s; r2 weak item 6). group_id is nondecreasing in the
        # key-sorted input, so run boundaries come from searchsorted over
        # num_groups queries (cheap next to n).
        vl = keymod.to_limbs(svals)
        # invalid rows take group id num_groups: they sort past every real
        # group's run and never contaminate a min/max (n_valid contract)
        gid2 = jnp.where(valid, group_id, jnp.int32(num_groups))
        cols = (gid2, *vl)
        out = psort.sort_i32_cols(cols) if use_pallas else tuple(
            jax.lax.sort(list(cols), num_keys=len(cols)))
        sv2 = keymod.from_limbs(list(out[1:]), svals.dtype)
        gi = jax.lax.broadcasted_iota(jnp.int32, (num_groups,), 0)
        starts = jnp.searchsorted(out[0], gi).astype(jnp.int32)
        ends_g = jnp.searchsorted(out[0], gi,
                                  side="right").astype(jnp.int32) - 1
        src = ends_g if agg == "max" else starts
        valid_g = gi < count
        table = jnp.where(valid_g, jnp.take(sv2, jnp.clip(src, 0, n - 1)),
                          jnp.asarray(_init_scalar(svals.dtype, agg),
                                      svals.dtype))
        group_keys = jnp.take(skeys, jnp.clip(starts, 0, n - 1))
        return group_keys, table, count

    # end of group g = position before the next is_new / first invalid row
    # (or the last row)
    ones1 = jnp.ones((1,), jnp.bool_)
    next_is_new = jnp.concatenate([is_new[1:], ones1])
    next_invalid = jnp.concatenate([jnp.logical_not(valid)[1:], ones1])
    is_end = valid & (next_is_new | next_invalid)
    if n_valid is not None and agg not in ("min", "max"):
        svals = jnp.where(valid, svals, jnp.zeros((), svals.dtype))
    # compact end positions to the front, in order (stable partition)
    if use_pallas and 2 * n < 2 ** 31:
        comb = psort.flag_pos_key(
            jnp.logical_not(is_end).astype(jnp.int32), n)
        es = psort.sort_i32_cols((comb,))[0]
        ends_all = jnp.where(es < n, es, es - jnp.int32(n))
    else:
        ends_all = jax.lax.sort(
            [jnp.logical_not(is_end).astype(jnp.int32), pos],
            num_keys=1, is_stable=True)[1]
    ends = ends_all[:num_groups] if n >= num_groups else jnp.pad(
        ends_all, (0, num_groups - n), constant_values=n - 1)
    valid_g = jax.lax.broadcasted_iota(jnp.int32, (num_groups,), 0) < count
    ends = jnp.where(valid_g, ends, n - 1)
    group_keys = jnp.take(skeys, ends)

    if agg in ("min", "max"):
        # group starts: end of the previous group + 1
        starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), ends[:-1] + 1])
        src = ends if agg == "max" else jnp.clip(starts, 0, n - 1)
        table = jnp.where(valid_g, jnp.take(svals, src),
                          jnp.asarray(_init_scalar(svals.dtype, agg),
                                      svals.dtype))
        return group_keys, table, count

    if agg == "count":
        vacc = jnp.cumsum(valid.astype(jnp.int32))
    else:
        vacc = jnp.cumsum(svals)
    end_acc = jnp.take(vacc, ends)
    prev_acc = jnp.concatenate([jnp.zeros((1,), end_acc.dtype),
                                end_acc[:-1]])
    table = jnp.where(valid_g, end_acc - prev_acc,
                      jnp.zeros((), end_acc.dtype))
    if agg == "mean":
        cnt_acc = jnp.take(jnp.cumsum(valid.astype(jnp.int32)), ends)
        prev_cnt = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                    cnt_acc[:-1]])
        cnts = jnp.maximum(cnt_acc - prev_cnt, 1)
        table = table / cnts.astype(table.dtype)
    return group_keys, table, count
