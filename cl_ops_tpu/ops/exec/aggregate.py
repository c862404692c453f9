"""Hash / group-by aggregation.

North-star operator (BASELINE.json: "GROUP BY over 256M rows, 1M groups").
No referent in the reference library; composes the framework's own
primitives the way satradix composes scan (`clo_sort_satradix.c:296-300`).

Two strategies:
  * "direct"  — keys are already dense group ids in [0, num_groups):
    a scatter-add (segment sum) straight into the accumulator table.
  * "sort"    — arbitrary keys: sort rows by key (any registry sorter),
    then detect group boundaries with a prefix scan and reduce per group.
    Group results come out in ascending key order — deterministic, unlike
    hash-bucket order.

Aggregations: sum, count, min, max, mean.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_AGGS = ("sum", "count", "min", "max", "mean")


def _accumulate(table, group_id, values, agg):
    if agg in ("sum", "mean", "count"):
        return table.at[group_id].add(values, mode="drop")
    if agg == "min":
        return table.at[group_id].min(values, mode="drop")
    if agg == "max":
        return table.at[group_id].max(values, mode="drop")
    raise ValueError(f"unknown agg {agg!r}; known: {_AGGS}")


def _init_table(num_groups, dtype, agg):
    if agg == "min":
        return jnp.full((num_groups,), jnp.iinfo(dtype).max
                        if jnp.issubdtype(dtype, jnp.integer)
                        else jnp.inf, dtype)
    if agg == "max":
        return jnp.full((num_groups,), jnp.iinfo(dtype).min
                        if jnp.issubdtype(dtype, jnp.integer)
                        else -jnp.inf, dtype)
    return jnp.zeros((num_groups,), dtype)


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


def group_aggregate_sorted(keys, values, *, num_groups: int, agg: str = "sum",
                           sorter=None):
    """Aggregate values by arbitrary key: sort -> boundary scan -> reduce.

    Returns (group_keys, table, count): the first `count` entries of
    group_keys/table hold one row per distinct key in ascending key order;
    later entries are padding. num_groups is the table capacity
    (distinct-key count must not exceed it).
    """
    from cl_ops_tpu.ops.sort import sort_new
    if sorter is None:
        sorter = sort_new("xla", elem_dtype=keys.dtype)
    skeys, svals = sorter.sort_with_device_data(keys, values)
    return _boundary_reduce(skeys, svals, num_groups=num_groups, agg=agg)


@functools.partial(jax.jit, static_argnames=("num_groups", "agg"))
def _boundary_reduce(skeys, svals, *, num_groups: int, agg: str,
                     n_valid=None):
    """Scatter-free segmented reduce over key-sorted rows.

    sum/count/mean: group totals are differences of the running cumsum at
    segment END positions; the (data-dependent) end-position list compacts
    to the front with the same stable-sort trick filter_compact uses. XLA
    scatter-add on TPU is element-serialized (~2 Mrows/s measured), while
    this path is sort/cumsum/gather only. min/max fall back to scatter
    (no cumsum-diff identity) — prefer sum-type aggregations at scale.

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
    if agg in ("min", "max"):
        gid_scatter = jnp.where(valid, group_id, num_groups)  # drop invalid
        table = group_aggregate_direct(gid_scatter, svals,
                                       num_groups=num_groups, agg=agg)
        first_pos = jnp.full((num_groups,), n, jnp.int32).at[gid_scatter].min(
            pos, mode="drop")
        group_keys = jnp.take(skeys, jnp.minimum(first_pos, n - 1))
        return group_keys, table, count

    # end of group g = position before the next is_new / first invalid row
    # (or the last row)
    ones1 = jnp.ones((1,), jnp.bool_)
    next_is_new = jnp.concatenate([is_new[1:], ones1])
    next_invalid = jnp.concatenate([jnp.logical_not(valid)[1:], ones1])
    is_end = valid & (next_is_new | next_invalid)
    if n_valid is not None:
        svals = jnp.where(valid, svals, jnp.zeros((), svals.dtype))
    # compact end positions to the front, in order (stable sort by ~is_end)
    ends = jax.lax.sort([jnp.logical_not(is_end).astype(jnp.int32), pos],
                        num_keys=1, is_stable=True)[1]
    ends = ends[:num_groups] if n >= num_groups else jnp.pad(
        ends, (0, num_groups - n), constant_values=n - 1)
    valid = jax.lax.broadcasted_iota(jnp.int32, (num_groups,), 0) < count
    ends = jnp.where(valid, ends, n - 1)

    valid_i32 = valid.astype(jnp.int32)
    if agg == "count":
        vacc = jnp.cumsum(valid_i32)
    else:
        vacc = jnp.cumsum(svals)
    end_acc = jnp.take(vacc, ends)
    prev_acc = jnp.concatenate([jnp.zeros((1,), end_acc.dtype),
                                end_acc[:-1]])
    table = jnp.where(valid, end_acc - prev_acc,
                      jnp.zeros((), end_acc.dtype))
    group_keys = jnp.take(skeys, ends)
    if agg == "mean":
        cnt_acc = jnp.take(jnp.cumsum(valid_i32), ends)
        prev_cnt = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                    cnt_acc[:-1]])
        cnts = jnp.maximum(cnt_acc - prev_cnt, 1)
        table = table / cnts.astype(table.dtype)
    return group_keys, table, count
