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
def _boundary_reduce(skeys, svals, *, num_groups: int, agg: str):
    n = skeys.shape[0]
    prev = jnp.concatenate([skeys[:1], skeys[:-1]])
    is_new = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                              (skeys != prev)[1:]])
    group_id = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    count = group_id[-1] + 1
    table = group_aggregate_direct(group_id, svals, num_groups=num_groups,
                                   agg=agg)
    first_pos = jnp.full((num_groups,), n, jnp.int32).at[group_id].min(
        jax.lax.broadcasted_iota(jnp.int32, (n,), 0), mode="drop")
    group_keys = jnp.take(skeys, jnp.minimum(first_pos, n - 1))
    return group_keys, table, count
