"""Distributed group-by aggregate: hash-partition keys, aggregate locally.

North-star config ("GROUP BY over 256M rows, 1M groups", BASELINE.json),
scaled over the mesh: every key's rows land on one chip via the all_to_all
partition exchange, so per-chip local aggregation is exact and chips hold
disjoint group sets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cl_ops_tpu.parallel.join import _key_partition
from cl_ops_tpu.parallel.mesh import DATA_AXIS
from cl_ops_tpu.parallel.shuffle import partition_exchange
from cl_ops_tpu.utils.bits import is_po2


def dist_group_aggregate(keys, values, mesh: Mesh, *, num_groups: int,
                         capacity: int, agg: str = "sum",
                         axis: str = DATA_AXIS):
    """Aggregate values by key across the mesh.

    num_groups bounds DISTINCT KEYS PER CHIP (local table capacity);
    capacity bounds rows per (source chip -> partition) shuffle bucket.

    Returns (group_keys, table, count) per chip, row-sharded: chip c's
    slice holds `count[c]` valid (key, aggregate) rows in ascending key
    order; group sets are disjoint across chips.
    """
    n_chips = mesh.shape[axis]
    if not is_po2(n_chips):
        raise ValueError("mesh axis size must be a power of 2")
    part = _key_partition(keys, n_chips)
    counts, _, k, v = partition_exchange(
        keys, part, mesh, capacity=capacity, axis=axis,
        extra_cols=(values,))

    def local_fn(c, kl, vl):
        c = c.reshape(-1)
        kl = kl.reshape(n_chips, capacity)
        vl = vl.reshape(n_chips, capacity)
        slot = jax.lax.broadcasted_iota(jnp.int32, kl.shape, 1)
        valid = (slot < c[:, None]).reshape(-1)
        kf = kl.reshape(-1)
        vf = vl.reshape(-1)
        # Sort with the INVERTED valid mask as primary key: valid rows form
        # a key-sorted prefix, invalid rows trail. Validity never enters key
        # space, so any real key value (incl. dtype extremes) aggregates
        # correctly; _boundary_reduce ignores rows past n_valid.
        inv = jnp.logical_not(valid).astype(jnp.int32)
        # values sort as tertiary key so min/max reduce by gather (first/
        # last value of each group), not element-serialized scatter
        _, sk, sv = jax.lax.sort([inv, kf, vf], num_keys=3)
        n_valid = jnp.sum(valid.astype(jnp.int32), dtype=jnp.int32)
        from cl_ops_tpu.ops.exec.aggregate import _boundary_reduce
        gkeys, table, cnt = _boundary_reduce(sk, sv, num_groups=num_groups,
                                             agg=agg, n_valid=n_valid,
                                             vals_in_key_order=True)
        return gkeys, table, cnt.reshape(1)

    fn = shard_map(local_fn, mesh=mesh, in_specs=P(axis),
                   out_specs=(P(axis), P(axis), P(axis)), check_vma=False)
    sharding = NamedSharding(mesh, P(axis))
    return fn(*(jax.device_put(a, sharding) for a in (counts, k, v)))
