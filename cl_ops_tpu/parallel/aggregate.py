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
        # Invalid slots: key -> all-ones sentinel. It sorts last, forms its
        # own (dropped) group, so garbage values never touch real groups.
        sentinel = (jnp.asarray(2**32 - 1, kf.dtype)
            if jnp.dtype(kf.dtype) == jnp.uint32
            else jnp.asarray(-1, kf.dtype))
        kf = jnp.where(valid, kf, sentinel)
        sk, sv = jax.lax.sort([kf, vf], num_keys=1)
        from cl_ops_tpu.ops.exec.aggregate import _boundary_reduce
        gkeys, table, cnt = _boundary_reduce(sk, sv, num_groups=num_groups,
                                             agg=agg)
        # Drop the sentinel group if any invalid slots existed.
        has_pad = jnp.any(jnp.logical_not(valid))
        cnt = cnt - has_pad.astype(cnt.dtype)
        return gkeys, table, cnt.reshape(1)

    fn = shard_map(local_fn, mesh=mesh, in_specs=P(axis),
                   out_specs=(P(axis), P(axis), P(axis)), check_vma=False)
    sharding = NamedSharding(mesh, P(axis))
    return fn(*(jax.device_put(a, sharding) for a in (counts, k, v)))
