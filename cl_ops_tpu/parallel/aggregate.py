"""Distributed group-by aggregate: hash-partition keys, aggregate locally.

North-star config ("GROUP BY over 256M rows, 1M groups", BASELINE.json),
scaled over the mesh: every key's rows land on one chip via the all_to_all
partition exchange, so per-chip local aggregation is exact and chips hold
disjoint group sets.

Skew safety: the shuffle's overflow counter is CHECKED (never silently
discarded) — overflow triggers the adaptive hash -> range-splitter ->
doubled-capacity re-plan of splitters.keyed_exchange_replan and raises if
rows would still drop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from cl_ops_tpu.parallel.mesh import DATA_AXIS, put_sharded
from cl_ops_tpu.parallel.splitters import (keyed_exchange_once,
                                           keyed_exchange_replan)
from cl_ops_tpu.utils.bits import is_po2


def dist_group_aggregate(keys, values, mesh: Mesh, *, num_groups: int,
                         capacity: int, agg: str = "sum",
                         axis: str = DATA_AXIS, partition: str = "hash",
                         max_replan: int = 3, samples_per_chip: int = 256,
                         use_pallas: bool | None = None,
                         check: str = "replan"):
    """Aggregate values by key across the mesh.

    num_groups bounds DISTINCT KEYS PER CHIP (local table capacity);
    capacity bounds rows per (source chip -> partition) shuffle bucket —
    overflow re-plans adaptively (see keyed_exchange_replan) and raises
    rather than ever dropping rows.

    use_pallas: sort the local (validity, key, value) rows with the fused
    Pallas bitonic (psort) instead of lax.sort; needs 4-byte keys and
    values. Default: on TPU.
    check: "replan" (default) or "defer" — same contract as dist_hash_join;
      "defer" skips the host-synced overflow check (jit-traceable) and
      appends the shuffle's per-chip `dropped` counter to the outputs for
      the caller to verify asynchronously.

    Returns (group_keys, table, count) per chip, row-sharded: chip c's
    slice holds `count[c]` valid (key, aggregate) rows in ascending key
    order; group sets are disjoint across chips. With check="defer" a
    trailing `dropped` element is appended.
    """
    n_chips = mesh.shape[axis]
    if not is_po2(n_chips):
        raise ValueError("mesh axis size must be a power of 2")
    if check not in ("replan", "defer"):
        raise ValueError(f"unknown check {check!r}")
    if use_pallas is None:
        from cl_ops_tpu.utils.platform import on_tpu
        use_pallas = on_tpu()
    if check == "defer":
        (res,), (dropped,) = keyed_exchange_once(
            [(keys, (values,))], mesh, capacities=(capacity,), axis=axis,
            partition=partition, samples_per_chip=samples_per_chip)
        cap = capacity
    else:
        (res,), (cap,) = keyed_exchange_replan(
            [(keys, (values,))], mesh, capacities=(capacity,), axis=axis,
            partition=partition, max_replan=max_replan,
            samples_per_chip=samples_per_chip,
            op_name="dist_group_aggregate")
    counts, k, v = res

    from cl_ops_tpu.ops.exec import psort
    from cl_ops_tpu.ops.sort import keys as keymod
    from cl_ops_tpu.utils.platform import pallas_interpret
    interp = pallas_interpret()
    pallas_local = (use_pallas
                    and jnp.dtype(keys.dtype).itemsize == 4
                    and jnp.dtype(values.dtype).itemsize == 4)

    def local_fn(c, kl, vl):
        c = c.reshape(-1)
        kl = kl.reshape(n_chips, cap)
        vl = vl.reshape(n_chips, cap)
        slot = jax.lax.broadcasted_iota(jnp.int32, kl.shape, 1)
        valid = (slot < c[:, None]).reshape(-1)
        kf = kl.reshape(-1)
        vf = vl.reshape(-1)
        # Sort with the INVERTED valid mask as primary key: valid rows form
        # a key-sorted prefix, invalid rows trail. Validity never enters key
        # space, so any real key value (incl. dtype extremes) aggregates
        # correctly; _boundary_reduce ignores rows past n_valid.
        inv = jnp.logical_not(valid).astype(jnp.int32)
        if pallas_local:
            # values sort as the trailing comparator column — same
            # semantics as lax.sort num_keys=3 (value order within a group
            # is irrelevant for sum; min/max read group ends by gather).
            # Values must be ORDER-NORMALIZED limbs, not a raw bitcast:
            # as_i32 would order float32/uint32 values by their bit
            # patterns and min/max would gather the wrong group ends.
            limbs = keymod.to_limbs(kf)
            vlimbs = keymod.to_limbs(vf)
            out = psort.sort_i32_cols(
                (inv, *limbs, *vlimbs), interpret=interp)
            sk = keymod.from_limbs(list(out[1:1 + len(limbs)]), kf.dtype)
            sv = keymod.from_limbs(list(out[1 + len(limbs):]), vf.dtype)
        else:
            _, sk, sv = jax.lax.sort([inv, kf, vf], num_keys=3)
        n_valid = jnp.sum(valid.astype(jnp.int32), dtype=jnp.int32)
        from cl_ops_tpu.ops.exec.aggregate import _boundary_reduce
        gkeys, table, cnt = _boundary_reduce(sk, sv, num_groups=num_groups,
                                             agg=agg, n_valid=n_valid,
                                             vals_in_key_order=True)
        return gkeys, table, cnt.reshape(1)

    fn = shard_map(local_fn, mesh=mesh, in_specs=P(axis),
                   out_specs=(P(axis), P(axis), P(axis)), check_vma=False)
    out = fn(*(put_sharded(a, mesh, axis) for a in (counts, k, v)))
    return out + (dropped,) if check == "defer" else out
