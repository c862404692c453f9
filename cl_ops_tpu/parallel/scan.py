"""Multi-chip prefix sum: chip-local scan + collective carry exchange.

The direct distributed analog of the reference's three-kernel Blelloch
hierarchy (`src/cl_ops/scan/clo_scan_blelloch.cl:49-211`): kernel 1
(per-workgroup scan) becomes the per-chip scan; kernel 2 (scan of workgroup
totals) becomes an `all_gather` of chip totals + masked sum; kernel 3
(uniform add) becomes the local offset add. Chip totals ride ICI; device
order is fixed by the mesh, so carries are deterministic (SURVEY.md §7
"cross-chip scan carry ordering").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from cl_ops_tpu.parallel.mesh import DATA_AXIS, put_sharded


def _local_inclusive(x, sum_dtype, use_pallas: bool):
    if use_pallas:
        from cl_ops_tpu.ops.scan import kernels
        from cl_ops_tpu.utils.platform import pallas_interpret
        return kernels.scan_1d(x, sum_dtype=sum_dtype, exclusive=False,
                               interpret=pallas_interpret())
    return jnp.cumsum(x.astype(sum_dtype))


def dist_scan(x, mesh: Mesh, *, sum_dtype, exclusive: bool = True,
              axis: str = DATA_AXIS, use_pallas: bool | None = None):
    """Exclusive/inclusive prefix sum of a row-sharded 1-D array.

    `x` must be shardable evenly over `mesh[axis]`. Returns an array with the
    same sharding, dtype `sum_dtype`.
    """
    if use_pallas is None:
        from cl_ops_tpu.utils.platform import on_tpu
        use_pallas = on_tpu()
    sum_dtype = jnp.dtype(sum_dtype)
    n_shards = mesh.shape[axis]
    if x.shape[0] % n_shards:
        raise ValueError(
            f"array length {x.shape[0]} not divisible by mesh axis "
            f"{axis}={n_shards}")

    def local_fn(xs):
        xs = xs.reshape(-1)
        incl = _local_inclusive(xs, sum_dtype, use_pallas)
        total = incl[-1:]
        # Kernel-2 analog: gather every chip's total, sum those before us.
        totals = jax.lax.all_gather(total, axis).reshape(-1)
        me = jax.lax.axis_index(axis)
        idx = jax.lax.broadcasted_iota(jnp.int32, totals.shape, 0)
        prev = jnp.sum(jnp.where(idx < me, totals, jnp.zeros_like(totals)))
        # Kernel-3 analog: uniform add of the carry.
        out = incl + prev
        if exclusive:
            out = out - xs.astype(sum_dtype)
        return out

    # check_vma=False: pallas_call inside shard_map does not yet propagate
    # varying-mesh-axes metadata.
    fn = shard_map(local_fn, mesh=mesh, in_specs=P(axis), out_specs=P(axis),
                   check_vma=False)
    return fn(put_sharded(x, mesh, axis))


@functools.partial(jax.jit, static_argnames=("mesh", "sum_dtype", "exclusive",
                                             "axis", "use_pallas"))
def _dist_scan_jit(x, mesh, sum_dtype, exclusive, axis, use_pallas):
    return dist_scan(x, mesh, sum_dtype=sum_dtype, exclusive=exclusive,
                     axis=axis, use_pallas=use_pallas)
