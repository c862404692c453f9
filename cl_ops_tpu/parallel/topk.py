"""Distributed ORDER BY ... LIMIT k and SELECT DISTINCT across the mesh.

Multi-chip siblings of ops/exec/topk.py, built on the classic
select-then-merge reduction: every chip solves its shard exactly with the
single-chip operator, contributes a candidate set bounded by the answer
size, and a final merge over the (tiny) union finishes globally. The
candidate bound is what makes this exact: no chip can place more than
min(k, shard_rows) rows in the global top k, and the global distinct set
is a subset of the union of per-chip distinct sets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from cl_ops_tpu.ops.exec import psort
from cl_ops_tpu.ops.exec.topk import distinct, top_k
from cl_ops_tpu.ops.sort import keys as keymod
from cl_ops_tpu.parallel.mesh import DATA_AXIS, iota_sharded, put_sharded


def dist_top_k(values, k: int, mesh: Mesh, *payload_cols,
               largest: bool = False, axis: str = DATA_AXIS,
               use_pallas: bool | None = None, **topk_kw):
    """The k extreme rows of a row-sharded column, with payload columns.

    Args mirror ops/exec/topk.top_k; `values` and payload columns are
    row-sharded over mesh[axis]. Returns (top_values, *top_payloads) of
    length k, ascending (descending when largest=True), ties broken by
    GLOBAL input position — the same contract as the single-chip operator.
    Pass iota_sharded(n, mesh) as a payload column to receive the winning
    row positions.

    Per chip: one exact local top-min(k, shard) (threshold-select fast
    path with the exact fallback); merge: one lexicographic sort of the
    n_chips * k candidates.
    """
    if use_pallas is None:
        from cl_ops_tpu.utils.platform import on_tpu
        use_pallas = on_tpu()
    n = values.shape[0]
    n_chips = mesh.shape[axis]
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if k > n:
        raise ValueError(f"k={k} exceeds row count {n}")
    if n % n_chips:
        raise ValueError(f"length {n} not divisible by {n_chips} chips")
    shard_n = n // n_chips
    kk = min(k, shard_n)

    gpos = iota_sharded(n, mesh, axis)
    enc, spec = psort.cols_to_i32(tuple(payload_cols))

    def local_fn(vs, gp, *pls):
        out = top_k(vs.reshape(-1), kk, gp.reshape(-1),
                    *[p.reshape(-1) for p in pls], largest=largest,
                    use_pallas=use_pallas, **topk_kw)
        return tuple(out)

    fn = shard_map(local_fn, mesh=mesh, in_specs=P(axis), out_specs=P(axis),
                   check_vma=False)
    cand = fn(put_sharded(values, mesh, axis), gpos,
              *(put_sharded(c, mesh, axis) for c in enc))

    # cand: (vals, gpos, *enc payloads), each (n_chips * kk,) global rows.
    # The merge runs replicated (out_shardings P()) so every process of a
    # multi-process mesh can read the k-row result directly.
    def merge(cvals, cgpos, *cenc):
        cl = keymod.to_limbs(cvals)
        if largest:
            cl = [jnp.int32(-1) ^ c for c in cl]
        cols = (*cl, cgpos, *cenc)
        merged = tuple(jax.lax.sort(list(cols), num_keys=len(cl) + 1))
        vl = [c[:k] for c in merged[:len(cl)]]
        if largest:
            vl = [jnp.int32(-1) ^ c for c in vl]
        out_vals = keymod.from_limbs(vl, values.dtype)
        pays = psort.cols_from_i32([c[:k] for c in merged[len(cl) + 1:]],
                                   spec)
        return (out_vals, *pays)

    from jax.sharding import NamedSharding
    return jax.jit(merge, out_shardings=NamedSharding(mesh, P()))(*cand)


def dist_distinct(keys, mesh: Mesh, *, capacity: int,
                  axis: str = DATA_AXIS, use_pallas: bool | None = None):
    """SELECT DISTINCT over a row-sharded column.

    Returns (unique_values, count): the first `count` slots hold the
    distinct values ascending, replicated semantics like the single-chip
    operator; later slots are padding. `capacity` bounds the GLOBAL
    distinct count (ops/exec/topk.distinct contract) — per-chip distinct
    counts are automatically within it.

    Per chip: local distinct; padding slots are overwritten with that
    chip's first unique value so they collapse instead of inventing keys;
    merge: one more distinct over the n_chips * capacity candidates.
    """
    if use_pallas is None:
        from cl_ops_tpu.utils.platform import on_tpu
        use_pallas = on_tpu()
    n = keys.shape[0]
    n_chips = mesh.shape[axis]
    if n % n_chips:
        raise ValueError(f"length {n} not divisible by {n_chips} chips")
    cap_local = min(capacity, n // n_chips)

    def local_fn(ks):
        uniq, cnt = distinct(ks.reshape(-1), capacity=cap_local,
                             use_pallas=use_pallas)
        idx = jax.lax.broadcasted_iota(jnp.int32, uniq.shape, 0)
        return jnp.where(idx < cnt, uniq, uniq[0])

    fn = shard_map(local_fn, mesh=mesh, in_specs=P(axis), out_specs=P(axis),
                   check_vma=False)
    cand = fn(put_sharded(keys, mesh, axis))
    # replicated merge, readable from every process (see dist_top_k)
    from jax.sharding import NamedSharding
    return jax.jit(
        lambda c: distinct(c, capacity=capacity, use_pallas=use_pallas),
        out_shardings=NamedSharding(mesh, P()))(cand)
