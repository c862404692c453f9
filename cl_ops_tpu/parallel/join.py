"""Distributed hash join: partition-exchange both sides, join locally.

The north-star config ("Distributed hash join: 1B-row fact x 100M-row dim
... 4-host shuffle", BASELINE.json). Both relations hash-partition on the
join key over the mesh (parallel/shuffle.py all_to_all exchange), every chip
joins only its partition, and probe results shuffle back to their origin
rows — deterministic, collective-only communication.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cl_ops_tpu.ops.exec.join import hash_u32
from cl_ops_tpu.parallel.mesh import DATA_AXIS
from cl_ops_tpu.parallel.shuffle import partition_exchange
from cl_ops_tpu.utils.bits import log2_floor, is_po2


def _key_partition(keys, n_chips: int):
    """Hash partition id in [0, n_chips) (Fibonacci hash high bits)."""
    bits = log2_floor(n_chips)
    if bits == 0:
        return jnp.zeros(keys.shape, jnp.int32)
    return hash_u32(keys, bits)


def dist_hash_join(build_keys, build_vals, probe_keys, mesh: Mesh, *,
                   capacity_build: int, capacity_probe: int,
                   axis: str = DATA_AXIS, unique_build: bool = True,
                   join_type: str = "inner"):
    """Equi-join of row-sharded relations.

    capacity_* bound rows per (source chip -> partition) bucket in the two
    shuffles (static shapes). All outputs are row-sharded and aligned with
    probe_keys' original layout:
      inner + unique_build:     (found, vals)
      inner + not unique_build: (match_count, first_vals) — value of the
        first match in build-key order (bounded-output compromise)
      semi / anti:              the match / no-match mask alone
    """
    if join_type not in ("inner", "semi", "anti"):
        raise ValueError(f"unknown join_type {join_type!r}")
    n_chips = mesh.shape[axis]
    if not is_po2(n_chips):
        raise ValueError("mesh axis size must be a power of 2")
    n_probe = probe_keys.shape[0]
    shard_len = n_probe // n_chips

    # 1. shuffle the build side by key hash
    bpart = _key_partition(build_keys, n_chips)
    bcounts, _, bk, bv = partition_exchange(
        build_keys, bpart, mesh, capacity=capacity_build, axis=axis,
        extra_cols=(build_vals,))

    # 2. shuffle the probe side, carrying global row ids
    gidx = jnp.arange(n_probe, dtype=jnp.int32)
    ppart = _key_partition(probe_keys, n_chips)
    pcounts, _, pk, pg = partition_exchange(
        probe_keys, ppart, mesh, capacity=capacity_probe, axis=axis,
        extra_cols=(gidx,))

    # 3. local join per chip + route results back by origin chip
    def local_fn(bc, bkl, bvl, pc, pkl, pgl):
        bc = bc.reshape(-1)
        pc = pc.reshape(-1)
        bkl = bkl.reshape(n_chips, capacity_build)
        bvl = bvl.reshape(n_chips, capacity_build)
        pkl = pkl.reshape(n_chips, capacity_probe)
        pgl = pgl.reshape(n_chips, capacity_probe)
        slot_b = jax.lax.broadcasted_iota(jnp.int32, bkl.shape, 1)
        valid_b = slot_b < bc[:, None]
        slot_p = jax.lax.broadcasted_iota(jnp.int32, pkl.shape, 1)
        valid_p = slot_p < pc[:, None]

        # Build a sorted local dim table with validity as the PRIMARY sort
        # key (invalid slots last) — validity never enters key space, so a
        # real key equal to the dtype max still joins correctly. For
        # searchsorted the trailing invalid slots then take the dtype max
        # (keeps the array monotone); the svalid flag disambiguates probes
        # whose key happens to equal that fill.
        inv_b = jnp.logical_not(valid_b).astype(jnp.int32).reshape(-1)
        _, skey, sval, svalid_i = jax.lax.sort(
            [inv_b, bkl.reshape(-1), bvl.reshape(-1),
             valid_b.astype(jnp.int32).reshape(-1)], num_keys=2)
        svalid = svalid_i > 0
        kdt = jnp.dtype(skey.dtype)
        maxk = (jnp.asarray(jnp.iinfo(kdt).max, kdt)
                if jnp.issubdtype(kdt, jnp.integer)
                else jnp.asarray(jnp.inf, kdt))
        skey = jnp.where(svalid, skey, maxk)

        pkey = pkl.reshape(-1)
        nv = jnp.sum(bc, dtype=jnp.int32)  # valid build rows (prefix)
        idx_l = jnp.searchsorted(skey, pkey, side="left").astype(jnp.int32)
        idx_r = jnp.searchsorted(skey, pkey, side="right").astype(jnp.int32)
        # clip to the valid prefix: probes equal to the maxk fill must not
        # count the invalid fill slots
        cnt = (jnp.minimum(idx_r, nv) - jnp.minimum(idx_l, nv)) \
            * valid_p.reshape(-1).astype(jnp.int32)
        idx = jnp.minimum(idx_l, skey.shape[0] - 1)
        hit = cnt > 0
        val = jnp.take(sval, idx)

        # 4. send (gidx, found, val) back to the origin chip
        g = pgl.reshape(-1)
        origin = jnp.where(valid_p.reshape(-1), g // shard_len,
                           jnp.int32(n_chips))  # invalid rows -> dropped
        cap_back = capacity_probe  # per-origin bucket bound
        m = g.shape[0]
        order2 = jnp.argsort(origin, stable=True)
        so = jnp.take(origin, order2)
        pos = jax.lax.broadcasted_iota(jnp.int32, (m,), 0)
        start = jnp.searchsorted(so, jnp.arange(
            n_chips, dtype=so.dtype)).astype(jnp.int32)
        rank = pos - jnp.take(start, jnp.minimum(so, n_chips - 1))
        dest = jnp.minimum(so, n_chips) * cap_back + rank
        dest = jnp.where((so < n_chips) & (rank < cap_back), dest,
                         n_chips * cap_back)

        def route(col, dtype):
            buf = jnp.zeros((n_chips * cap_back,), dtype).at[dest].set(
                jnp.take(col, order2).astype(dtype), mode="drop",
                unique_indices=True)
            return jax.lax.all_to_all(
                buf.reshape(n_chips, cap_back), axis, split_axis=0,
                concat_axis=0, tiled=False).reshape(-1)

        rg = route(g, jnp.int32)
        rcnt = route(cnt, jnp.int32)
        rval = route(val, val.dtype)
        # mark empty return slots: route a validity flag too
        rvalid = route(jnp.ones((m,), jnp.int32), jnp.int32)

        # 5. scatter into this chip's original row order
        local_rows = shard_len
        li = rg % local_rows
        li = jnp.where(rvalid > 0, li, local_rows)  # drop empty slots
        cnt_out = jnp.zeros((local_rows,), jnp.int32).at[li].set(
            rcnt, mode="drop")
        vals_out = jnp.zeros((local_rows,), rval.dtype).at[li].set(
            rval, mode="drop")
        return cnt_out, vals_out

    fn = shard_map(local_fn, mesh=mesh, in_specs=P(axis),
                   out_specs=(P(axis), P(axis)), check_vma=False)
    sharding = NamedSharding(mesh, P(axis))
    cnt, vals = fn(*(jax.device_put(a, sharding)
                     for a in (bcounts, bk, bv, pcounts, pk, pg)))
    if join_type == "semi":
        return cnt > 0
    if join_type == "anti":
        return cnt == 0
    if unique_build:
        return cnt > 0, vals
    return cnt, vals
