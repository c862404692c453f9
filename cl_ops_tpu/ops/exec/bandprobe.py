"""Banded join probe: per-probe binary search over DMA'd build bands.

The probe side of the join wants, per probe key p, the searchsorted-right
count (#build rows <= p) plus the matching build value. TPUs have no
cross-vreg dynamic gather (tpu.dynamic_gather spans at most one 128-lane
vreg — measured on v5e: C=128 works, C=1024 fails in Mosaic), so a
VMEM-resident table cannot be binary-searched directly. Instead:

  * probes are sorted (psort), so each 64K-probe block touches a narrow,
    contiguous BAND of the sorted build side;
  * the band start per block is precomputed on the host at build-block
    granularity and fed through scalar prefetch — the band blocks' index
    maps read it, so Pallas DMAs exactly the needed build rows (the
    reference's cq_exec/cq_comm compute/copy split played by the Pallas
    pipeline itself, `src/cl_ops/sort/clo_sort_abstract.in.h:125-133`);
  * in-kernel, the pulled band (<= 128 rows x 128 lanes) is transposed
    with exact 16-bit-half MXU matmuls so both search levels gather along
    lanes within one vreg: a 7-step binary search over row-last keys finds
    the boundary row, then a 128-step lane sweep accumulates the in-row
    count and the match value/equality.

Build sides of <= 16384 rows skip the probe sort entirely (the band is the
whole table and covers any probe order) — the dimension-table fast path:
no probe sort, no restore sort, probes stream in original order.

Band overflow (a probe block whose build range exceeds the pulled window —
extreme skew) is detected host-side from block-boundary keys; callers fall
back to the merge-structured probe (join.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cl_ops_tpu.ops.sort.bitonic_kernels import VMEM_LIMIT, _gather_lanes

LANES = 128
WB = 32                   # build rows per band block
PULL = 4                  # band blocks pulled per probe block
BR = WB * PULL            # band rows in VMEM (must stay <= 128: one vreg)
WBE = WB * LANES          # elements per band block
DIRECT_MAX = BR * LANES   # build rows coverable without sorting probes
PROBE_ROWS = 512          # probe rows per grid step (64K probes)

_I32_MAX = 0x7FFFFFFF


def _t128_exact(a_i32):
    """Exact transpose of a (128, 128) i32 tile via 16-bit-half matmuls.

    transpose(A)[i, j] = sum_k A[k, i] * I[k, j]: contracting dim 0 of both
    operands puts A through the MXU stationary-transposed. Each 16-bit half
    is exact in f32 (single-term dot), and Precision.HIGHEST stops the MXU
    demoting f32 to bf16.
    """
    eye = (jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
           ).astype(jnp.float32)
    dn = (((0,), (0,)), ((), ()))

    def tr16(h):
        return jax.lax.dot_general(
            h.astype(jnp.float32), eye, dn,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32).astype(jnp.int32)

    lo = tr16(a_i32 & 0xFFFF)
    hi = tr16((a_i32 >> 16) & 0xFFFF)
    return lo | (hi << 16)


def _lex_lt_eq(ks, ps):
    """(strict-less, equal) of gathered key limbs vs probe limbs."""
    lt = ks[0] < ps[0]
    eq = ks[0] == ps[0]
    for k, p in zip(ks[1:], ps[1:]):
        lt = lt | (eq & (k < p))
        eq = eq & (k == p)
    return lt, eq


def _probe_band_kernel(starts_ref, nb_ref, *refs, n_limbs: int,
                       n_vals: int = 1):
    """Count + match-value search of one probe block against its band.

    refs = probe limbs (probe_rows, 128) * n_limbs,
           band blocks: for each of n_limbs+n_vals arrays (limbs then
             value columns), PULL refs of (WB, 128),
           outs: count, eq, then val_prev and val_next per value column
             (probe_rows, 128).
    count is GLOBAL (band offset added); val_prev[k] = vals_k[count-1],
    val_next[k] = vals_k[count]. val_next is garbage when count == nb
    (callers never use it there).
    """
    ps = tuple(r[...] for r in refs[:n_limbs])
    band_refs = refs[n_limbs:n_limbs + (n_limbs + n_vals) * PULL]
    outs = refs[n_limbs + (n_limbs + n_vals) * PULL:]
    out_count, out_eq = outs[0], outs[1]
    out_vps = outs[2:2 + n_vals]
    out_vns = outs[2 + n_vals:]
    i = pl.program_id(0)
    offs = starts_ref[i] * jnp.int32(WBE)
    nb = nb_ref[0]

    # Assemble and transpose each band array: bandT[l, r] = band[r, l].
    bandT = []
    for a in range(n_limbs + n_vals):
        blocks = [band_refs[a * PULL + t][...] for t in range(PULL)]
        band = jnp.concatenate(blocks, axis=0)  # (BR, 128)
        if BR < LANES:
            band = jnp.pad(band, ((0, LANES - BR), (0, 0)),
                           constant_values=_I32_MAX)
        bandT.append(_t128_exact(band))
    keyT = bandT[:n_limbs]
    valTs = bandT[n_limbs:]

    shape = ps[0].shape
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 1)

    def bcast_row(tarr, r):
        # row r of a transposed band, broadcast over the probe tile rows
        return jnp.broadcast_to(tarr[r:r + 1, :], shape)

    rowlast = [bcast_row(t, LANES - 1) for t in keyT]  # band[r, 127] at lane r
    rowlast_vs = [bcast_row(t, LANES - 1) for t in valTs]

    # Level 1: boundary row cr = #rows whose LAST element is "le" p, where
    # le is (key < p) | (key == p & element index real). Rows containing
    # pads have a pad last element (never le), so fully-counted rows are
    # fully real.
    cr = jnp.zeros(shape, jnp.int32)
    half = LANES // 2
    while half >= 1:
        mid = cr + jnp.int32(half - 1)
        ks = [_gather_lanes(r, mid) for r in rowlast]
        lt, eq = _lex_lt_eq(ks, ps)
        real = (offs + mid * LANES + jnp.int32(LANES - 1)) < nb
        le = lt | (eq & real)
        cr = jnp.where(le, cr + jnp.int32(half), cr)
        half //= 2

    in_band = cr < jnp.int32(BR)
    crc = jnp.minimum(cr, jnp.int32(BR - 1))

    # Pre-seed values/equality from the last element of row cr-1 (covers
    # partial == 0, where the match candidate sits one row up).
    prev_r = jnp.maximum(cr - 1, 0)
    kprev = [_gather_lanes(r, prev_r) for r in rowlast]
    _, eq_prev = _lex_lt_eq(kprev, ps)
    has_prev = cr > 0
    # i32 mask, not bool: blending bool vectors with jnp.where lowers to an
    # i8->i1 trunci Mosaic rejects ("Unsupported target bitwidth").
    eq_acc = (eq_prev & has_prev).astype(jnp.int32)
    # count == 0 contract: val_prev = vals[0] (callers only read val_prev
    # where eq, but the searchsorted parity tests pin vals[max(count-1,0)])
    zero = lane_iota * 0
    vp_accs = [jnp.where(has_prev, _gather_lanes(rv, prev_r),
                         _gather_lanes(bcast_row(vt, 0), zero))
               for rv, vt in zip(rowlast_vs, valTs)]

    # Level 2: lane sweep of the boundary row. le is monotone along l, so
    # "where(le, ...)" tracking lands on the last match; val_next comes
    # from the first non-le lane (or row cr+1 lane 0 if the row is all-le).
    cnt = jnp.zeros(shape, jnp.int32)
    vn_accs = [jnp.zeros(shape, jnp.int32) for _ in valTs]
    vn_done = jnp.zeros(shape, jnp.bool_)
    for l in range(LANES):
        ks = [_gather_lanes(bcast_row(t, l), crc) for t in keyT]
        vs = [_gather_lanes(bcast_row(t, l), crc) for t in valTs]
        lt, eq = _lex_lt_eq(ks, ps)
        real = (offs + crc * LANES + jnp.int32(l)) < nb
        le = (lt | (eq & real)) & in_band
        cnt = cnt + le.astype(jnp.int32)
        eq_acc = jnp.where(le, eq.astype(jnp.int32), eq_acc)
        take_vn = jnp.logical_not(le) & jnp.logical_not(vn_done) & in_band
        for k, v in enumerate(vs):
            vp_accs[k] = jnp.where(le, v, vp_accs[k])
            vn_accs[k] = jnp.where(take_vn, v, vn_accs[k])
        vn_done = vn_done | jnp.logical_not(le)

    # All 128 lanes le: the next element is row cr+1, lane 0.
    next_r = jnp.minimum(cr + 1, jnp.int32(LANES - 1))
    for k, vt in enumerate(valTs):
        vn_row0 = _gather_lanes(bcast_row(vt, 0), next_r)
        vn_accs[k] = jnp.where(vn_done, vn_accs[k], vn_row0)

    out_count[...] = offs + cr * jnp.int32(LANES) + cnt
    out_eq[...] = eq_acc
    for o, a in zip(out_vps, vp_accs):
        o[...] = a
    for o, a in zip(out_vns, vn_accs):
        o[...] = a


def band_pass_traffic_bytes(m: int, n_limbs: int,
                            probe_rows: int = PROBE_ROWS,
                            n_vals: int = 1) -> int:
    """HBM bytes of one band-kernel pass over m probes.

    Reads the probe limbs, DMAs one PULL-block band window per probe
    block per array (limbs + value columns), writes the 2 + 2*n_vals
    i32 outputs."""
    block = probe_rows * LANES
    grid = (m + block - 1) // block
    band = grid * PULL * WBE * (n_limbs + n_vals) * 4
    return n_limbs * 4 * m + band + (2 + 2 * n_vals) * 4 * m


def _as_vals_tuple(build_vals):
    """Accept one value array or a tuple of them."""
    return build_vals if isinstance(build_vals, tuple) else (build_vals,)


def _pad_build(build_limbs, vals, min_blocks=PULL):
    nb = build_limbs[0].shape[0]
    nbb = max((nb + WBE - 1) // WBE, min_blocks)
    padded = nbb * WBE
    bl = tuple(jnp.pad(b, (0, padded - nb), constant_values=_I32_MAX)
               for b in build_limbs)
    bv = tuple(jnp.pad(v, (0, padded - nb)) for v in vals)
    return bl, bv, nbb


def _pad_probes(probe_limbs, pad_val=_I32_MAX, probe_rows=PROBE_ROWS):
    m = probe_limbs[0].shape[0]
    block = probe_rows * LANES
    mp = ((m + block - 1) // block) * block
    cols = tuple(jnp.pad(c, (0, mp - m), constant_values=pad_val)
                 .reshape(mp // LANES, LANES) for c in probe_limbs)
    return cols, mp // block


def _call_band(build2d, probes2d, starts, nb, n_limbs, grid, interpret,
               probe_rows=PROBE_ROWS):
    """Launch the band kernel. build2d: per-array (rows,128); probes2d:
    per-limb (grid*probe_rows, 128); starts: (grid,) band-block starts."""

    def probe_map(i, st, nbr):
        return (i, i * 0)

    def band_map_t(t):
        def m(i, st, nbr):
            return (st[i] + t, i * 0)
        return m

    p_spec = pl.BlockSpec((probe_rows, LANES), probe_map,
                          memory_space=pltpu.VMEM)
    band_specs = []
    band_args = []
    for arr in build2d:
        for t in range(PULL):
            band_specs.append(pl.BlockSpec((WB, LANES), band_map_t(t),
                                           memory_space=pltpu.VMEM))
            band_args.append(arr)
    n_vals = len(build2d) - n_limbs
    n_out = 2 + 2 * n_vals
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid,),
        in_specs=[p_spec] * n_limbs + band_specs,
        out_specs=tuple([p_spec] * n_out),
    )
    outs = pl.pallas_call(
        functools.partial(_probe_band_kernel, n_limbs=n_limbs,
                          n_vals=n_vals),
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct(probes2d[0].shape, jnp.int32)
            for _ in range(n_out)),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(starts, nb, *probes2d, *band_args)
    return outs


@functools.partial(jax.jit, static_argnames=("interpret",))
def probe_direct(build_limbs, build_vals_i32, probe_limbs,
                 *, interpret: bool = False):
    """Unsorted-probe search against a small (<= DIRECT_MAX) build side.

    The band is the whole build table, so probes stream in ORIGINAL order:
    no probe sort, no restore sort. Returns (count, eq, val_prev,
    val_next) per probe — searchsorted-right semantics as in
    _probe_band_kernel.
    """
    nb = build_limbs[0].shape[0]
    m = probe_limbs[0].shape[0]
    assert nb <= DIRECT_MAX, "build too large for the direct band probe"
    n_limbs = len(build_limbs)
    vals = _as_vals_tuple(build_vals_i32)
    bl, bv, _ = _pad_build(build_limbs, vals)
    build2d = [b.reshape(-1, LANES) for b in (*bl, *bv)]
    probes2d, grid = _pad_probes(probe_limbs)
    starts = jnp.zeros((grid,), jnp.int32)
    outs = _call_band(build2d, probes2d, starts,
                      jnp.array([nb], jnp.int32), n_limbs, grid, interpret)
    flat = [o.reshape(-1)[:m] for o in outs]
    count, eq = flat[0], flat[1] != 0
    vps = tuple(flat[2:2 + len(vals)])
    vns = tuple(flat[2 + len(vals):])
    if not isinstance(build_vals_i32, tuple):
        return count, eq, vps[0], vns[0]
    return count, eq, vps, vns


@functools.partial(jax.jit, static_argnames=("interpret", "probe_rows"))
def probe_banded_sorted(build_limbs, build_vals_i32, sp_limbs,
                        *, interpret: bool = False,
                        probe_rows: int = PROBE_ROWS,
                        block_bounds=None):
    """Search SORTED probes against an arbitrarily large sorted build.

    Band starts are computed at build-block granularity from block-first
    keys: start[i] = (#build blocks whose first key <= block i's first
    probe) - 1, clamped. Returns (count, eq, val_prev, val_next) per
    SORTED probe plus `overflow`: True when some probe block's build range
    exceeds the pulled window (extreme skew) — results are then unusable
    and the caller must fall back to the merge probe.

    REQUIRES monotone non-decreasing queries unless `block_bounds` is
    given: each block's window start comes from its FIRST query and the
    overflow test uses its LAST query, so a query that dips BELOW an
    earlier query of its block can fall below the window and silently
    return the window-start value (count/val garbage, overflow False).
    Callers with non-monotone queries (the join expansion's pass-2 build
    positions dip back at duplicate probe keys) must pass `block_bounds =
    (lo_limbs, hi_limbs)`: per-limb `(grid,)` arrays bounding every real
    query of probe block i inclusively as lo[i] <= q <= hi[i], with
    grid = ceil(m / (probe_rows*128)). Window starts then derive from lo
    (start block's first key <= lo, so no query is below the window) and
    the overflow test from hi.

    probe_rows sets the probe block (probe_rows*128 probes per grid
    step). Smaller blocks span fewer build rows per step — the join
    expansion uses 128 (16K outputs/step <= the 16K-element window, so
    dense expansions never overflow) at the cost of 4x band re-DMA.
    """
    nb = build_limbs[0].shape[0]
    m = sp_limbs[0].shape[0]
    n_limbs = len(build_limbs)
    vals = _as_vals_tuple(build_vals_i32)
    bl, bv, nbb = _pad_build(build_limbs, vals)
    build2d = [b.reshape(-1, LANES) for b in (*bl, *bv)]
    probes2d, grid = _pad_probes(sp_limbs, probe_rows=probe_rows)

    # Block-boundary metadata (tiny): F/L = first/last key per build
    # block; firstp/lastp = first/last REAL key per probe block (or the
    # caller's explicit lo/hi bounds for non-monotone queries).
    fs = [b.reshape(nbb, WBE)[:, 0] for b in bl]
    ls = [b.reshape(nbb, WBE)[:, -1] for b in bl]
    block = probe_rows * LANES
    if block_bounds is None:
        firsts = [c.reshape(-1)[::block] for c in probes2d]
        # last real probe per block (pads are i32-max and would force
        # every window to the build end)
        last_real = jnp.minimum(
            (jnp.arange(grid, dtype=jnp.int32) + 1) * block, m) - 1
        lasts = [c[last_real] for c in sp_limbs]
    else:
        firsts = [jnp.asarray(b) for b in block_bounds[0]]
        lasts = [jnp.asarray(b) for b in block_bounds[1]]

    def lex_le(a_limbs, b_limbs):
        lt = a_limbs[0] < b_limbs[0]
        eq = a_limbs[0] == b_limbs[0]
        for a, b in zip(a_limbs[1:], b_limbs[1:]):
            lt = lt | (eq & (a < b))
            eq = eq & (a == b)
        return lt | eq

    fcol = [f[:, None] for f in fs]
    cb = jnp.sum(lex_le(fcol, [f[None, :] for f in firsts]),
                 axis=0).astype(jnp.int32)
    nbb_real = (nb + WBE - 1) // WBE
    starts = jnp.clip(cb - 1, 0, max(nbb - PULL, 0))
    # overflow: real build rows remain beyond the window AND the window's
    # very last key is <= the block's last probe. The second clause is
    # deliberately strict (not just "first key beyond <= lastp"): it
    # guarantees the first build element GREATER than any probe of the
    # block — the val_next target of _probe_sorted_multi's lower-bound
    # pass — is itself inside the window whenever it exists.
    wlast = jnp.minimum(starts + PULL, nbb) - 1
    w_end = [l[wlast] for l in ls]
    beyond = (starts + PULL) < nbb_real
    ovf = beyond & lex_le([w[:, None] for w in w_end],
                          [l[:, None] for l in lasts])[:, 0]
    overflow = jnp.any(ovf)

    outs = _call_band(build2d, probes2d, starts,
                      jnp.array([nb], jnp.int32), n_limbs, grid, interpret,
                      probe_rows=probe_rows)
    flat = [o.reshape(-1)[:m] for o in outs]
    count, eq = flat[0], flat[1] != 0
    vps = tuple(flat[2:2 + len(vals)])
    vns = tuple(flat[2 + len(vals):])
    if not isinstance(build_vals_i32, tuple):
        return count, eq, vps[0], vns[0], overflow
    return count, eq, vps, vns, overflow
