"""Pallas TPU bitonic compare-exchange kernel library.

TPU-native redesign of the reference's bitonic sorters
(`src/cl_ops/sort/clo_sort_sbitonic.cl:38-69`, `clo_sort_abitonic.cl`).
The reference's work-item compare-swap becomes whole-tile vector ops: data
lives as (rows, 128) i32 tiles in VMEM, and the XOR-partner exchange of a
bitonic step with distance J is one `tpu.dynamic_gather`
(jnp.take_along_axis with indices iota^J) along lanes (J < 128) or sublanes
(J >= 128), followed by a lexicographic compare and a masked select. Keys
are pre-normalized to signed-i32-ordered limbs (keys.py), so one kernel
serves all 11 key dtypes.

Two execution modes mirror the reference's two bitonic sorters:
  * single-step: one pallas_call per (stage K, step J) global pass — the
    structure of sbitonic's host loop (`clo_sort_sbitonic.c:102-118`).
  * fused: per-block multi-step kernels — a full in-VMEM block sort (all
    stages K <= B), then per merge stage one cross-block pass per J >= B
    plus ONE fused local kernel for all J < B — the strategy behind
    abitonic's local/private multi-step kernels
    (`clo_sort_abitonic.in.h:33-106`), with VMEM playing local memory.

All kernels operate on a tuple of i32 arrays: key limbs first, then optional
payload columns. By default every column joins the comparison (a total
comparator). num_keys restricts the compare chain to a leading prefix; the
XOR-partner exchanges then resolve prefix ties keep-self through the
(lt, le) pair from _lex_cmp — see its docstring for why strict-only tie
handling would duplicate rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cl_ops_tpu.utils.bits import is_po2, log2_floor, nlpo2

LANES = 128
MIN_ROWS = 8  # minimum sublane tile for i32
# v5e has 128 MiB of physical VMEM; Mosaic's default 16 MiB scoped limit is
# far below what big fused sort blocks want.
VMEM_LIMIT = 100 * 1024 * 1024


def _gather_lanes(a, idx_i32):
    """Lane-dim gather with explicit i32 indices.

    jnp.take_along_axis promotes indices to int64 under jax_enable_x64,
    which Mosaic rejects; issuing lax.gather directly with the exact
    dimension numbers Mosaic supports (tpu.dynamic_gather along dim 1)
    keeps indices i32.
    """
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    return jax.lax.gather(
        a, idx_i32[..., None], dnums, (1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def _lex_cmp(a: tuple, b: tuple, num_keys: int | None = None):
    """(a < b, a <= b) lexicographic over i32 limb tuples (signed order).

    num_keys compares only the first num_keys columns — later columns are
    PAYLOAD: they ride every exchange's gather/select but skip the
    compare chain (the sorts are VPU-bound, DESIGN.md §3, so dropping
    per-column compare ops is real time). Ties in the compared prefix
    are then possible, so every exchange resolves them KEEP-SELF via the
    (lt, le) pair: the XOR-partner forms evaluate the comparator
    independently on both sides, and the strict-only rule ("low takes
    partner on tie, high keeps self") would write the high row to BOTH
    slots — duplicating rows. With a total comparator le == lt and the
    pair reduces to the old behavior exactly. Rows with tied prefixes
    end in unspecified relative order but always move atomically;
    callers needing total order put a unique column (position) inside
    the key prefix.
    """
    if num_keys is not None:
        a = a[:num_keys]
        b = b[:num_keys]
    lt = a[0] < b[0]
    eq = a[0] == b[0]
    for aa, bb in zip(a[1:], b[1:]):
        lt = lt | (eq & (aa < bb))
        eq = eq & (aa == bb)
    return lt, lt | eq


def _lex_lt(a: tuple, b: tuple, num_keys: int | None = None):
    """Strict lexicographic a < b (see _lex_cmp)."""
    return _lex_cmp(a, b, num_keys)[0]


def _take_self(arrs: tuple, p: tuple, keep_min, num_keys):
    """Exchange keep-self mask for the XOR-partner forms.

    With a TOTAL comparator (num_keys None or covering every column) the
    cheap strict form suffices: ties imply fully identical rows, whose
    duplication is value-invisible. With a payload prefix the (lt, le)
    keep-self pair is REQUIRED (see _lex_cmp) and costs two extra vector
    ops per exchange — only pay them when payload columns exist (a
    measured ~10%% regression on the total-comparator sorts otherwise).
    Boolean algebra, not jnp.where: Mosaic rejects select_n on i1
    vectors ("Unsupported target bitwidth for truncation").
    """
    if num_keys is None or num_keys >= len(arrs):
        return keep_min == _lex_lt(arrs, p)
    lt, le = _lex_cmp(arrs, p, num_keys)
    return (keep_min & le) | jnp.logical_not(keep_min | lt)


def _flat_bit(shape, k_val, is_row_bit):
    """Boolean mask of bit (i & K) != 0 over flattened index i = r*128 + c."""
    if is_row_bit:
        rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        return (rows & k_val) != 0
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return (cols & k_val) != 0


def _cx_rows_dyn(arrs: tuple, asc_mask, j_rows, num_keys=None):
    """Compare-exchange at row distance j_rows (traced i32 power of 2)."""
    shape = arrs[0].shape
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    bit = (rows_iota & j_rows) != 0
    p = []
    for a in arrs:
        down = pltpu.roll(a, jnp.int32(shape[0]) - j_rows, 0)  # x[r + j]
        up = pltpu.roll(a, j_rows, 0)                          # x[r - j]
        p.append(jnp.where(bit, up, down))
    p = tuple(p)
    keep_min = jnp.logical_not(bit) == asc_mask
    take_self = _take_self(arrs, p, keep_min, num_keys)
    return tuple(jnp.where(take_self, a, pp) for a, pp in zip(arrs, p))


def _cx_lanes_dyn(arrs: tuple, asc_mask, j, num_keys=None):
    """Compare-exchange at lane distance j (traced i32 power of 2 < 128)."""
    shape = arrs[0].shape
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    idx = lane_iota ^ j
    p = tuple(_gather_lanes(a, idx) for a in arrs)
    keep_min = ((lane_iota & j) == 0) == asc_mask
    take_self = _take_self(arrs, p, keep_min, num_keys)
    return tuple(jnp.where(take_self, a, pp) for a, pp in zip(arrs, p))


def _cx_rows_grouped(arrs: tuple, j_rows: int, group_asc,
                      num_keys=None):
    """Static row-step: contiguous half-vs-half compare within 2j groups.

    A bitonic row step at distance j pairs the first j rows of every
    2j-row group with its last j rows — contiguous slices, so the exchange
    is two range-slices + min/max selects with NO rotates. Valid because
    the direction bit (i & K) is constant within a 2j group (j <= K/2
    always). group_asc(g) returns the (g, 1, 1) ascending mask per group.
    """
    r, lanes = arrs[0].shape
    g = r // (2 * j_rows)
    a3 = [a.reshape(g, 2 * j_rows, lanes) for a in arrs]
    lo = tuple(a[:, :j_rows] for a in a3)
    hi = tuple(a[:, j_rows:] for a in a3)
    lt = _lex_lt(lo, hi, num_keys)
    lo_takes_self = lt == group_asc(g)  # lo keeps the min in asc groups
    out = []
    for l, h in zip(lo, hi):
        nl = jnp.where(lo_takes_self, l, h)
        nh = jnp.where(lo_takes_self, h, l)
        out.append(jnp.concatenate([nl, nh], axis=1).reshape(r, lanes))
    return tuple(out)


def _local_steps(arrs: tuple, asc_mask, start_j: int, group_asc=None,
                 unroll_lanes: bool = True, num_keys=None):
    """All steps J = start_j .. 1 under one direction mask.

    Row steps (J >= 128) use the grouped half-block exchange (static). Lane
    steps (J <= 64): static seven-step unroll for compiled TPU kernels — a
    fori_loop's induction variable is i64 under x64 with concrete bounds
    (infinite recursion in Mosaic's convert lowering) and traced i32 bounds
    force slow dynamic while_loops. Interpret mode (CPU tests) keeps the
    fori_loop instead: per-test tracing of the full unroll dominates the
    suite, and CPU has no Mosaic to offend.
    """
    if group_asc is None:
        raise ValueError("row steps need an explicit group_asc")
    j = start_j
    while j >= LANES:
        jr = j // LANES
        arrs = _cx_rows_grouped(
            arrs, jr, lambda g, _jr=jr: group_asc(_jr, g),
            num_keys=num_keys)
        j //= 2
    if unroll_lanes:
        while j >= 1:
            arrs = _cx_lanes_dyn(arrs, asc_mask, j, num_keys)
            j //= 2
        return arrs
    lane_hi = log2_floor(max(j, 1))

    def lane_body(m, a):
        jj = jnp.int32(1) << (jnp.int32(lane_hi) - m.astype(jnp.int32))
        return _cx_lanes_dyn(a, asc_mask, jj, num_keys)

    return jax.lax.fori_loop(0, lane_hi + 1, lane_body, arrs)


def _stage_group_asc(k: int):
    """group_asc for a stage K < block: (group_index & K/groupsize) == 0."""
    def fn(j_rows, g):
        kg = k // (2 * j_rows * LANES)
        gi = jax.lax.broadcasted_iota(jnp.int32, (g, 1, 1), 0)
        return (gi & kg) == 0
    return fn


def _scalar_group_asc(asc_scalar):
    def fn(j_rows, g):
        return jnp.full((g, 1, 1), True) & asc_scalar
    return fn


def _local_sort_block(arrs: tuple, final_asc=None,
                      unroll_lanes: bool = True, num_keys=None):
    """Full bitonic sort of one (R,128) block (stages K=2..R*128).

    The direction of the final stage (K = block size) is the GLOBAL index
    bit (i & K), which is the block-parity bit when multiple blocks exist —
    callers pass it as `final_asc` (broadcastable mask); None means this
    block is the whole array (ascending).
    """
    n = arrs[0].shape[0] * LANES
    for sk in range(1, log2_floor(n) + 1):
        k = 1 << sk
        if k == n:
            scalar = True if final_asc is None else final_asc
            asc = jnp.full(arrs[0].shape, True) & scalar
            ga = _scalar_group_asc(scalar)
        else:
            asc = jnp.logical_not(
                _flat_bit(arrs[0].shape, k // LANES if k >= LANES else k,
                          k >= LANES))
            ga = _stage_group_asc(k)
        arrs = _local_steps(arrs, asc, k // 2, group_asc=ga,
                            unroll_lanes=unroll_lanes, num_keys=num_keys)
    return arrs


# --- kernels -----------------------------------------------------------------

def _block_sort_kernel(*refs, n_arrays: int, multi_block: bool,
                       unroll_lanes: bool = True, num_keys=None):
    ins, outs = refs[:n_arrays], refs[n_arrays:]
    arrs = tuple(r[...] for r in ins)
    if multi_block:
        # Alternate block directions: stage K = B's direction bit is the
        # block-index LSB (the bitonic precondition for the K = 2B merge).
        arrs = _local_sort_block(arrs, final_asc=(pl.program_id(0) & 1) == 0,
                                 unroll_lanes=unroll_lanes,
                                 num_keys=num_keys)
    else:
        arrs = _local_sort_block(arrs, unroll_lanes=unroll_lanes,
                                 num_keys=num_keys)
    for o, a in zip(outs, arrs):
        o[...] = a


def _block_merge_kernel(params_ref, *refs, n_arrays: int,
                        unroll_lanes: bool = True, num_keys=None):
    """Fused local merge: all steps J = B/2..1 of one stage K > B.

    Direction is uniform per block: asc = (block_index & k_blocks) == 0
    (K's bit lies above the block offset). k_blocks arrives via scalar
    prefetch — one compiled kernel serves every merge stage.
    """
    ins, outs = refs[:n_arrays], refs[n_arrays:]
    b = pl.program_id(0)
    asc_scalar = (b & params_ref[0]) == 0
    shape = ins[0].shape
    asc = jnp.full(shape, True) & asc_scalar
    arrs = tuple(r[...] for r in ins)
    arrs = _local_steps(arrs, asc, shape[0] * LANES // 2,
                        group_asc=_scalar_group_asc(asc_scalar),
                        unroll_lanes=unroll_lanes, num_keys=num_keys)
    for o, a in zip(outs, arrs):
        o[...] = a


def _cross_kernel(params_ref, *refs, n_arrays: int, num_keys=None):
    """One cross-block step with J >= B: block b exchanges with b ^ j_blocks.

    Each grid step reads its own block plus its XOR partner (J >= B flips
    only block-index bits, in-block offsets align) and writes only its own
    block: the min side if it is the lower partner of an ascending pair.
    params = [j_blocks, k_blocks] arrive via scalar prefetch so ONE compiled
    kernel serves every (stage, step) — with static params each combination
    was a separate multi-second remote Mosaic compile.
    """
    self_ins = refs[:n_arrays]
    part_ins = refs[n_arrays:2 * n_arrays]
    outs = refs[2 * n_arrays:]
    b = pl.program_id(0)
    j_blocks = params_ref[0]
    k_blocks = params_ref[1]
    is_lo = (b & j_blocks) == 0
    asc = (b & k_blocks) == 0
    keep_min = is_lo == asc
    s = tuple(r[...] for r in self_ins)
    p = tuple(r[...] for r in part_ins)
    take_self = _take_self(s, p, keep_min, num_keys)
    for o, a, pp in zip(outs, s, p):
        o[...] = jnp.where(take_self, a, pp)


def _single_step_kernel(params_ref, *refs, n_arrays: int, row_step: bool,
                        num_keys=None):
    """One global (K, J) pass with J < B, one block per grid step.

    params = [j (row units if row_step else lanes), k_block_units,
    k_in_block] via scalar prefetch: only TWO compiled kernels (row/lane
    regime) serve all O(log^2 n) sbitonic launches — static (K, J) made
    every step a separate remote Mosaic compile. Direction: when K spans
    blocks (k_block_units > 0) it is per-block (block_id & k_block_units);
    otherwise intra-block from k_in_block's bit of the flat index.
    """
    ins, outs = refs[:n_arrays], refs[n_arrays:]
    shape = ins[0].shape
    arrs = tuple(r[...] for r in ins)
    j = params_ref[0]
    k_blocks = params_ref[1]
    k_row_bit = params_ref[2]
    k_lane_bit = params_ref[3]
    b = pl.program_id(0)
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    # flat-index bit of K: block bit when K >= block, else row/lane bit
    # (bit positions precomputed on host — in-kernel // on prefetch scalars
    # hits a Mosaic lowering recursion; a scalar-cond vector select fails
    # to legalize, so the two direction sources blend with boolean algebra).
    use_block = k_blocks > 0
    asc_block = (b & k_blocks) == 0
    asc_elem = ((rows_iota & k_row_bit) | (cols_iota & k_lane_bit)) == 0
    asc = ((use_block & asc_block) | (jnp.logical_not(use_block) & asc_elem)
           ) | jnp.zeros(shape, jnp.bool_)
    if row_step:
        arrs = _cx_rows_dyn(arrs, asc, j, num_keys)
    else:
        arrs = _cx_lanes_dyn(arrs, asc, j, num_keys)
    for o, a in zip(outs, arrs):
        o[...] = a


# --- host orchestration ------------------------------------------------------

def _row_map(i, *prefetch):
    return (i, i * 0)  # i*0 avoids an i64 literal under x64


def _specs(n_arrays, block_rows):
    return [pl.BlockSpec((block_rows, LANES), _row_map,
                         memory_space=pltpu.VMEM) for _ in range(n_arrays)]


def _call_per_block(kernel, arrs2d, n_blocks, block_rows, interpret,
                    **kw):
    n_arrays = len(arrs2d)
    shapes = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrs2d)
    out = pl.pallas_call(
        functools.partial(kernel, n_arrays=n_arrays, **kw),
        grid=(n_blocks,),
        in_specs=_specs(n_arrays, block_rows),
        out_specs=tuple(_specs(n_arrays, block_rows)),
        out_shape=shapes,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(*arrs2d)
    return tuple(out)  # out_shape is a tuple, so pallas returns a sequence


def _call_merge(arrs2d, n_blocks, block_rows, k_blocks, interpret,
                num_keys=None):
    n_arrays = len(arrs2d)
    shapes = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrs2d)
    params = jnp.array([k_blocks], jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=_specs(n_arrays, block_rows),
        out_specs=tuple(_specs(n_arrays, block_rows)),
    )
    out = pl.pallas_call(
        functools.partial(_block_merge_kernel, n_arrays=n_arrays,
                          unroll_lanes=not interpret, num_keys=num_keys),
        grid_spec=grid_spec,
        out_shape=shapes,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(params, *arrs2d)
    return tuple(out)


def _call_single_step(arrs2d, n_blocks, block_rows, k, j, interpret,
                      num_keys=None):
    n_arrays = len(arrs2d)
    shapes = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrs2d)
    block_elems = block_rows * LANES
    row_step = j >= LANES
    # encode K: block-units bit when K >= block (direction uniform per
    # block), else the in-block K value split into row/lane bit parts.
    k_blocks = k // block_elems if k >= block_elems else 0
    k_row_bit = k // LANES if (k < block_elems and k >= LANES) else 0
    k_lane_bit = k if k < LANES else 0
    params = jnp.array([j // LANES if row_step else j, k_blocks,
                        k_row_bit, k_lane_bit], jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=_specs(n_arrays, block_rows),
        out_specs=tuple(_specs(n_arrays, block_rows)),
    )
    out = pl.pallas_call(
        functools.partial(_single_step_kernel, n_arrays=n_arrays,
                          row_step=row_step, num_keys=num_keys),
        grid_spec=grid_spec,
        out_shape=shapes,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(params, *arrs2d)
    return tuple(out)


def _call_cross(arrs2d, n_blocks, block_rows, j_blocks, k_blocks, interpret,
                num_keys=None):
    n_arrays = len(arrs2d)
    shapes = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrs2d)
    params = jnp.array([j_blocks, k_blocks], jnp.int32)

    def self_map(g, prm):
        return (g, g * 0)

    def part_map(g, prm):
        return (g ^ prm[0], g * 0)

    def spec(m):
        return pl.BlockSpec((block_rows, LANES), m, memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[spec(self_map) for _ in range(n_arrays)]
        + [spec(part_map) for _ in range(n_arrays)],
        out_specs=tuple(spec(self_map) for _ in range(n_arrays)),
    )
    out = pl.pallas_call(
        functools.partial(_cross_kernel, n_arrays=n_arrays,
                          num_keys=num_keys),
        grid_spec=grid_spec,
        out_shape=shapes,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(params, *arrs2d, *arrs2d)
    return tuple(out)


def _pair_cross_kernel(params_ref, *refs, n_arrays: int, two_j: int,
                       num_keys=None):
    """Cross-block step writing BOTH partners: 2 HBM sweeps, not 3.

    The plain cross kernel reads self + partner but writes only self, so a
    level costs read 2n + write n. Here the host reshapes the (R, 128)
    arrays to (S, 2, j, C, 128) — the pair axis (dim 1) IS the XOR bit at
    distance j C-blocks — and each grid step's block holds both partners,
    writing read n + write n. The analog of the reference's multi-step
    kernels consuming global steps with fewer memory trips
    (`clo_sort_abitonic.in.h:33-106`).

    params = [k_blocks] (stage direction bit, C-block units) via scalar
    prefetch; two_j = 2*j is static per (S, j) shape. Direction of the
    flat lo block b = s*2j + l is (b & k) == 0 = ((s*2j) & k) == 0 since
    k >= 2j > l.
    """
    ins, outs = refs[:n_arrays], refs[n_arrays:]
    s = pl.program_id(0)
    k_blocks = params_ref[0]
    asc = ((s * two_j) & k_blocks) == 0
    lo = tuple(r[0, 0, 0] for r in ins)
    hi = tuple(r[0, 1, 0] for r in ins)
    lt = _lex_lt(lo, hi, num_keys)
    lo_takes_self = lt == asc  # lo keeps the min in ascending pairs
    for o, l, h in zip(outs, lo, hi):
        o[0, 0, 0] = jnp.where(lo_takes_self, l, h)
        o[0, 1, 0] = jnp.where(lo_takes_self, h, l)


def _call_pair_cross(arrs2d, c_rows, j_c, k_c, interpret, num_keys=None):
    """One cross level at distance j_c C-blocks, pair-structured."""
    n_arrays = len(arrs2d)
    total_rows = arrs2d[0].shape[0]
    s_dim = total_rows // (2 * j_c * c_rows)
    shape5 = (s_dim, 2, j_c, c_rows, LANES)
    a5 = [a.reshape(shape5) for a in arrs2d]
    params = jnp.array([k_c], jnp.int32)

    def imap(s, l, prm):
        # s*0, not literal 0: under x64 a literal traces as i64, which the
        # Mosaic index-map lowering rejects (same trap as _row_map).
        z = s * 0
        return (s, z, l, z, z)

    spec = pl.BlockSpec((1, 2, 1, c_rows, LANES), imap,
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s_dim, j_c),
        in_specs=[spec] * n_arrays,
        out_specs=tuple([spec] * n_arrays),
    )
    out = pl.pallas_call(
        functools.partial(_pair_cross_kernel, n_arrays=n_arrays,
                          two_j=2 * j_c, num_keys=num_keys),
        grid_spec=grid_spec,
        out_shape=tuple(jax.ShapeDtypeStruct(shape5, a.dtype) for a in a5),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(params, *a5)
    return tuple(o.reshape(total_rows, LANES) for o in out)


def _local_steps_dyn(arrs: tuple, asc_mask, start_j: int, num_keys=None):
    """All steps J = start_j .. 1 under one direction mask, loop-traced.

    The whole-VMEM single-launch sort cannot statically unroll its
    O(log^2 n) steps (the MLIR blow-up that capped the unrolled block sort
    at 512 rows, ops/exec/psort.py) — instead TWO fori_loops per stage
    carry a traced power-of-two distance: row steps (J >= 128) through
    _cx_rows_dyn (dynamic-roll partner fetch), lane steps through
    _cx_lanes_dyn (dynamic-gather). Both dynamic helpers are the ones the
    single-step sbitonic kernels already run compiled on v5e. Loop bounds
    are pinned i32 (python-int bounds trace an i64 induction variable
    under x64, which recurses Mosaic's convert lowering).
    """
    hi = log2_floor(start_j)
    if hi >= 7:  # row steps: J = 2^hi .. 2^7
        def row_body(m, a):
            jr = jnp.int32(1) << (jnp.int32(hi - 7) - m)  # J / 128
            return _cx_rows_dyn(a, asc_mask, jr, num_keys)
        arrs = jax.lax.fori_loop(jnp.int32(0), jnp.int32(hi - 6), row_body,
                                 arrs)
    lane_hi = min(hi, 6)

    def lane_body(m, a):
        jj = jnp.int32(1) << (jnp.int32(lane_hi) - m)
        return _cx_lanes_dyn(a, asc_mask, jj, num_keys)

    return jax.lax.fori_loop(jnp.int32(0), jnp.int32(lane_hi + 1),
                             lane_body, arrs)


def _vmem_sort_kernel(*refs, n_arrays: int, num_keys=None):
    """Whole-array bitonic sort in ONE launch (grid=()): n <= VMEM.

    The small-n answer to the launch-bound fused schedule (~30 dispatches
    at 1M cost more than the sort itself): every stage runs loop-traced
    steps over the full (rows, 128) resident array. Stage direction masks
    are static per stage (the python stage loop is unrolled — log2(n)
    stages of two fori_loops keeps the MLIR small). The analog of the
    reference's private-memory multi-step kernels consuming many steps per
    launch (`clo_sort_abitonic.in.h:33-106`), taken to the whole problem.
    """
    ins, outs = refs[:n_arrays], refs[n_arrays:]
    arrs = tuple(r[...] for r in ins)
    shape = arrs[0].shape
    n = shape[0] * LANES
    for sk in range(1, log2_floor(n) + 1):
        k = 1 << sk
        if k == n:
            asc = jnp.full(shape, True)
        else:
            asc = jnp.logical_not(
                _flat_bit(shape, k // LANES if k >= LANES else k,
                          k >= LANES))
        arrs = _local_steps_dyn(arrs, asc, k // 2, num_keys)
    for o, a in zip(outs, arrs):
        o[...] = a


# rows * n_arrays bound for the auto single-launch path: 16384 rows of
# (128, i32) per array = 8 MiB in + 8 MiB out + loop temporaries, well
# inside the 100 MiB scoped VMEM limit.
SINGLE_LAUNCH_MAX_ROWS = 16384


def _multi_stage_kernel(*refs, n_arrays: int, start_k: int,
                        multi_block: bool, unroll_lanes: bool = True,
                        num_keys=None):
    """Fused run of ALL bitonic stages K = start_k .. block size.

    Used as a second tier above _block_sort_kernel: a bigger VMEM block
    absorbs several merge stages per launch, cutting the number of HBM
    sweeps (the same economics as the reference's hybrid multi-step kernels
    vs per-step launches, `clo_sort_abitonic.in.h:33-106`). The top stage's
    direction is this block's parity bit when more blocks follow.
    """
    ins, outs = refs[:n_arrays], refs[n_arrays:]
    arrs = tuple(r[...] for r in ins)
    shape = arrs[0].shape
    n_blk = shape[0] * LANES
    k = start_k
    while k <= n_blk:
        if k == n_blk and multi_block:
            scalar = (pl.program_id(0) & 1) == 0
            asc = jnp.full(shape, True) & scalar
            ga = _scalar_group_asc(scalar)
        elif k == n_blk:
            asc = jnp.full(shape, True)
            ga = _scalar_group_asc(True)
        else:
            asc = jnp.logical_not(
                _flat_bit(shape, k // LANES if k >= LANES else k,
                          k >= LANES))
            ga = _stage_group_asc(k)
        arrs = _local_steps(arrs, asc, k // 2, group_asc=ga,
                            unroll_lanes=unroll_lanes)
        k *= 2
    for o, a in zip(outs, arrs):
        o[...] = a


def bitonic_sort_2d(arrs2d: tuple, *, block_rows: int, fused: bool,
                    interpret: bool, merge_rows: int | None = None,
                    single_launch: bool | None = None,
                    num_keys: int | None = None):
    """Sort po2-length flattened (rows,128) limb arrays ascending.

    Returns reordered arrays (same shapes). arrs2d rows must be a multiple
    of block_rows and total length po2. In fused mode, merge_rows (>=
    block_rows) sets a second, larger block tier used for merge stages —
    fewer, fatter launches. single_launch forces (True) or suppresses
    (False) the whole-VMEM one-kernel sort; None auto-enables it when the
    fused schedule would be multi-launch but the whole problem fits
    SINGLE_LAUNCH_MAX_ROWS (the launch-bound small-n regime).
    """
    total_rows = arrs2d[0].shape[0]
    n = total_rows * LANES
    n_blocks = total_rows // block_rows
    block_elems = block_rows * LANES
    assert is_po2(n) and is_po2(block_elems) and n % block_elems == 0

    if fused:
        if single_launch is None:
            # Auto resolves to OFF: on v5e the whole-VMEM loop-traced kernel
            # measured 19.0 ms vs 1.3 ms for the two-tier schedule at 8192
            # rows (r4) — traced-J steps pay dynamic lane gathers every
            # step, where the unrolled kernels get static shifts. The
            # launch-count argument it was built on was a measurement
            # artifact of shallow timing batches over the tunnel RTT
            # (bench/common.py time_adaptive). Opt in via single_launch=1;
            # the autotuner still competes it per shape.
            single_launch = False
        if single_launch:
            return _call_per_block(_vmem_sort_kernel, arrs2d, 1, total_rows,
                                   interpret, num_keys=num_keys)
        arrs2d = _call_per_block(_block_sort_kernel, arrs2d, n_blocks,
                                 block_rows, interpret,
                                 multi_block=n_blocks > 1,
                                 unroll_lanes=not interpret,
                                 num_keys=num_keys)
        mr = min(merge_rows or block_rows, total_rows)
        assert is_po2(mr) and mr >= block_rows
        if mr > block_rows:
            n2 = total_rows // mr
            arrs2d = _call_per_block(
                _multi_stage_kernel, arrs2d, n2, mr, interpret,
                start_k=2 * block_elems, multi_block=n2 > 1,
                unroll_lanes=not interpret, num_keys=num_keys)
        else:
            n2 = n_blocks
        merge_elems = mr * LANES
        # cross levels run pair-structured at half-merge granularity: the
        # level J = merge_elems pairs adjacent C-blocks (j_c = 2), deeper
        # levels pair at j_c = 2J/merge_elems — every level 2 HBM sweeps.
        c_rows = mr // 2
        c_elems = c_rows * LANES
        use_pair = c_rows >= MIN_ROWS  # sublane tile floor is (8, 128)
        for sk in range(log2_floor(merge_elems) + 1, log2_floor(n) + 1):
            k = 1 << sk
            j = k // 2
            while j >= merge_elems:
                if use_pair:
                    arrs2d = _call_pair_cross(arrs2d, c_rows, j // c_elems,
                                              k // c_elems, interpret,
                                              num_keys=num_keys)
                else:
                    arrs2d = _call_cross(arrs2d, n2, mr, j // merge_elems,
                                         k // merge_elems, interpret,
                                         num_keys=num_keys)
                j //= 2
            arrs2d = _call_merge(arrs2d, n2, mr, k // merge_elems,
                                 interpret, num_keys=num_keys)
        return arrs2d

    # single-step mode: one launch per (K, J) — sbitonic parity.
    for sk in range(1, log2_floor(n) + 1):
        k = 1 << sk
        j = k // 2
        while j >= 1:
            if j >= block_elems:
                arrs2d = _call_cross(arrs2d, n_blocks, block_rows,
                                     j // block_elems, k // block_elems,
                                     interpret, num_keys=num_keys)
            else:
                arrs2d = _call_single_step(arrs2d, n_blocks, block_rows,
                                           k, j, interpret,
                                           num_keys=num_keys)
            j //= 2
    return arrs2d


def fused_traffic_bytes(n_padded: int, n_arrays: int, block_rows: int,
                        merge_rows: int | None,
                        single_launch: bool | None = None) -> int:
    """HBM bytes the fused schedule moves, mirroring bitonic_sort_2d.

    Per launch: block/merge kernels and pair-structured cross levels all
    read + write every array exactly once (2x). Used for the bench
    roofline accounting (bench/roofline.py) — keep in lockstep with the
    fused branch of bitonic_sort_2d, including the single_launch
    resolution (None = the same auto rule; pass the resolved flag when
    the caller forced or tuned it).
    """
    per = n_padded * 4 * n_arrays
    total_rows = n_padded // LANES
    if single_launch is None:
        single_launch = False  # lockstep with bitonic_sort_2d's auto = off
    if single_launch:
        return 2 * per  # single-launch whole-VMEM sort: one sweep
    n = n_padded
    b = 2 * per  # block sort
    mr = min(merge_rows or block_rows, total_rows)
    if mr > block_rows:
        b += 2 * per  # multi-stage tier
    merge_elems = mr * LANES
    for sk in range(log2_floor(merge_elems) + 1, log2_floor(n) + 1):
        k = 1 << sk
        b += 2 * per * (sk - log2_floor(merge_elems))  # cross levels
        b += 2 * per  # merge
    return b


def merge_traffic_bytes(n_padded: int, n_arrays: int,
                        block_rows: int) -> int:
    """HBM bytes of bitonic_merge_2d (pair crosses + one merge pass)."""
    per = n_padded * 4 * n_arrays
    levels = log2_floor(max(n_padded // (block_rows * LANES), 1))
    return (levels + 1) * 2 * per


def pad_and_reshape(arrs, pad_values, min_rows=MIN_ROWS):
    """Pad 1-D arrays to a shared po2 length >= min_rows*128, reshape 2D."""
    n = arrs[0].shape[0]
    padded = max(nlpo2(n), min_rows * LANES)
    out = []
    for a, pv in zip(arrs, pad_values):
        if padded != n:
            a = jnp.pad(a, (0, padded - n), constant_values=pv)
        out.append(a.reshape(padded // LANES, LANES))
    return tuple(out), padded


def bitonic_merge_2d(arrs2d: tuple, *, block_rows: int, interpret: bool,
                     num_keys: int | None = None):
    """Ascending bitonic merge of one whole bitonic sequence.

    Used by the distributed sort (parallel/sort.py) to restore local order
    after a chip-level compare-split; k_blocks=0 makes every direction test
    (b & 0) == 0 come out ascending. Cross levels are pair-structured
    (j_c >= 1 — adjacent pairs at the last level).
    """
    total_rows = arrs2d[0].shape[0]
    n = total_rows * LANES
    n_blocks = total_rows // block_rows
    block_elems = block_rows * LANES
    assert is_po2(n) and n % block_elems == 0
    j = n // 2
    while j >= block_elems:
        arrs2d = _call_pair_cross(arrs2d, block_rows, j // block_elems,
                                  0, interpret, num_keys=num_keys)
        j //= 2
    return _call_merge(arrs2d, n_blocks, block_rows, 0, interpret,
                       num_keys=num_keys)
