"""Binned-DMA radix scatter building block — SURVEY §7's named hard part.

The reference's satradix scatter is one global-memory random write per
element (`clo_sort_satradix.cl:224-258`). SURVEY §7 prescribes the TPU
redesign: "in-VMEM binning + blocked writes rather than random global
scatter". After a per-block stable digit sort, every (block, digit) pair's
rows form one contiguous RUN in the block-sorted array, and the runs'
global destinations (from the scanned counters) are contiguous per run —
so the scatter reduces to copying ~R*n_blocks runs of elements to computed
offsets: exactly the "blocked writes".

This module implements those blocked writes as `chunk_copy`: a Pallas
kernel whose grid walks fixed-size chunks and whose BlockSpec index maps
are driven by scalar-prefetched per-chunk tables (the bandprobe DMA-window
technique). Sources are element-unaligned (run boundaries fall anywhere),
so each chunk reads TWO consecutive C-row source blocks and realigns
in-register (row roll + lane gather pair); destinations are quantized to
chunk multiples, and the quantization slack plus copy tails are filled
with an i32-max sentinel so downstream passes can treat pads as
largest-key rows.

Measured verdict (bench/radix_dma_probe.py, v5e): the copy itself is fast,
but a radix PASS needs a stable local placement first, and on TPU the only
vector-unit placement primitive is a sorting network — per-pass local
sorts already cost what the full bitonic sort costs (docs/DESIGN.md §3
carries the measured numbers). The kernel stays as the measurement
artifact and as a general run-copy primitive.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cl_ops_tpu.ops.sort.bitonic_kernels import _gather_lanes

LANES = 128
C_ROWS = 8                # chunk = C_ROWS x 128 elements
CHUNK = C_ROWS * LANES
_SENT = 0x7FFFFFFF


def _chunk_copy_kernel(params_ref, *refs, n_arrays: int):
    """Copy one realigned chunk per grid step.

    params rows: [src_cblk, roll_rows, lane_shift, rem, dst_cblk] per
    chunk (only the scalars for THIS chunk are read). Inputs arrive as
    two consecutive C-row source blocks per array (index maps below);
    output is one C-row block at the quantized destination.
    """
    ins_a = refs[:n_arrays]
    ins_b = refs[n_arrays:2 * n_arrays]
    outs = refs[2 * n_arrays:]
    c = pl.program_id(0)
    roll_rows = params_ref[1, c]
    lane_shift = params_ref[2, c]
    rem = params_ref[3, c]
    lane = jax.lax.broadcasted_iota(jnp.int32, (C_ROWS, LANES), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (C_ROWS, LANES), 0)
    flat = row * LANES + lane
    src_lane = (lane + lane_shift) % LANES
    wraps = (lane + lane_shift) >= LANES
    tail = flat >= rem
    for a, b, o in zip(ins_a, ins_b, outs):
        w = jnp.concatenate([a[...], b[...]], axis=0)        # (2C, 128)
        # rows r of the output come from w rows r + roll_rows (+1 on lane
        # wrap); pltpu.roll(x, s) moves row r to r+s, so shift by -roll.
        w0 = pltpu.roll(w, (jnp.int32(2 * C_ROWS) - roll_rows)
                        % jnp.int32(2 * C_ROWS), 0)[:C_ROWS]
        w1 = pltpu.roll(w, (jnp.int32(2 * C_ROWS) - roll_rows - 1)
                        % jnp.int32(2 * C_ROWS), 0)[:C_ROWS]
        same = _gather_lanes(w0, src_lane)
        bump = _gather_lanes(w1, src_lane)
        v = jnp.where(wraps, bump, same)
        o[...] = jnp.where(tail, jnp.int32(_SENT), v)


@functools.partial(jax.jit, static_argnames=("n_chunks", "interpret"))
def chunk_copy(arrs2d, params, *, n_chunks: int, interpret: bool = False):
    """Blocked-write scatter: move `n_chunks` CHUNK-sized runs.

    arrs2d: tuple of (rows, 128) i32 source arrays (flattened row-major
      element order, rows a multiple of C_ROWS).
    params: (5, n_chunks) i32 — [src C-block, row roll, lane shift,
      valid elements (tail past it becomes the i32-max sentinel),
      dst C-block]. Destinations must be a permutation of 0..n_chunks-1
      (every output block written exactly once).

    Returns same-shaped arrays of n_chunks blocks.
    """
    n_arrays = len(arrs2d)
    out_rows = n_chunks * C_ROWS
    max_blk = arrs2d[0].shape[0] // C_ROWS - 1

    def src_a(i, prm):
        return (jnp.minimum(prm[0, i], max_blk), i * 0)

    def src_b(i, prm):
        return (jnp.minimum(prm[0, i] + 1, max_blk), i * 0)

    def dst(i, prm):
        return (prm[4, i], i * 0)

    def spec(m):
        return pl.BlockSpec((C_ROWS, LANES), m, memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[spec(src_a)] * n_arrays + [spec(src_b)] * n_arrays,
        out_specs=tuple(spec(dst) for _ in range(n_arrays)),
    )
    out = pl.pallas_call(
        functools.partial(_chunk_copy_kernel, n_arrays=n_arrays),
        grid_spec=grid_spec,
        out_shape=tuple(jax.ShapeDtypeStruct((out_rows, LANES), jnp.int32)
                        for _ in range(n_arrays)),
        interpret=interpret,
    )(params, *arrs2d, *arrs2d)
    return tuple(out)


@functools.partial(jax.jit, static_argnames=("n_chunks_static",))
def plan_run_chunks(src_starts, dst_qstarts, lengths, *,
                    n_chunks_static: int):
    """Chunk tables for `chunk_copy` from run metadata (all element units).

    src_starts/lengths describe runs in the source; dst_qstarts are the
    CHUNK-quantized destination bases (caller computes them as the
    exclusive scan of ceil(lengths/CHUNK)*CHUNK). n_chunks_static bounds
    total chunks (= total_elems/CHUNK + n_runs covers any split). Unused
    chunk slots fill the leftover destination blocks with whole-sentinel
    chunks, so every output block is written exactly once.
    """
    qchunks = (lengths + (CHUNK - 1)) // CHUNK
    qend = jnp.cumsum(qchunks)
    qstart = qend - qchunks
    total_valid = qend[-1] if qend.shape[0] else jnp.int32(0)
    c = jnp.arange(n_chunks_static, dtype=jnp.int32)
    valid = c < total_valid
    run = jnp.searchsorted(qend, c, side="right").astype(jnp.int32)
    runc = jnp.minimum(run, qend.shape[0] - 1)
    within = c - jnp.take(qstart, runc)
    src_elem = jnp.take(src_starts, runc) + within * CHUNK
    rem = jnp.clip(jnp.take(lengths, runc) - within * CHUNK, 0, CHUNK)
    dst_blk_valid = jnp.take(dst_qstarts, runc) // CHUNK + within
    # invalid chunk j (j counted among invalid slots) fills leftover dst
    # block total_valid + rank-of-invalid
    inv_rank = jnp.cumsum(jnp.logical_not(valid).astype(jnp.int32)) - 1
    dst_blk = jnp.where(valid, dst_blk_valid, total_valid + inv_rank)
    src_elem = jnp.where(valid, src_elem, 0)
    rem = jnp.where(valid, rem, 0)
    return jnp.stack([src_elem // CHUNK,
                      (src_elem % CHUNK) // LANES,
                      src_elem % LANES,
                      rem,
                      dst_blk]).astype(jnp.int32)
