"""Pallas TPU prefix-sum (scan) kernels.

TPU-native redesign of the reference's Blelloch scan
(`src/cl_ops/scan/clo_scan_blelloch.cl:49-211`). The reference needs three
kernel launches (per-workgroup scan -> scan of workgroup totals -> uniform
add) because OpenCL workgroups run concurrently with no cross-group order.
On TPU, Pallas grid steps execute *sequentially* on a core, so the whole
hierarchy collapses into ONE single-pass kernel: a grid loop over HBM blocks
carrying the running total in SMEM scratch — each element is read once and
written once, which is the HBM-bandwidth speed of light for scan. This is the
structural analog of the reference's per-workgroup serial block loop
(`clo_scan_blelloch.cl:70-120` carries `in_sum` across blocks) promoted to the
whole array.

In-block scan runs on the VPU as a rows-by-lanes 2D decomposition: cumsum
along lanes, then cumsum of row totals, then broadcast add — the same
up-sweep/down-sweep work the reference does in local memory
(`clo_scan_blelloch.cl:76-115`), expressed as dense vector ops.

64-bit sums (the reference's default uint->ulong widening,
`clo_scan_bench.c:26-31`) need special handling: Mosaic on TPU has no 64-bit
registers, so the wide path emulates u64/i64 with two u32 limbs. Each limb is
further split into 16-bit halves so block cumsums stay exact in i32
(block <= 2^15 elements => half-sums < 2^31); limbs are recombined with
explicit carry propagation. The same limb kernel runs under interpret mode on
CPU so tests exercise the real TPU code path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cl_ops_tpu.utils.bits import cdiv

LANES = 128
# Wide (64-bit-sum) blocks must stay <= 2^15 elements so 16-bit-half cumsums
# remain exact in i32 (32768 * 65535 < 2^31).
MAX_WIDE_ROWS = 256

# Plain ints (not jnp constants) so kernels don't capture tracers.
_I32_MIN = -0x80000000
_MASK16 = 0xFFFF


def _cumsum_axis(x, axis):
    """Inclusive prefix sum along `axis` via Hillis-Steele log-shift adds.

    Mosaic has no cumsum primitive, so the scan is log2(n) rounds of
    roll-and-masked-add — the in-register analog of the reference's local-mem
    up/down-sweep (`clo_scan_blelloch.cl:76-115`), but running on full VPU
    vectors instead of a work-group tree.
    """
    n = x.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    k = 1
    while k < n:
        # int32 shift: under x64 a python int would become an i64 operand,
        # which tpu.dynamic_rotate rejects.
        shifted = pltpu.roll(x, jnp.int32(k), axis)
        x = x + jnp.where(idx >= k, shifted, jnp.zeros_like(x))
        k *= 2
    return x


def _block_inclusive_scan(block_2d):
    """Inclusive prefix sum of a (rows, LANES) block in row-major order.

    The row-totals scan runs on totals reshaped into full 128-lane rows:
    scanning an (R,1) column directly wastes 127/128 of every vreg (TPU
    vregs are 8x128), which made the totals pass as expensive as the main
    lane pass.
    """
    lane_scan = _cumsum_axis(block_2d, 1)
    r = block_2d.shape[0]
    row_totals = lane_scan[:, LANES - 1:]
    if r >= LANES and r % LANES == 0:
        t2 = row_totals.reshape(r // LANES, LANES)
        t2s = _cumsum_axis(t2, 1)
        chunk_tot = t2s[:, LANES - 1:]
        chunk_prefix = _cumsum_axis(chunk_tot, 0) - chunk_tot
        incl_tot = t2s + chunk_prefix
        row_prefix = incl_tot.reshape(r, 1) - row_totals
    else:
        row_prefix = _cumsum_axis(row_totals, 0) - row_totals  # exclusive
    return lane_scan + row_prefix


def _ult(x, y):
    """Unsigned 32-bit x < y computed on i32 values (sign-flip trick)."""
    return ((x ^ _I32_MIN) < (y ^ _I32_MIN)).astype(jnp.int32)


# --- narrow path: sums fit a 32-bit (or native float) register ---------------

def _scan_kernel(x_ref, out_ref, carry_ref, *, exclusive: bool, compute_dtype,
                 out_dtype):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        carry_ref[0, 0] = jnp.zeros((), compute_dtype)

    x = x_ref[...].astype(compute_dtype)
    incl = _block_inclusive_scan(x)
    carry = carry_ref[0, 0]
    if exclusive:
        # exclusive = inclusive - x: exact for modular integer arithmetic.
        out_ref[...] = (incl + carry - x).astype(out_dtype)
    else:
        out_ref[...] = (incl + carry).astype(out_dtype)
    r, c = incl.shape
    carry_ref[0, 0] = carry + incl[r - 1, c - 1]


# --- wide path: 64-bit sums as two u32 limbs ---------------------------------

def _scan_u32_mod(x_i32):
    """Exact-mod-2^32 inclusive block scan of u32 values held in i32 lanes.

    Splits into 16-bit halves (a = low, b = high), scans each exactly in i32,
    recombines: sum = (a & 0xffff) | ((a>>16 + b) << 16) with carry-out
    (a>>16 + b) >> 16. Returns (sum_mod_2^32 as i32, carry_out as i32).
    """
    a = _block_inclusive_scan(x_i32 & _MASK16)
    b = _block_inclusive_scan((x_i32 >> 16) & _MASK16)
    t = (a >> 16) + b
    word = (a & _MASK16) | ((t & _MASK16) << 16)
    carry = t >> 16
    return word, carry


def _wide_scan_kernel(lo_ref, hi_ref, out_lo_ref, out_hi_ref, carry_ref, *,
                      exclusive: bool):
    """Grid-carry scan of 64-bit values given as (lo, hi) u32-in-i32 limbs."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        carry_ref[0] = 0
        carry_ref[1] = 0

    xlo = lo_ref[...]
    xhi = hi_ref[...]
    word_lo, carry_lo = _scan_u32_mod(xlo)
    word_hi, _ = _scan_u32_mod(xhi)  # high-limb overflow drops (mod 2^64)
    word_hi = word_hi + carry_lo

    run_lo = carry_ref[0]
    run_hi = carry_ref[1]
    incl_lo = word_lo + run_lo
    incl_hi = word_hi + run_hi + _ult(incl_lo, run_lo)

    r, c = incl_lo.shape
    carry_ref[0] = incl_lo[r - 1, c - 1]
    carry_ref[1] = incl_hi[r - 1, c - 1]

    if exclusive:
        out_lo = incl_lo - xlo
        out_hi = incl_hi - xhi - _ult(incl_lo, xlo)
    else:
        out_lo, out_hi = incl_lo, incl_hi
    out_lo_ref[...] = out_lo
    out_hi_ref[...] = out_hi


def _to_limbs(x):
    """Split ints to (lo, hi) u32-bit-pattern limbs held as i32 (two's compl)."""
    dt = jnp.dtype(x.dtype)
    if dt.itemsize == 8:
        u = jax.lax.bitcast_convert_type(x, jnp.uint64)
        lo = (u & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        hi = (u >> jnp.uint64(32)).astype(jnp.uint32)
        return (jax.lax.bitcast_convert_type(lo, jnp.int32),
                jax.lax.bitcast_convert_type(hi, jnp.int32))
    if dt.kind == "u":
        lo = jax.lax.bitcast_convert_type(x.astype(jnp.uint32), jnp.int32)
        return lo, jnp.zeros_like(lo)
    lo = x.astype(jnp.int32)
    hi = lo >> 31  # sign extension: 0 or -1
    return lo, hi


def _from_limbs(lo_i32, hi_i32, sum_dtype):
    u = (jax.lax.bitcast_convert_type(lo_i32, jnp.uint32).astype(jnp.uint64)
         | (jax.lax.bitcast_convert_type(hi_i32, jnp.uint32).astype(jnp.uint64)
            << jnp.uint64(32)))
    if jnp.dtype(sum_dtype) == jnp.int64:
        return jax.lax.bitcast_convert_type(u, jnp.int64)
    return u.astype(sum_dtype)


def _row_block_index_map(i):
    # (i, i * 0) not (i, 0): under x64 a literal 0 traces as i64, which the
    # Mosaic index-map lowering rejects.
    return (i, i * 0)


def _pad_2d(x, block_rows, pad_value=0):
    n = x.shape[0]
    block_elems = block_rows * LANES
    n_blocks = max(cdiv(n, block_elems), 1)
    padded = n_blocks * block_elems
    if padded != n:
        x = jnp.pad(x, (0, padded - n), constant_values=pad_value)
    return x.reshape(n_blocks * block_rows, LANES), n_blocks


@functools.partial(
    jax.jit,
    static_argnames=("sum_dtype", "exclusive", "block_rows", "interpret"))
def scan_1d(x, *, sum_dtype, exclusive=True, block_rows=512, interpret=False):
    """Single-pass grid-carry prefix sum over a 1-D array.

    Args:
      x: 1-D input of any length (padded internally to a block multiple;
        the reference instead restricts sizes / pads with nlpo2).
      sum_dtype: accumulator/output dtype (the ref's CLO_SCAN_SUM_TYPE,
        clo_scan_abstract.c:122-125). 64-bit integer sums use the two-limb
        emulation path; float64 falls back to an XLA cumsum (no f64 on the
        TPU VPU).
      exclusive: exclusive (Blelloch) semantics like the reference; False
        gives inclusive.
      block_rows: sublane rows per grid block; block covers block_rows*128
        elements of VMEM per step.
    """
    n = x.shape[0]
    sum_dtype = jnp.dtype(sum_dtype)

    if sum_dtype.kind in "iu" and sum_dtype.itemsize == 8:
        return _scan_1d_wide(x, sum_dtype, exclusive,
                             min(block_rows, MAX_WIDE_ROWS), interpret)[:n]

    if sum_dtype == jnp.float64:
        acc = jnp.cumsum(x.astype(sum_dtype))
        return acc - x.astype(sum_dtype) if exclusive else acc

    # Narrow ints accumulate in i32 (wrapping matches truncation); 32-bit and
    # float types accumulate natively.
    if sum_dtype.kind in "iu" and sum_dtype.itemsize < 4:
        compute_dtype = jnp.dtype(jnp.int32)
    else:
        compute_dtype = sum_dtype

    x2, n_blocks = _pad_2d(x, block_rows)
    out = pl.pallas_call(
        functools.partial(_scan_kernel, exclusive=exclusive,
                          compute_dtype=compute_dtype, out_dtype=sum_dtype),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((block_rows, LANES), _row_block_index_map,
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_rows, LANES), _row_block_index_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * block_rows, LANES),
                                       sum_dtype),
        scratch_shapes=[pltpu.SMEM((1, 1), compute_dtype)],
        interpret=interpret,
    )(x2)
    return out.reshape(-1)[:n]


def _scan_1d_wide(x, sum_dtype, exclusive, block_rows, interpret):
    lo, hi = _to_limbs(x)
    lo2, n_blocks = _pad_2d(lo, block_rows)
    hi2, _ = _pad_2d(hi, block_rows)
    spec = pl.BlockSpec((block_rows, LANES), _row_block_index_map,
                        memory_space=pltpu.VMEM)
    out_lo, out_hi = pl.pallas_call(
        functools.partial(_wide_scan_kernel, exclusive=exclusive),
        grid=(n_blocks,),
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((n_blocks * block_rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks * block_rows, LANES), jnp.int32),
        ),
        scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
        interpret=interpret,
    )(lo2, hi2)
    return _from_limbs(out_lo.reshape(-1), out_hi.reshape(-1), sum_dtype)
