"""Pallas TPU prefix-sum (scan) kernels.

TPU-native redesign of the reference's Blelloch scan
(`src/cl_ops/scan/clo_scan_blelloch.cl:49-211`). The reference needs three
kernel launches (per-workgroup scan -> scan of workgroup totals -> uniform
add) because OpenCL workgroups run concurrently with no cross-group order.
On TPU, Pallas grid steps execute *sequentially* on a core, so the whole
hierarchy collapses into ONE single-pass kernel: a grid loop over HBM blocks
carrying the running total in VMEM scratch — each element is read once and
written once, which is the HBM-bandwidth speed of light for scan. This is the
structural analog of the reference's per-workgroup serial block loop
(`clo_scan_blelloch.cl:70-120` carries `in_sum` across blocks) promoted to the
whole array.

In-block scan runs on the VPU as a rows-by-lanes 2D decomposition: cumsum
along lanes, then cumsum of row totals, then broadcast add — the same
up-sweep/down-sweep work the reference does in local memory
(`clo_scan_blelloch.cl:76-115`), expressed as dense vector ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cl_ops_tpu.utils.bits import cdiv

LANES = 128


def _block_inclusive_scan(block_2d):
    """Inclusive prefix sum of a (rows, LANES) block in row-major order."""
    lane_scan = jnp.cumsum(block_2d, axis=1)
    row_totals = lane_scan[:, -1:]
    row_prefix = jnp.cumsum(row_totals, axis=0) - row_totals  # exclusive
    return lane_scan + row_prefix


def _scan_kernel(x_ref, out_ref, carry_ref, *, exclusive: bool, sum_dtype):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        carry_ref[0, 0] = jnp.zeros((), sum_dtype)

    x = x_ref[...].astype(sum_dtype)
    incl = _block_inclusive_scan(x)
    carry = carry_ref[0, 0]
    if exclusive:
        # exclusive = inclusive - x: exact for modular integer arithmetic.
        out_ref[...] = incl + carry - x
    else:
        out_ref[...] = incl + carry
    carry_ref[0, 0] = carry + incl[-1, -1]


@functools.partial(
    jax.jit,
    static_argnames=("sum_dtype", "exclusive", "block_rows", "interpret"))
def scan_1d(x, *, sum_dtype, exclusive=True, block_rows=512, interpret=False):
    """Single-pass grid-carry prefix sum over a 1-D array.

    Args:
      x: 1-D input of any length (padded internally to a block multiple;
        the reference instead restricts sizes / pads with nlpo2).
      sum_dtype: accumulator/output dtype (the ref's CLO_SCAN_SUM_TYPE,
        clo_scan_abstract.c:122-125).
      exclusive: exclusive (Blelloch) semantics like the reference; False
        gives inclusive.
      block_rows: sublane rows per grid block; block covers block_rows*128
        elements of VMEM per step.
    """
    n = x.shape[0]
    sum_dtype = jnp.dtype(sum_dtype)
    block_elems = block_rows * LANES
    n_blocks = max(cdiv(n, block_elems), 1)
    padded = n_blocks * block_elems
    if padded != n:
        x = jnp.pad(x, (0, padded - n))  # zeros are scan-neutral
    x2 = x.reshape(n_blocks * block_rows, LANES)

    out = pl.pallas_call(
        functools.partial(_scan_kernel, exclusive=exclusive,
                          sum_dtype=sum_dtype),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * block_rows, LANES),
                                       sum_dtype),
        scratch_shapes=[pltpu.SMEM((1, 1), sum_dtype)],
        interpret=interpret,
    )(x2)
    return out.reshape(padded)[:n]
