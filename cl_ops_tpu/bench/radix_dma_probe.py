"""Kernel-level measurement of the binned-DMA radix pass (SURVEY §7).

Times the two halves of the in-kernel binned-DMA radix scatter on real
hardware and prints the per-pass envelope against the abitonic flagship:

  phase1_localsort — per-block stable digit sort (the in-VMEM binning):
      the fused block-sort kernel on (digit-combined key, payload), one
      launch, the cheapest vector-unit stable placement TPU offers.
  phase1_rankhist  — the satradix rank/histogram kernel (counter input
      for the run bases).
  phase2_chunkcopy — the blocked writes: dma_scatter.chunk_copy moving a
      radix-16 run decomposition (R * n_blocks runs) to quantized bases.

Envelope: pass_time ~= phase1_localsort + counters_scan(tiny) +
phase2_chunkcopy; u32 needs key_bits/log2(R) passes. Compare against the
measured abitonic 16M number (BENCH_ALL.json). Run:
    python -m cl_ops_tpu.bench.radix_dma_probe -n 24 --radix 16
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-n", "--log2n", type=int, default=24)
    ap.add_argument("--radix", type=int, default=16)
    ap.add_argument("--block-rows", type=int, default=512)
    ap.add_argument("-r", "--runs", type=int, default=10)
    args = ap.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp
    from cl_ops_tpu.utils.platform import honor_env_platform
    honor_env_platform()
    from cl_ops_tpu.bench import common
    from cl_ops_tpu.ops.sort import bitonic_kernels as bk
    from cl_ops_tpu.ops.sort import dma_scatter as ds
    from cl_ops_tpu.ops.sort import satradix as sr

    n = 1 << args.log2n
    R = args.radix
    br = args.block_rows
    block_elems = br * bk.LANES
    nb = n // block_elems
    rng = np.random.RandomState(0)
    keys = rng.randint(0, 1 << 31, size=n, dtype=np.int64).astype(np.int32)
    digits = (keys & (R - 1)).astype(np.int32)
    sync = common.default_sync()
    out = {}

    # phase 1a: block-local stable digit sort — combined (digit, pos) key
    # + one payload column, sorted INSIDE each block (one launch)
    pos = np.arange(n, dtype=np.int64) % block_elems
    comb = jnp.asarray((digits.astype(np.int64) * block_elems
                        + pos).astype(np.int32))
    payload = jnp.asarray(keys)

    @jax.jit
    def local_sort(c, p):
        c2 = c.reshape(-1, bk.LANES)
        p2 = p.reshape(-1, bk.LANES)
        o = bk._call_per_block(bk._block_sort_kernel, (c2, p2), nb, br,
                               False, multi_block=False, unroll_lanes=True)
        return o[0].reshape(-1), o[1].reshape(-1)

    t = common.time_async(lambda c, p: local_sort(c, p)[1],
                          (comb, payload), args.runs, sync)
    out["phase1_localsort_ms"] = t / args.runs * 1e3

    # phase 1b: rank/hist kernel (counters input)
    d2 = jnp.asarray(digits).reshape(-1, bk.LANES)
    t = common.time_async(
        lambda d: sr._rank_and_hist(d, nbins=R, block_rows=br,
                                    interpret=False)[0],
        (d2,), args.runs, sync)
    out["phase1_rankhist_ms"] = t / args.runs * 1e3

    # phase 2: chunk copy of the radix-16 run decomposition. Uniform
    # digits -> R*nb runs of ~block_elems/R elements.
    hist = np.zeros((nb, R), np.int64)
    dd = digits.reshape(nb, block_elems)
    for b in range(nb):
        hist[b] = np.bincount(dd[b], minlength=R)
    off_in_block = np.cumsum(hist, axis=1) - hist
    starts = (np.arange(nb)[:, None] * block_elems
              + off_in_block).T.reshape(-1)  # digit-major run order
    lengths = hist.T.reshape(-1)
    qlen = ((lengths + ds.CHUNK - 1) // ds.CHUNK) * ds.CHUNK
    qstarts = np.cumsum(qlen) - qlen
    n_runs = R * nb
    n_chunks = n // ds.CHUNK + n_runs
    params = ds.plan_run_chunks(
        jnp.asarray(starts.astype(np.int32)),
        jnp.asarray(qstarts.astype(np.int32)),
        jnp.asarray(lengths.astype(np.int32)), n_chunks_static=n_chunks)
    params.block_until_ready()
    src2d = (jnp.asarray(keys).reshape(-1, bk.LANES),)

    t = common.time_async(
        lambda a, prm: ds.chunk_copy((a,), prm, n_chunks=n_chunks,
                                     interpret=False)[0],
        (src2d[0], params), args.runs, sync)
    out["phase2_chunkcopy_ms"] = t / args.runs * 1e3
    out["phase2_gb_s"] = 2 * n_chunks * ds.CHUNK * 4 / (t / args.runs) / 1e9
    out["phase2_us_per_chunk"] = t / args.runs / n_chunks * 1e6
    out["quant_overhead_frac"] = float(qlen.sum() - lengths.sum()) / n

    import math
    passes = math.ceil(32 / math.log2(R))
    pass_ms = out["phase1_localsort_ms"] + out["phase2_chunkcopy_ms"]
    out["envelope_pass_ms"] = pass_ms
    out["envelope_sort_ms"] = pass_ms * passes
    out["envelope_mkeys_s"] = n / (pass_ms * passes / 1e3) / 1e6
    out.update(n=n, radix=R, nb=nb, n_runs=n_runs, n_chunks=n_chunks,
               passes=passes)
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in out.items()}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
