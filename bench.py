#!/usr/bin/env python
"""Headline benchmark: one JSON line for the driver.

Methodology follows the reference's benchmark executables
(`src/benchmarks/clo_scan_bench.c:278`, `clo_sort_bench.c:233-235`):
throughput = numel * runs / total_seconds, with a host verification pass.
The headline metric evolves with the framework build-out; `vs_baseline` is
the fraction of the north-star target (>= 0.8 of per-chip HBM roofline,
BASELINE.md) achieved, so 1.0 == target met.

Prints exactly ONE JSON line on stdout.
"""

import json
import sys
import time

import numpy as np


def _bench_scan(n=1 << 24, runs=10):
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)
    from cl_ops_tpu.ops import scan as scan_mod

    x = np.random.RandomState(7).randint(
        0, 1 << 32, size=n, dtype=np.uint64).astype(np.uint32)
    s = scan_mod.scan_new("blelloch")  # uint -> ulong, ref default pairing
    xd = jax.device_put(jnp.asarray(x))
    out = jax.block_until_ready(s.scan_with_device_data(xd))  # compile
    expect = np.cumsum(x.astype(np.uint64)) - x.astype(np.uint64)
    assert np.array_equal(np.asarray(out), expect), "scan verification failed"

    t0 = time.perf_counter()
    for _ in range(runs):
        out = s.scan_with_device_data(xd)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    mvalues_s = n * runs / dt / 1e6

    # North-star: >=80% of HBM roofline. v5e HBM ~819 GB/s; scan moves
    # 4B in + 8B out per element => roofline = 819e9/12 elem/s.
    roofline_mvalues = 819e9 / 12 / 1e6
    return {
        "metric": "scan_throughput_u32_to_u64_16M",
        "value": round(mvalues_s, 1),
        "unit": "MValues/s",
        "vs_baseline": round(mvalues_s / (0.8 * roofline_mvalues), 4),
    }


def main():
    result = _bench_scan()
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
