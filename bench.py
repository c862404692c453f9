#!/usr/bin/env python
"""Headline benchmark: one JSON line for the driver.

Methodology follows the reference's benchmark executables: throughput =
numel * runs / seconds with a host verification pass
(`src/benchmarks/clo_sort_bench.c:233-235`, `clo_scan_bench.c:278`).

Headline: flagship Pallas bitonic sort (abitonic) of 16M uint32 keys —
BASELINE.json config "LSD radix / bitonic sort" class. `vs_baseline` is the
speedup over XLA's own `lax.sort` on the same chip and data (the strongest
available vendor baseline; the reference publishes no numbers,
BASELINE.md). >1.0 means the framework's kernel beats the vendor sort.

Prints exactly ONE JSON line on stdout.
"""

import json
import sys


def main():
    import numpy as np
    import jax
    # Persistent compile cache: the fused sort kernels take ~2 min to build
    # on first use; later driver runs reuse them.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp
    from cl_ops_tpu.ops import sort as sort_mod

    from cl_ops_tpu.bench.common import time_adaptive

    n = 1 << 24
    x = jnp.asarray(np.random.RandomState(7).randint(
        0, 1 << 31, size=n, dtype=np.int64).astype(np.uint32))
    small_sum = jax.jit(lambda r: r[:8].astype(jnp.float32).sum())

    def timed(fn):
        out = fn(x)
        # RTT-amortizing batch depth (bench/common.py): the tunneled chip
        # adds ~7 ms/call of fixed overhead at shallow run counts.
        dt = time_adaptive(fn, (x,), lambda o: float(small_sum(o)))
        return dt, out

    # Use the autotuned geometry when this chip's sweep is already cached
    # (ops/sort/autotune.py persists winners per device/shape); never
    # trigger a sweep from the headline bench — a fresh sweep costs ~1 h
    # of tunneled compiles and can hang on a bad compile-helper day.
    opts = None
    try:
        from cl_ops_tpu.ops.sort.autotune import _load
        kind = jax.devices()[0].device_kind.replace(" ", "_")
        if f"{kind}:{n // 128}x1" in _load():
            opts = "autotune=1"
    except Exception:
        pass
    sorter = sort_mod.sort_new("abitonic", opts)
    dt_ours, out = timed(sorter.sort_with_device_data)
    ok = bool(np.all(np.diff(np.asarray(out).astype(np.int64)) >= 0))
    assert ok, "sort verification failed"

    dt_xla, _ = timed(jax.jit(jnp.sort))

    # Roofline accounting (VERDICT r1 item 4): model the schedule's HBM
    # traffic, report achieved GB/s and fraction of the measured ceiling.
    from cl_ops_tpu.bench.roofline import stream_ceiling_gbs
    from cl_ops_tpu.ops.sort.bitonic import abitonic_traffic_bytes
    bytes_moved = abitonic_traffic_bytes(
        n, 1, {"autotune": "1"} if opts else None)
    gb_s = bytes_moved / dt_ours / 1e9
    ceiling = stream_ceiling_gbs()

    mkeys = n / dt_ours / 1e6
    print(json.dumps({
        "metric": "abitonic_sort_u32_16M",
        "value": round(mkeys, 1),
        "unit": "Mkeys/s",
        "vs_baseline": round(dt_xla / dt_ours, 4),
        "gb_s": round(gb_s, 2),
        "roofline_frac": round(gb_s / ceiling, 3),
        "ceiling_gb_s": round(ceiling, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
