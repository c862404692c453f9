"""Benchmark harness shared pieces.

Parity with the reference's bench common module (`src/benchmarks/clo_bench.c`):
typed random fill (`clo_bench_rand`, clo_bench.c:67-142), typed comparator
(`clo_bench_compare`, clo_bench.c:31-65), plus the throughput formula and TSV
output shared by all three CLIs (`clo_sort_bench.c:233-249`).

Timing note: the tunneled single-chip setup makes per-call blocking reads
dominated by RTT, so `time_async` queues `runs` executions and forces
completion with one tiny on-device reduction readback — the moral equivalent
of the reference's event-sum profiling (`ccl_prof`, clo_sort_bench.c:201-208)
rather than wall-clock-per-call.
"""

from __future__ import annotations

import time

import numpy as np


def rand_array(dtype, n: int, seed: int = 0) -> np.ndarray:
    """Typed random values covering the type's range (clo_bench_rand parity).

    Integer types draw uniformly over their full range; floats draw normal
    scaled values like the reference's g_rand_double ranges.
    """
    rng = np.random.RandomState(seed)
    dt = np.dtype(dtype)
    if dt.kind in "ui" and dt.itemsize == 8:
        # Compose 64-bit draws from two 32-bit halves: a single randint is
        # capped below 2^63, which would never set the top bit of u64 data
        # (leaving the high-limb sign-flip path untested/unbenchmarked).
        lo = rng.randint(0, 2 ** 32, size=n, dtype=np.uint64)
        hi = rng.randint(0, 2 ** 32, size=n, dtype=np.uint64)
        return (lo | (hi << np.uint64(32))).view(np.uint64).astype(dt) \
            if dt.kind == "u" else (lo | (hi << np.uint64(32))).view(np.int64)
    if dt.kind == "u":
        bits = 8 * dt.itemsize
        return rng.randint(0, 2 ** bits, size=n,
                           dtype=np.uint64).astype(dt)
    if dt.kind == "i":
        lim = 2 ** (8 * dt.itemsize - 1)
        return rng.randint(-lim, lim, size=n, dtype=np.int64).astype(dt)
    return (rng.randn(n) * 128).astype(dt)


def compare_values(a, b) -> int:
    """Three-way compare (clo_bench_compare parity)."""
    return int(a > b) - int(a < b)


def time_async(fn, args, runs: int, sync_fn) -> float:
    """Queue `runs` calls of fn(*args), sync once; return seconds total."""
    out = fn(*args)
    sync_fn(out)  # warm/compile
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(*args)
    sync_fn(out)
    return time.perf_counter() - t0


def time_adaptive(fn, args, sync_fn, *, min_runs: int = 5,
                  target_s: float = 2.0, max_runs: int = 400) -> float:
    """Per-call seconds with RTT-amortizing run depth.

    The tunneled chip adds a fixed sync round trip (~70 ms) per measured
    batch plus a ~2 ms enqueue floor per call; at small problem sizes a
    shallow batch measures mostly that overhead (a 1M-key sort reads 7.5 ms
    at runs=5 but 1.3 ms at runs=50). So: measure one batch of `min_runs`,
    and if it finished well under `target_s`, re-measure with the run count
    that fills the target window. Same formula as the reference
    (numel*runs/seconds, `clo_sort_bench.c:233-235`) — only the batch depth
    adapts.
    """
    dt = time_async(fn, args, min_runs, sync_fn) / min_runs
    if dt * min_runs >= target_s:
        return dt
    runs = min(max_runs, max(min_runs, int(target_s / max(dt, 1e-7))))
    if runs <= min_runs:
        return dt
    return time_async(fn, args, runs, sync_fn) / runs


def throughput_m(numel: int, runs: int, seconds: float) -> float:
    """Mkeys/s | MValues/s: 1e-6 * numel * runs / seconds
    (clo_sort_bench.c:233-235)."""
    return 1e-6 * numel * runs / seconds


def write_tsv(path: str, rows: list[dict]) -> None:
    """TSV output like the reference benches (clo_sort_bench.c:239-249)."""
    if not rows:
        return
    cols = list(rows[0].keys())
    with open(path, "w") as f:
        f.write("\t".join(cols) + "\n")
        for r in rows:
            f.write("\t".join(str(r[c]) for c in cols) + "\n")


def default_sync():
    """A sync that reads back 8 leading elements reduced to one scalar."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def small_sum(r):
        if r.ndim == 0:
            return r.astype(jnp.float32)
        return r[:8].astype(jnp.float32).sum()

    def sync(out):
        if isinstance(out, tuple):
            out = out[0]
        return float(small_sum(out))
    return sync
