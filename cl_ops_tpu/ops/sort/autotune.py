"""On-chip strategy autotuner for the fused bitonic.

Reference analog: abitonic's per-step kernel strategy — a lookup table
plus live device probing (`src/cl_ops/sort/clo_sort_abitonic.c:58-313`,
table at :66-133). The TPU equivalent tunes the two-tier geometry
(block_rows, merge_rows): it measures the fused schedule over a small
candidate grid ONCE per (rows, n_arrays, device) on the real chip and
persists winners to a JSON cache, so later sorter objects pay nothing.

Opt in with the reference-style option string: sort_new("abitonic",
"autotune=1"). Each candidate costs a fresh kernel compile (minutes on a
tunneled chip the first time) — the cache is the point.
"""

from __future__ import annotations

import json
import os
import time

_CACHE_ENV = "CL_OPS_AUTOTUNE_CACHE"
_DEFAULT_CACHE = os.path.expanduser("~/.cl_ops_tpu_autotune.json")
_mem_cache: dict[str, tuple[int, int]] = {}


def _cache_path() -> str:
    return os.environ.get(_CACHE_ENV, _DEFAULT_CACHE)


def _trace_state_clean() -> bool:
    """True when NOT inside a jax trace (safe to compile+time on chip)."""
    try:
        from jax._src import core as _core
        return bool(_core.trace_state_clean())
    except Exception:
        return True


def warm_shapes(shapes) -> None:
    """Pre-sweep the tuner for (rows, n_arrays) pairs OUTSIDE any jit.

    The composite pipelines sort inside one big jit, where candidates
    cannot be timed (tune_geometry then falls back to the static
    geometry); warming here first makes those jits pick up tuned
    winners from the cache.
    """
    for rows, n_arrays in shapes:
        tune_geometry(rows, n_arrays)


def _load() -> dict:
    try:
        with open(_cache_path()) as f:
            return json.load(f)
    except Exception:
        return {}


def _save(d: dict) -> None:
    try:
        with open(_cache_path(), "w") as f:
            json.dump(d, f, indent=1, sort_keys=True)
    except OSError:
        pass


def candidate_geometries(rows: int, n_arrays: int) -> list[tuple[int, int]]:
    """Small (block_rows, merge_rows) grid bounded by shape and VMEM."""
    cands = []
    for br in (256, 512):
        if br > rows:
            continue
        for mult in (4, 8, 16):
            # mult capped at 16 (r5): the 32x fat merges ((256, 8192))
            # hung the server-side Mosaic compile on every shape swept
            # and never won where they did compile; each hang burns a
            # full sweep-restart cycle.
            if br == 512 and mult > 8:
                # 512-row blocks fully unroll a 64K-element sort; stacking
                # 16x+ merges on top blows up the Mosaic compile (observed
                # r4: the (512, 8192) candidate hung the server-side
                # compile >15 min) and every compiled 512-row fat merge
                # measured slower than its 256-row sibling.
                continue
            mr = min(br * mult, rows)
            # merge kernel holds ~3 copies of n_arrays blocks; stay under
            # the 100 MiB Mosaic budget with headroom
            if n_arrays * mr * 128 * 4 * 3 > 96 * 1024 * 1024:
                continue
            if (br, mr) not in cands:
                cands.append((br, mr))
    if not cands:
        br = min(512, rows)
        cands = [(br, br)]
    return cands


def tune_geometry(rows: int, n_arrays: int) -> tuple[int, int, bool | None]:
    """Best (block_rows, merge_rows, single_launch) for a (rows, 128) sort.

    Measures each candidate on the live device with random data (3 timed
    runs after a warmup, one tiny readback sync per batch — the tunneled-
    chip methodology of bench/common.py). When the problem fits the
    whole-VMEM one-kernel sort, that kernel competes as its own candidate
    and the verdict persists as the third tuple element (None = the
    static auto rule decides). Results persist across processes keyed by
    (device kind, rows, n_arrays).
    """
    import jax
    import jax.numpy as jnp

    kind = jax.devices()[0].device_kind.replace(" ", "_")
    key = f"{kind}:{rows}x{n_arrays}"
    if key in _mem_cache:
        return _mem_cache[key]
    disk = _load()
    if key in disk:
        entry = disk[key]
        geo = (entry[0], entry[1],
               entry[2] if len(entry) > 2 else None)  # pre-r3 cache rows
        _mem_cache[key] = geo
        return geo
    if not _trace_state_clean():
        # Called while TRACING an outer jit (the composite pipelines sort
        # inside one big jit): candidates cannot be timed here — a jitted
        # run() call would inline into the outer trace and `float()` on
        # its output is a ConcretizationTypeError. Return the static
        # default WITHOUT caching; warm the cache first via
        # warm_shapes() / an un-jitted sort to get tuned geometry.
        br = min(512, rows)
        return (br, min(br * 4, rows), None)

    from cl_ops_tpu.ops.sort import bitonic_kernels as bk

    import numpy as np
    data = [jnp.asarray(
        ((np.arange(rows * bk.LANES, dtype=np.uint64) * 2654435761 + i)
         % (1 << 32)).astype(np.uint32).view(np.int32)
        .reshape(rows, bk.LANES)) for i in range(n_arrays)]
    small = jax.jit(lambda a: a[:8, :8].astype(jnp.float32).sum())

    import functools

    @functools.partial(jax.jit, static_argnames=("b", "m", "sl"))
    def run(arrs, b, m, sl):
        return bk.bitonic_sort_2d(tuple(arrs), block_rows=b, fused=True,
                                  merge_rows=m, interpret=False,
                                  single_launch=sl)

    cands = [(br, mr, False) for br, mr in
             candidate_geometries(rows, n_arrays)]
    if bk.MIN_ROWS < rows * n_arrays <= bk.SINGLE_LAUNCH_MAX_ROWS:
        cands.append((min(512, rows), min(512, rows), True))

    # Per-candidate checkpoint: each measurement persists immediately, so
    # a sweep interrupted mid-way (compiles through the tunneled helper
    # can take minutes each) resumes instead of restarting.
    partial_key = key + ":partial"
    done = dict(disk.get(partial_key, {}))
    best = None
    for br, mr, sl in cands:
        ck = f"{br},{mr},sl" if sl else f"{br},{mr}"
        if done.get(ck) == "pending":
            # A previous sweep died inside this candidate's compile — the
            # tunneled server-side Mosaic compile can hang indefinitely
            # (observed r4). Treat it as infeasible rather than hanging
            # every future sweep on the same geometry.
            done[ck] = None
            disk[partial_key] = done
            _save(disk)
        if ck not in done:
            try:
                done[ck] = "pending"
                disk[partial_key] = done
                _save(disk)
                out = run(data, br, mr, sl)
                float(small(out[0]))  # compile + sync
                # RTT-amortizing depth (see bench/common.py time_adaptive):
                # a 3-run batch over the tunnel measures mostly the fixed
                # sync round trip at small shapes and ranks candidates by
                # noise. One probe batch sizes the real batch to ~1 s.
                t0 = time.perf_counter()
                for _ in range(3):
                    out = run(data, br, mr, sl)
                float(small(out[0]))
                dt = (time.perf_counter() - t0) / 3
                reps = max(3, min(200, int(1.0 / max(dt, 1e-7))))
                if reps > 3:
                    t0 = time.perf_counter()
                    for _ in range(reps):
                        out = run(data, br, mr, sl)
                    float(small(out[0]))
                    dt = (time.perf_counter() - t0) / reps
                done[ck] = dt
            except Exception as e:
                import logging
                logging.getLogger("cl_ops_tpu.sort").warning(
                    "autotune candidate %s for %s failed: %r", ck, key, e)
                done[ck] = None  # infeasible geometry: never retry
            disk[partial_key] = done
            _save(disk)
        dt = done[ck]
        if isinstance(dt, (int, float)) and (best is None or dt < best[0]):
            best = (dt, br, mr, sl)
    if best is None:
        # Every candidate failed to MEASURE (e.g. the sweep ran in a
        # context where timing is impossible). Return the static default
        # but do NOT persist it as a winner — a later sweep in a healthy
        # context must still run. Only the in-process memo is set (so one
        # broken process doesn't re-sweep per sort call).
        br = min(512, rows)
        geo = (br, min(br * 4, rows), None)
        _mem_cache[key] = geo
        return geo
    geo = (best[1], best[2], best[3])
    _mem_cache[key] = geo
    disk.pop(partial_key, None)
    disk[key] = list(geo)
    _save(disk)
    return geo
