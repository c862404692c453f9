"""Bitonic sorter implementations: "sbitonic" and "abitonic".

sbitonic — parity with the reference's simple bitonic sorter
(`src/cl_ops/sort/clo_sort_sbitonic.c:224-233`): one global kernel launch per
bitonic (stage, step), every launch streaming the whole array through VMEM.
Correct for any pow-2-padded size; pedagogically faithful, bandwidth-bound.

abitonic — parity with the reference's advanced bitonic sorter
(`clo_sort_abitonic.c:58-313`): multi-step fused kernels. The reference picks
per-step kernels from a lookup table constrained by local-memory limits and
the minps/maxps options; here the analogous *strategy* is choosing the VMEM
block size B: all stages K <= B run in ONE full block-sort kernel, and each
merge stage K > B runs log2(K/B) cross-block passes plus ONE fused local
kernel covering every step J < B. The `vmem` option (bytes) bounds B the way
`maxsfs`/local-memory probing bounds the reference's kernel choice
(`clo_sort_abitonic.c:667-688`).
"""

from __future__ import annotations

import logging

import jax

from cl_ops_tpu.ops.sort import bitonic_kernels as bk
from cl_ops_tpu.ops.sort import keys as keymod
from cl_ops_tpu.ops.sort.abstract import SortImplDef, sort_impls
from cl_ops_tpu.utils.bits import is_po2, nlpo2
from cl_ops_tpu.utils.platform import pallas_interpret

# i32 max: pads sort after every real key; pad payloads also get this value
# so key-equal ties against padding resolve real-before-pad.
_PAD = 0x7FFFFFFF

# Strategy-trace logging, the g_debug parity of the reference's chosen-
# kernel dumps (clo_sort_abitonic.c:398-409). Enable with
# logging.getLogger("cl_ops_tpu").setLevel(logging.DEBUG).
_log = logging.getLogger("cl_ops_tpu.sort")


def _pick_block_rows(n_arrays: int, vmem_bytes: int) -> int:
    """Strategy selector: biggest po2 block fitting the VMEM budget.

    Mosaic's scoped allocation for the fully unrolled in-block sort keeps
    roughly 16 block-sized i32 temporaries live at peak (measured on v5e),
    so the model is n_arrays * block_bytes * 16 <= budget — the analog of
    abitonic's localmem model (`clo_sort_abitonic.c:667-688`).
    """
    rows = 8
    while (n_arrays * (rows * 2) * bk.LANES * 4 * 16) <= vmem_bytes:
        rows *= 2
    return rows


def _pick_merge_rows(block_rows: int) -> int:
    """Second-tier (merge) block: 4x the sort block.

    Measured sweet spot on v5e (16M u32): merge at 4x block cuts HBM
    sweeps and launch count without pushing Mosaic compile times or VPU
    inefficiency of very fat blocks (8x+ was slower and compiled slowly).
    """
    return block_rows * 4


def abitonic_traffic_bytes(n: int, n_arrays: int,
                           options: dict | None = None) -> int:
    """Bytes-moved model of one abitonic sort call (roofline accounting).

    Replays the strategy selection of _make_bitonic_sorter for the given
    options, then sums the fused schedule's launch traffic
    (bitonic_kernels.fused_traffic_bytes) plus the pow-2 pad copy.
    """
    options = options or {}
    vmem = int(options.get("vmem", 8 * 1024 * 1024))
    padded = max(nlpo2(n), bk.MIN_ROWS * bk.LANES)
    rows = padded // bk.LANES
    br = int(options["block_rows"]) if "block_rows" in options else \
        _pick_block_rows(n_arrays, vmem)
    br = min(br, rows)
    mr = int(options["merge_rows"]) if "merge_rows" in options else \
        _pick_merge_rows(br)
    mr = max(min(mr, rows), br)
    slopt = options.get("single_launch")
    sl = None if slopt is None else slopt == "1"
    pad_bytes = (n + padded) * 4 * n_arrays if padded != n else 0
    return bk.fused_traffic_bytes(padded, n_arrays, br, mr, sl) + pad_bytes


def _resolve_geometry(rows: int, n_arrays: int, options: dict,
                      interpret: bool,
                      fused: bool) -> tuple[int, int, bool | None]:
    """(block_rows, merge_rows, single_launch) for a padded (rows, 128)
    problem; single_launch None = the static auto rule decides.

    Priority: explicit options > autotune cache (option "autotune=1",
    live-device measurement, ops/sort/autotune.py) > the static VMEM
    model — mirroring the reference's options > lookup table > localmem
    probing order (clo_sort_abitonic.c:486-543, :58-313).
    """
    vmem = int(options.get("vmem", 8 * 1024 * 1024))
    br = mr = sl = None
    if "block_rows" in options:
        br = int(options["block_rows"])
        if not is_po2(br):
            raise ValueError("block_rows must be a power of 2")
    if "merge_rows" in options:
        mr = int(options["merge_rows"])
    if fused and options.get("autotune") == "1" and not interpret \
            and (br is None or mr is None):
        from cl_ops_tpu.ops.sort.autotune import tune_geometry
        abr, amr, sl = tune_geometry(rows, n_arrays)
        br = br if br is not None else abr
        mr = mr if mr is not None else amr
    if br is None:
        br = _pick_block_rows(n_arrays, vmem)
    br = min(br, rows)
    if not fused:
        return br, br, None
    if mr is None:
        mr = _pick_merge_rows(br)
    return br, max(min(mr, rows), br), sl


def _make_bitonic_sorter(fused: bool):
    def make(spec, options):
        interpret = pallas_interpret() or options.get("interpret") == "1"
        n_limbs = keymod.num_limbs(spec.key_dtype)
        jit_cache: dict = {}

        # option "single_launch=0|1" forces the whole-VMEM one-kernel sort
        # off/on; absent = autotune verdict (with autotune=1) or the
        # static auto rule (small fused problems take it)
        slopt = options.get("single_launch")
        opt_single_launch = None if slopt is None else slopt == "1"

        def build(br, mr, single_launch):
            def fn(limbs, payload):
                arrs = list(limbs) + ([payload] if payload is not None
                                      else [])
                n = arrs[0].shape[0]
                arrs2d, padded = bk.pad_and_reshape(arrs,
                                                    [_PAD] * len(arrs))
                # KV sorts: the payload column only MOVES (num_keys) —
                # measurably cheaper on the VPU-bound kernels. Ties in
                # the key limbs then come out in unspecified payload
                # order (the old payload-tiebreak order was equally
                # arbitrary, just deterministic). Padding keeps the
                # total comparator: a real all-i32-max key row would
                # tie the pad rows on the prefix alone.
                nk = len(limbs) if (payload is not None and padded == n) \
                    else None
                out = bk.bitonic_sort_2d(arrs2d, block_rows=br, fused=fused,
                                         merge_rows=mr, interpret=interpret,
                                         single_launch=single_launch,
                                         num_keys=nk)
                flat = [a.reshape(-1)[:n] for a in out]
                out_limbs = tuple(flat[:len(limbs)])
                out_payload = (flat[len(limbs)] if payload is not None
                               else None)
                return out_limbs, out_payload
            return jax.jit(fn)

        def dispatch(limbs, payload):
            n_arrays = len(limbs) + (1 if payload is not None else 0)
            n = limbs[0].shape[0]
            rows = max(nlpo2(n), bk.MIN_ROWS * bk.LANES) // bk.LANES
            br, mr, tuned_sl = _resolve_geometry(rows, n_arrays, options,
                                                 interpret, fused)
            sl = opt_single_launch if opt_single_launch is not None \
                else tuned_sl
            key = (br, mr, n_arrays, sl)
            if key not in jit_cache:
                _log.debug(
                    "%s: n=%d padded_rows=%d arrays=%d block_rows=%d "
                    "merge_rows=%d single_launch=%s interpret=%s",
                    "abitonic" if fused else "sbitonic", n, rows, n_arrays,
                    br, mr, sl, interpret)
                jit_cache[key] = build(br, mr, sl)
            return jit_cache[key](limbs, payload)

        return dispatch
    return make


sort_impls.register("sbitonic")(lambda: SortImplDef(
    name="sbitonic",
    in_place=True,  # parity flag: ref sbitonic sorts in place
    make_limb_sorter=_make_bitonic_sorter(fused=False),
    kernel_names=("cx_step", "cx_cross"),
    vmem_usage=lambda k, n, o: 2 * int(o.get("block_rows", 1024)) * 128 * 4,
))

sort_impls.register("abitonic")(lambda: SortImplDef(
    name="abitonic",
    in_place=True,
    make_limb_sorter=_make_bitonic_sorter(fused=True),
    kernel_names=("block_sort", "cx_cross", "block_merge"),
    vmem_usage=lambda k, n, o: 3 * _pick_block_rows(
        2, int(o.get("vmem", 8 * 1024 * 1024))) * 128 * 4,
))
