"""Native (C++) CPU oracle library, loaded via ctypes.

The reference library is entirely native (C99 + OpenCL C, SURVEY.md §2);
this module is the new framework's native runtime component: bit-exact CPU
re-implementations of the reference's algorithms used for verification and
fast host-side utilities. Built on demand with g++ (no pybind11 in the
image); falls back to numpy implementations when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "oracle.cpp")
_SO = os.path.join(_HERE, "liboracle.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", _SO + ".tmp"],
            check=True, capture_output=True, timeout=120)
        os.replace(_SO + ".tmp", _SO)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                       < os.path.getmtime(_SRC)):
            if not _build():
                return None
        lib = ctypes.CDLL(_SO)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        i64 = ctypes.c_int64
        for gen in ("lcg", "xorshift64", "xorshift128", "mwc64x",
                    "parkmiller", "tauslcg"):
            f = getattr(lib, f"clo_oracle_rng_{gen}")
            f.argtypes = [u64p, i64, i64, u32p]
            f.restype = None
        lib.clo_oracle_scan_u32_u64.argtypes = [u32p, i64, u64p]
        lib.clo_oracle_scan_u64_u64.argtypes = [u64p, i64, u64p]
        lib.clo_oracle_check_sorted_u32.argtypes = [u32p, i64]
        lib.clo_oracle_check_sorted_u32.restype = ctypes.c_int32
        lib.clo_oracle_check_sorted_u64.argtypes = [u64p, i64]
        lib.clo_oracle_check_sorted_u64.restype = ctypes.c_int32
        lib.clo_oracle_sort_u32.argtypes = [u32p, i64]
        lib.clo_oracle_sort_u64.argtypes = [u64p, i64]
        lib.clo_oracle_rand_u32.argtypes = [ctypes.c_uint64, i64, u32p]
        lib.clo_oracle_rand_u64.argtypes = [ctypes.c_uint64, i64, u64p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def rng_stream(gen: str, seeds: np.ndarray, draws: int) -> np.ndarray:
    """Reference-exact RNG streams: out[d, s] = draw d of stream s."""
    lib = _load()
    seeds = np.ascontiguousarray(seeds, np.uint64)
    n = len(seeds)
    out = np.empty((draws, n), np.uint32)
    if lib is None:
        # numpy fallback mirrors the framework generators instead
        from cl_ops_tpu.ops.rng import rng_new
        r = rng_new(gen, "ext_host", num_streams=n,
                    ext_states=_np_seed_states(gen, seeds))
        return np.asarray(r.generate(draws))
    getattr(lib, f"clo_oracle_rng_{gen}")(
        _ptr(seeds, ctypes.c_uint64), n, draws,
        _ptr(out, ctypes.c_uint32))
    return out


def _np_seed_states(gen: str, seeds: np.ndarray):
    from cl_ops_tpu.ops.rng.generators import get_generator
    import jax.numpy as jnp
    return np.asarray(get_generator(gen).seed_from_u64(
        jnp.asarray(seeds, jnp.uint64)))


def exclusive_scan(x: np.ndarray) -> np.ndarray:
    """Serial exclusive scan to u64 (clo_scan_bench check-loop parity)."""
    lib = _load()
    x = np.ascontiguousarray(x)
    out = np.empty(x.shape, np.uint64)
    if lib is None:
        np.cumsum(x.astype(np.uint64), out=out)
        out = np.concatenate([[np.uint64(0)], out[:-1]])
        return out
    if x.dtype == np.uint32:
        lib.clo_oracle_scan_u32_u64(_ptr(x, ctypes.c_uint32), x.size,
                                    _ptr(out, ctypes.c_uint64))
    elif x.dtype == np.uint64:
        lib.clo_oracle_scan_u64_u64(_ptr(x, ctypes.c_uint64), x.size,
                                    _ptr(out, ctypes.c_uint64))
    else:
        raise TypeError(f"unsupported dtype {x.dtype}")
    return out


def check_sorted(x: np.ndarray) -> bool:
    lib = _load()
    x = np.ascontiguousarray(x)
    if lib is None or x.dtype not in (np.uint32, np.uint64):
        return bool(np.all(np.diff(x) >= 0))
    if x.dtype == np.uint32:
        return bool(lib.clo_oracle_check_sorted_u32(
            _ptr(x, ctypes.c_uint32), x.size))
    return bool(lib.clo_oracle_check_sorted_u64(
        _ptr(x, ctypes.c_uint64), x.size))


def sort(x: np.ndarray) -> np.ndarray:
    lib = _load()
    out = np.ascontiguousarray(x).copy()
    if lib is None or out.dtype not in (np.uint32, np.uint64):
        return np.sort(out)
    if out.dtype == np.uint32:
        lib.clo_oracle_sort_u32(_ptr(out, ctypes.c_uint32), out.size)
    else:
        lib.clo_oracle_sort_u64(_ptr(out, ctypes.c_uint64), out.size)
    return out


def rand_fill(dtype, n: int, seed: int = 1) -> np.ndarray:
    """Native uniform fill (clo_bench_rand parity for u32/u64)."""
    lib = _load()
    dt = np.dtype(dtype)
    if lib is None or dt not in (np.dtype(np.uint32), np.dtype(np.uint64)):
        from cl_ops_tpu.bench.common import rand_array
        return rand_array(dt, n, seed)
    if dt == np.uint32:
        out = np.empty(n, np.uint32)
        lib.clo_oracle_rand_u32(seed, n, _ptr(out, ctypes.c_uint32))
    else:
        out = np.empty(n, np.uint64)
        lib.clo_oracle_rand_u64(seed, n, _ptr(out, ctypes.c_uint64))
    return out
