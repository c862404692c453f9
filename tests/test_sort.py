"""Sort family tests.

Mirrors the reference's verification strategy: per-run host sortedness /
equality checks against an oracle (`src/benchmarks/clo_sort_bench.c:216-227`),
parametrized registry-driven over all impls and key dtypes like the
reference's bench CLI type axis.
"""

import numpy as np
import pytest

from cl_ops_tpu.ops import sort as sort_mod
from cl_ops_tpu.ops.sort import keys as keymod

ALL_IMPLS = sort_mod.sort_names()
SMALL_OPTS = {
    "sbitonic": "block_rows=8",
    # single_launch=0 keeps the multi-launch fused schedule covered at test
    # sizes (the auto rule routes everything under 2M elems to the
    # whole-VMEM single-launch kernel, which has its own tests below)
    "abitonic": "block_rows=8,single_launch=0",
    "satradix": "block_rows=8,scatter=xla",
    "gselect": "chunk=512",
    "xla": None,
}


def _rand(dt, n, seed):
    rng = np.random.RandomState(seed)
    dt = np.dtype(dt)
    if dt.kind in "ui" and dt.itemsize == 8:
        # full-range 64-bit draws (top bit set half the time) so the
        # high-limb sign-flip path is really exercised
        lo = rng.randint(0, 2 ** 32, size=n, dtype=np.uint64)
        hi = rng.randint(0, 2 ** 32, size=n, dtype=np.uint64)
        w = lo | (hi << np.uint64(32))
        return w.astype(dt) if dt.kind == "u" else w.view(np.int64)
    if dt.kind == "u":
        return rng.randint(0, 2 ** (8 * dt.itemsize),
                           size=n, dtype=np.uint64).astype(dt)
    if dt.kind == "i":
        lim = 2 ** (8 * dt.itemsize - 1)
        return rng.randint(-lim, lim, size=n,
                           dtype=np.int64).astype(dt)
    return (rng.randn(n) * 100).astype(dt)


@pytest.mark.parametrize("impl", ALL_IMPLS)
@pytest.mark.parametrize("n", [1, 100, 1024, 3000])
def test_sort_u32(impl, n):
    x = _rand(np.uint32, n, 42 + n)
    s = sort_mod.sort_new(impl, SMALL_OPTS[impl])
    out = s.sort_with_host_data(x)
    np.testing.assert_array_equal(out, np.sort(x))


# Full dtype matrix on the cheap impls; Pallas impls sample 3 dtypes
# (interpret mode is slow; the limb machinery is shared anyway).
@pytest.mark.parametrize("impl,dt", [
    (i, d) for i in ("xla", "gselect")
    for d in ["char", "ushort", "int", "uint", "long", "ulong", "half",
              "float", "double"]
] + [
    # Pallas impls share the limb machinery; sample key dtypes. sbitonic is
    # one-launch-per-step and slow under interpret, so it only runs the u32
    # matrix above.
    (i, d) for i in ("abitonic", "satradix")
    for d in ["int", "ulong", "float"]
])
def test_sort_all_dtypes(impl, dt):
    from cl_ops_tpu.core.dtypes import canonicalize
    x = _rand(canonicalize(dt), 800, 7)
    s = sort_mod.sort_new(impl, SMALL_OPTS[impl], elem_dtype=dt)
    out = s.sort_with_host_data(x)
    np.testing.assert_array_equal(out, np.sort(x))


@pytest.mark.parametrize("impl", ALL_IMPLS)
def test_sort_descending(impl):
    x = _rand(np.uint32, 640, 3)
    s = sort_mod.sort_new(impl, SMALL_OPTS[impl], ascending=False)
    out = s.sort_with_host_data(x)
    np.testing.assert_array_equal(out, np.sort(x)[::-1])


@pytest.mark.parametrize("impl", ["abitonic", "satradix", "gselect", "xla"])
def test_sort_key_value(impl):
    """KV sort: values follow keys (BASELINE.json satradix KV config)."""
    x = _rand(np.uint32, 600, 5)
    vals = np.arange(600, dtype=np.int32)
    s = sort_mod.sort_new(impl, SMALL_OPTS[impl])
    out, vout = s.sort_with_host_data(x, vals)
    np.testing.assert_array_equal(out, np.sort(x))
    # values must be a permutation consistent with the keys
    np.testing.assert_array_equal(x[vout], out)


@pytest.mark.parametrize("impl", ["satradix", "gselect", "xla"])
def test_sort_stability(impl):
    """Stable impls keep equal-key input order (ref gselect tie-break,
    clo_sort_gselect.cl:51; LSD radix is stable by construction)."""
    x = np.array([3, 1, 3, 1, 2, 2, 1, 3] * 50, np.uint32)
    vals = np.arange(len(x), dtype=np.int32)
    s = sort_mod.sort_new(impl, SMALL_OPTS[impl])
    _, vout = s.sort_with_host_data(x, vals)
    expect = np.argsort(x, kind="stable")
    np.testing.assert_array_equal(vout, expect)


def test_sort_key_fn():
    """Custom key extractor (CLO_SORT_KEY_GET analog): sort by low byte."""
    import jax.numpy as jnp
    x = _rand(np.uint32, 500, 11)
    s = sort_mod.sort_new(
        "xla", key_dtype="uchar",
        key_fn=lambda d: (d & jnp.uint32(0xFF)).astype(jnp.uint8))
    out = s.sort_with_host_data(x)
    assert np.all(np.diff(out & 0xFF) >= 0)
    np.testing.assert_array_equal(np.sort(out), np.sort(x))


@pytest.mark.parametrize("impl", ["sbitonic", "abitonic", "satradix"])
def test_sort_with_duplicates_and_extremes(impl):
    x = np.array([0, 0xFFFFFFFF, 5, 0xFFFFFFFF, 0, 7] * 200, np.uint32)
    s = sort_mod.sort_new(impl, SMALL_OPTS[impl])
    out = s.sort_with_host_data(x)
    np.testing.assert_array_equal(out, np.sort(x))


def test_satradix_radix_option():
    """radix= option parity (clo_sort_satradix.c:353)."""
    x = _rand(np.uint32, 1000, 13)
    # radix=256 is supported but traces 256 per-bin block scans — too slow
    # for the CPU interpret suite.
    for radix in (4, 64):
        s = sort_mod.sort_new("satradix", f"block_rows=8,radix={radix}")
        np.testing.assert_array_equal(s.sort_with_host_data(x), np.sort(x))


def test_satradix_composed_scan():
    """scan= option composes a Scan object (clo_sort_satradix.c:296-300)."""
    x = _rand(np.uint32, 2000, 17)
    s = sort_mod.sort_new("satradix",
                          "block_rows=8,scan=blelloch,scanblock_rows=8")
    np.testing.assert_array_equal(s.sort_with_host_data(x), np.sort(x))


def test_introspection():
    s = sort_mod.sort_new("abitonic")
    assert s.in_place
    assert s.num_kernels == 3
    assert s.kernel_name(0) == "block_sort"
    assert s.vmem_usage("block_sort", 1 << 20) > 0
    r = sort_mod.sort_new("satradix")
    assert not r.in_place
    assert set(sort_mod.sort_names()) >= {
        "sbitonic", "abitonic", "gselect", "satradix", "xla"}


def test_bad_args():
    from cl_ops_tpu.core.errors import CloOpsError
    with pytest.raises(CloOpsError):
        sort_mod.sort_new("nope")
    with pytest.raises(CloOpsError):
        sort_mod.sort_new("xla", key_dtype="uchar")  # key_dtype w/o key_fn
    s = sort_mod.sort_new("xla")
    with pytest.raises(CloOpsError):
        s.sort_with_device_data(np.zeros((2, 2), np.uint32))


@pytest.mark.parametrize("impl", ["abitonic", "satradix", "gselect", "xla"])
def test_sort_key_value_duplicates(impl):
    """Duplicate (key, value) PAIRS must not lose rows (the direct value
    payload rides the sort; ranks/exchanges must stay collision-free)."""
    x = np.array([5, 1, 5, 1, 5, 1] * 100, np.uint32)
    vals = np.array([9, 9, 9, 9, 7, 7] * 100, np.int32)
    s = sort_mod.sort_new(impl, SMALL_OPTS[impl])
    out, vout = s.sort_with_host_data(x, vals)
    np.testing.assert_array_equal(out, np.sort(x))
    # multiset of (key, value) pairs preserved
    got = sorted(zip(out.tolist(), vout.tolist()))
    expect = sorted(zip(x.tolist(), vals.tolist()))
    assert got == expect


def test_sort_key_value_float_values():
    x = np.random.RandomState(2).randint(0, 100, size=512).astype(np.uint32)
    vals = np.random.RandomState(3).randn(512).astype(np.float32)
    s = sort_mod.sort_new("abitonic", SMALL_OPTS["abitonic"])
    out, vout = s.sort_with_host_data(x, vals)
    got = sorted(zip(out.tolist(), vout.tolist()))
    expect = sorted(zip(x.tolist(), vals.tolist()))
    assert got == expect


def test_autotune_candidates_and_cache(tmp_path, monkeypatch):
    """Geometry candidates respect shape/VMEM bounds; winners persist."""
    from cl_ops_tpu.ops.sort import autotune as at
    cands = at.candidate_geometries(16384, 1)
    assert all(br <= 16384 and br <= mr <= 16384 for br, mr in cands)
    assert len(cands) >= 4
    # tiny shapes clamp
    assert at.candidate_geometries(8, 1) == [(8, 8)]
    # VMEM bound prunes fat merges for many arrays
    fat = at.candidate_geometries(1 << 15, 4)
    assert all(4 * mr * 128 * 4 * 3 <= 96 * 1024 * 1024 for _, mr in fat)
    # cache: on CPU every compiled candidate fails -> fallback geometry,
    # persisted and reused without re-measurement
    monkeypatch.setenv(at._CACHE_ENV, str(tmp_path / "tune.json"))
    at._mem_cache.clear()
    geo = at.tune_geometry(64, 1)
    assert geo == (64, 64, None)
    at._mem_cache.clear()
    assert at.tune_geometry(64, 1) == geo  # from disk


def test_abitonic_autotune_option_interpret():
    """autotune=1 is a no-op under interpret mode (falls to the model)."""
    x = _rand(np.uint32, 600, 3)
    s = sort_mod.sort_new("abitonic", "autotune=1,block_rows=8")
    np.testing.assert_array_equal(s.sort_with_host_data(x), np.sort(x))


def test_satradix_bitonic_scatter():
    """Default scatter=bitonic placement (sort-by-dest) matches np.sort."""
    x = _rand(np.uint32, 700, 17)
    s = sort_mod.sort_new("satradix", "block_rows=8,radix=16")
    np.testing.assert_array_equal(s.sort_with_host_data(x), np.sort(x))
    v = np.arange(700, dtype=np.int32)
    sk, sv = s.sort_with_host_data(x, v)
    np.testing.assert_array_equal(x[sv], sk)


@pytest.mark.parametrize("dt", ["uint", "int", "ulong", "float"])
def test_abitonic_single_launch(dt):
    """The whole-VMEM one-kernel sort (launch-bound small-n path)."""
    from cl_ops_tpu.core.dtypes import canonicalize
    x = _rand(canonicalize(dt), 5000, 11)
    s = sort_mod.sort_new("abitonic", "single_launch=1", elem_dtype=dt)
    out = s.sort_with_host_data(x)
    np.testing.assert_array_equal(out, np.sort(x))


def test_abitonic_single_launch_kv():
    x = _rand(np.uint32, 4096, 12)
    vals = np.arange(4096, dtype=np.int32)
    s = sort_mod.sort_new("abitonic", "single_launch=1")
    out, vout = s.sort_with_host_data(x, vals)
    np.testing.assert_array_equal(out, np.sort(x))
    np.testing.assert_array_equal(x[vout], out)


def test_abitonic_single_launch_auto_matches_forced():
    """The auto rule (small fused problems) and the forced option agree."""
    x = _rand(np.uint32, 3 * 1024, 13)
    auto = sort_mod.sort_new("abitonic", "block_rows=8")
    forced = sort_mod.sort_new("abitonic", "block_rows=8,single_launch=1")
    np.testing.assert_array_equal(auto.sort_with_host_data(x),
                                  forced.sort_with_host_data(x))


def test_dma_scatter_chunk_copy():
    """Blocked-write run copy (SURVEY §7 binned-DMA scatter half): runs
    land at quantized destinations, tails and slack become sentinels."""
    import jax.numpy as jnp
    from cl_ops_tpu.ops.sort import dma_scatter as ds
    rng = np.random.RandomState(70)
    n = 32 * ds.CHUNK
    x = rng.randint(0, 1 << 30, size=n).astype(np.int32)
    cuts = np.sort(rng.choice(np.arange(1, n), size=21, replace=False))
    starts = np.concatenate([[0], cuts]).astype(np.int32)
    lengths = (np.concatenate([cuts, [n]]) - starts).astype(np.int32)
    qlen = ((lengths + ds.CHUNK - 1) // ds.CHUNK) * ds.CHUNK
    qstarts = (np.cumsum(qlen) - qlen).astype(np.int32)
    n_chunks = n // ds.CHUNK + len(lengths)
    params = ds.plan_run_chunks(jnp.asarray(starts), jnp.asarray(qstarts),
                                jnp.asarray(lengths),
                                n_chunks_static=n_chunks)
    (out,) = ds.chunk_copy((jnp.asarray(x).reshape(-1, 128),), params,
                           n_chunks=n_chunks, interpret=True)
    out = np.asarray(out).reshape(-1)
    for s, q, l in zip(starts, qstarts, lengths):
        np.testing.assert_array_equal(out[q:q + l], x[s:s + l])
        qtop = q + ((l + ds.CHUNK - 1) // ds.CHUNK) * ds.CHUNK
        np.testing.assert_array_equal(out[q + l:qtop], ds._SENT)
    np.testing.assert_array_equal(out[int(qstarts[-1] + qlen[-1]):],
                                  ds._SENT)
