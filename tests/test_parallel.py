"""Distributed-layer tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from cl_ops_tpu import parallel


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return parallel.make_mesh(8)


def test_dist_scan_exclusive(mesh8):
    rng = np.random.RandomState(0)
    x = rng.randint(0, 1000, size=8 * 1000).astype(np.uint32)
    out = parallel.dist_scan(x, mesh8, sum_dtype=np.uint64, use_pallas=False)
    expect = np.cumsum(x.astype(np.uint64)) - x
    np.testing.assert_array_equal(np.asarray(out), expect)


def test_dist_scan_inclusive(mesh8):
    rng = np.random.RandomState(1)
    x = rng.randint(0, 1000, size=8 * 64).astype(np.int32)
    out = parallel.dist_scan(x, mesh8, sum_dtype=np.int64, exclusive=False,
                             use_pallas=False)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.cumsum(x.astype(np.int64)))


def test_dist_scan_sharding_preserved(mesh8):
    x = np.arange(8 * 128, dtype=np.uint32)
    out = parallel.dist_scan(x, mesh8, sum_dtype=np.uint32, use_pallas=False)
    assert len(out.sharding.device_set) == 8


def test_dist_scan_uneven_rejected(mesh8):
    with pytest.raises(ValueError):
        parallel.dist_scan(np.arange(9, dtype=np.uint32), mesh8,
                           sum_dtype=np.uint64, use_pallas=False)


def test_dist_scan_pallas_interpret(mesh8):
    """The Pallas local-scan path under shard_map (interpret mode on CPU)."""
    rng = np.random.RandomState(2)
    x = rng.randint(0, 1000, size=8 * 2048).astype(np.uint32)
    from cl_ops_tpu.ops.scan import kernels as K
    import cl_ops_tpu.parallel.scan as ps
    orig = ps._local_inclusive

    def patched(xs, sum_dtype, use_pallas):
        if use_pallas:
            return K.scan_1d(xs, sum_dtype=sum_dtype, exclusive=False,
                             block_rows=8, interpret=True)
        return orig(xs, sum_dtype, False)

    ps._local_inclusive = patched
    try:
        out = parallel.dist_scan(x, mesh8, sum_dtype=np.uint64,
                                 use_pallas=True)
    finally:
        ps._local_inclusive = orig
    expect = np.cumsum(x.astype(np.uint64)) - x
    np.testing.assert_array_equal(np.asarray(out), expect)


def test_dist_sort(mesh8):
    rng = np.random.RandomState(10)
    x = rng.randint(0, 1 << 31, size=8 * 4096, dtype=np.int64).astype(np.uint32)
    out = parallel.dist_sort(x, mesh8, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(out), np.sort(x))
    assert len(out.sharding.device_set) == 8


def test_dist_sort_descending(mesh8):
    rng = np.random.RandomState(11)
    x = rng.randint(-1000, 1000, size=8 * 512).astype(np.int32)
    out = parallel.dist_sort(x, mesh8, ascending=False, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(out), np.sort(x)[::-1])


def test_dist_sort_key_value(mesh8):
    rng = np.random.RandomState(12)
    x = rng.randint(0, 100, size=8 * 256).astype(np.uint32)
    v = np.arange(8 * 256, dtype=np.int32)
    out, vout = parallel.dist_sort(x, mesh8, values=v, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(out), np.sort(x))
    np.testing.assert_array_equal(x[np.asarray(vout)], np.asarray(out))


def test_dist_sort_pallas_interpret(mesh8):
    """Pallas local sort/merge path under shard_map interpret mode."""
    rng = np.random.RandomState(13)
    x = rng.randint(0, 1 << 31, size=8 * 1024, dtype=np.int64).astype(np.uint32)
    out = parallel.dist_sort(x, mesh8, use_pallas=True, block_rows=8)
    np.testing.assert_array_equal(np.asarray(out), np.sort(x))
