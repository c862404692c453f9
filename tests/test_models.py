"""Flagship pipeline tests vs numpy oracles."""

import numpy as np

from cl_ops_tpu import models
from cl_ops_tpu.ops.rng import threefry


def _oracle_table(n, seed=0, key_space=1 << 20, value_space=1 << 10):
    ids = np.arange(n, dtype=np.uint32)
    keys = np.asarray(threefry.random_bits(seed, ids, np.uint32(0))) % key_space
    vals = np.asarray(threefry.random_bits(seed, ids, np.uint32(1))) % value_space
    return keys, vals


def test_sort_pipeline():
    sorted_keys, ok = models.sort_pipeline(4096, seed=1)
    assert bool(ok)
    keys, _ = _oracle_table(4096, 1)
    np.testing.assert_array_equal(np.asarray(sorted_keys), np.sort(keys))


def test_analytics_query():
    n, g, t = 8192, 64, 512
    count, table = models.analytics_query(n, num_groups=g, seed=2,
                                          threshold=t)
    keys, vals = _oracle_table(n, 2)
    m = vals < t
    assert int(count) == m.sum()
    expect = np.zeros(g, np.uint64)
    for k, v in zip(keys[m] % g, vals[m]):
        expect[k] += v
    np.testing.assert_array_equal(np.asarray(table), expect.astype(np.uint32))


def test_star_query():
    n, dim_rows, cats = 1 << 14, 1 << 10, 32
    count, table = models.star_query(n, dim_rows=dim_rows, num_cats=cats,
                                     seed=3, threshold=512)
    # numpy oracle over the same generated data
    keys, values = (np.asarray(a) for a in models.generate_table(
        n, 3, key_space=dim_rows))
    from cl_ops_tpu.ops.rng import threefry
    dim_cat = np.asarray(
        threefry.random_bits(4, np.arange(dim_rows, dtype=np.uint32),
                             np.uint32(2))) % cats
    keep = values < 512
    assert int(count) == keep.sum()
    exp = np.zeros(cats, np.uint32)
    np.add.at(exp, dim_cat[keys[keep]], values[keep])
    np.testing.assert_array_equal(np.asarray(table), exp)


def test_rollup_query():
    """Restore-free join->aggregate fusion pipeline: ONE probe sort total
    (banded sorted_output + probe_cols + keys_sorted aggregate)."""
    import numpy as np
    import jax.numpy as jnp
    from cl_ops_tpu.models.pipeline import generate_table, rollup_query
    n, dim_rows = 1 << 13, 1 << 9
    gk, table, cnt = rollup_query(n, dim_rows=dim_rows, use_pallas=True)
    gk0, t0, c0 = rollup_query(n, dim_rows=dim_rows, use_pallas=False)
    assert int(cnt) == int(c0)
    k = int(cnt)
    np.testing.assert_array_equal(np.asarray(gk)[:k], np.asarray(gk0)[:k])
    np.testing.assert_array_equal(np.asarray(table)[:k],
                                  np.asarray(t0)[:k])
    # oracle
    keys, measures = generate_table(n, 0, key_space=2 * dim_rows)
    keys, measures = np.asarray(keys), np.asarray(measures).astype(np.int64)
    contrib = np.where(keys % 2 == 0, measures, 0)
    expect = {int(u): int(contrib[keys == u].sum()) for u in np.unique(keys)}
    got = {int(a): int(b) for a, b in
           zip(np.asarray(gk)[:k], np.asarray(table)[:k])}
    assert got == expect
