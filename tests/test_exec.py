"""Query-operator tests (filter / aggregate / join) vs numpy oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from cl_ops_tpu.ops import exec as ex


def test_filter_compact():
    rng = np.random.RandomState(0)
    x = rng.randint(0, 1000, size=5000).astype(np.int32)
    pred = lambda d: (d % 10) == 0  # noqa: E731
    count, packed = ex.filter_compact(jnp.asarray(x), pred, use_pallas=False)
    keep = x[(x % 10) == 0]
    assert int(count) == len(keep)
    np.testing.assert_array_equal(np.asarray(packed)[:int(count)], keep)


def test_filter_compact_extra_cols():
    rng = np.random.RandomState(1)
    x = rng.randint(0, 100, size=2000).astype(np.int32)
    v = np.arange(2000, dtype=np.float32)
    pred = lambda d: d < 10  # noqa: E731
    count, px, pv = ex.filter_compact(jnp.asarray(x), pred, jnp.asarray(v),
                                      use_pallas=False)
    m = x < 10
    assert int(count) == m.sum()
    np.testing.assert_array_equal(np.asarray(px)[:int(count)], x[m])
    np.testing.assert_array_equal(np.asarray(pv)[:int(count)], v[m])


def test_filter_pallas_path():
    rng = np.random.RandomState(2)
    x = rng.randint(0, 100, size=3000).astype(np.int32)
    pred = lambda d: d >= 50  # noqa: E731
    count, packed = ex.filter_compact(jnp.asarray(x), pred, use_pallas=True)
    keep = x[x >= 50]
    assert int(count) == len(keep)
    np.testing.assert_array_equal(np.asarray(packed)[:int(count)], keep)


def test_count_where():
    x = np.arange(100, dtype=np.int32)
    assert int(ex.count_where(jnp.asarray(x), lambda d: d < 30)) == 30


@pytest.mark.parametrize("agg,oracle", [
    ("sum", np.sum), ("count", len), ("min", np.min), ("max", np.max),
    ("mean", np.mean)])
def test_group_aggregate_direct(agg, oracle):
    rng = np.random.RandomState(3)
    g = rng.randint(0, 50, size=4000).astype(np.int32)
    v = rng.randint(1, 100, size=4000).astype(np.int32)
    vv = v.astype(np.float32) if agg == "mean" else v
    table = ex.group_aggregate_direct(jnp.asarray(g), jnp.asarray(vv),
                                      num_groups=50, agg=agg)
    for grp in range(50):
        sel = vv[g == grp]
        if len(sel) == 0:
            continue
        np.testing.assert_allclose(np.asarray(table)[grp], oracle(sel),
                                   rtol=1e-6)


def test_group_aggregate_sorted():
    rng = np.random.RandomState(4)
    keys = rng.randint(0, 1 << 30, size=3000).astype(np.uint32)
    keys = keys[rng.randint(0, 3000, size=3000)]  # force duplicates
    vals = rng.randint(0, 100, size=3000).astype(np.int32)
    gkeys, table, count = ex.group_aggregate_sorted(
        jnp.asarray(keys), jnp.asarray(vals), num_groups=3000)
    uniq = np.unique(keys)
    assert int(count) == len(uniq)
    np.testing.assert_array_equal(np.asarray(gkeys)[:len(uniq)], uniq)
    expect = np.array([vals[keys == k].sum() for k in uniq])
    np.testing.assert_array_equal(np.asarray(table)[:len(uniq)], expect)


def test_hash_join():
    rng = np.random.RandomState(5)
    dim_keys = np.unique(rng.randint(0, 1 << 20, size=500).astype(np.uint32))
    dim_vals = (dim_keys * 7).astype(np.uint32)
    perm = rng.permutation(len(dim_keys))
    fact_keys = np.concatenate([
        dim_keys[rng.randint(0, len(dim_keys), size=2000)],
        (rng.randint(1 << 20, 1 << 21, size=100)).astype(np.uint32)])
    found, vals = ex.hash_join(jnp.asarray(dim_keys[perm]),
                               jnp.asarray(dim_vals[perm]),
                               jnp.asarray(fact_keys))
    found, vals = np.asarray(found), np.asarray(vals)
    expect_found = np.isin(fact_keys, dim_keys)
    np.testing.assert_array_equal(found, expect_found)
    np.testing.assert_array_equal(vals[expect_found],
                                  fact_keys[expect_found] * 7)


def test_hash_u32_range():
    x = jnp.asarray(np.arange(10000, dtype=np.uint32))
    h = np.asarray(ex.hash_u32(x, 8))
    assert h.min() >= 0 and h.max() < 256
    # roughly uniform: every bucket hit
    assert len(np.unique(h)) == 256


def test_filter_pallas_extra_cols_float():
    """Pallas compaction path with a float payload column."""
    rng = np.random.RandomState(6)
    x = rng.randint(0, 100, size=1500).astype(np.int32)
    v = rng.randn(1500).astype(np.float32)
    pred = lambda d: d % 3 == 0  # noqa: E731
    count, px, pv = ex.filter_compact(jnp.asarray(x), pred, jnp.asarray(v),
                                      use_pallas=True)
    m = x % 3 == 0
    assert int(count) == m.sum()
    np.testing.assert_array_equal(np.asarray(px)[:int(count)], x[m])
    np.testing.assert_array_equal(np.asarray(pv)[:int(count)], v[m])


@pytest.mark.parametrize("agg", ["sum", "count", "min", "max", "mean"])
@pytest.mark.parametrize("use_pallas", [True, False])
def test_group_aggregate_sorted_all_aggs(agg, use_pallas):
    """Unified gather path: every agg via sort-by-(key,value)."""
    rng = np.random.RandomState(7)
    keys = rng.randint(0, 40, size=1200).astype(np.uint32)
    vals = rng.randint(-50, 50, size=1200).astype(np.int32)
    vv = vals.astype(np.float32) if agg == "mean" else vals
    gkeys, table, count = ex.group_aggregate_sorted(
        jnp.asarray(keys), jnp.asarray(vv), num_groups=64, agg=agg,
        use_pallas=use_pallas)
    uniq = np.unique(keys)
    assert int(count) == len(uniq)
    np.testing.assert_array_equal(np.asarray(gkeys)[:len(uniq)], uniq)
    oracle = {"sum": np.sum, "count": len, "min": np.min, "max": np.max,
              "mean": np.mean}[agg]
    expect = np.array([oracle(vv[keys == k]) for k in uniq])
    np.testing.assert_allclose(np.asarray(table)[:len(uniq)], expect,
                               rtol=1e-6)


def test_group_aggregate_sorted_u64_keys():
    """64-bit keys ride two limbs through the Pallas column sort."""
    rng = np.random.RandomState(8)
    base = rng.randint(0, 1 << 62, size=12, dtype=np.uint64) * 4
    base[0] = np.uint64(2**64 - 1)  # top-bit key exercises high-limb flip
    keys = base[rng.randint(0, 12, size=600)]
    vals = rng.randint(0, 100, size=600).astype(np.int32)
    gkeys, table, count = ex.group_aggregate_sorted(
        jnp.asarray(keys), jnp.asarray(vals), num_groups=32, agg="sum")
    uniq = np.unique(keys)
    assert int(count) == len(uniq)
    np.testing.assert_array_equal(np.asarray(gkeys)[:len(uniq)], uniq)
    expect = np.array([vals[keys == k].sum() for k in uniq])
    np.testing.assert_array_equal(np.asarray(table)[:len(uniq)], expect)


@pytest.mark.parametrize("use_pallas", [True, False])
def test_hash_join_paths(use_pallas):
    rng = np.random.RandomState(9)
    dim_keys = np.unique(rng.randint(0, 1 << 16, size=300).astype(np.uint32))
    dim_vals = (dim_keys * 13 + 5).astype(np.uint32)
    perm = rng.permutation(len(dim_keys))
    fact = np.concatenate([
        dim_keys[rng.randint(0, len(dim_keys), size=900)],
        rng.randint(1 << 16, 1 << 17, size=77).astype(np.uint32)])
    rng.shuffle(fact)
    found, vals = ex.hash_join(jnp.asarray(dim_keys[perm]),
                               jnp.asarray(dim_vals[perm]),
                               jnp.asarray(fact), use_pallas=use_pallas)
    found, vals = np.asarray(found), np.asarray(vals)
    expect = np.isin(fact, dim_keys)
    np.testing.assert_array_equal(found, expect)
    np.testing.assert_array_equal(vals[expect], fact[expect] * 13 + 5)


def test_hash_join_float_vals_pallas():
    """4-byte float build values ride the probe sorts bitcast."""
    rng = np.random.RandomState(10)
    dim_keys = np.arange(64, dtype=np.uint32)
    dim_vals = rng.randn(64).astype(np.float32)
    fact = rng.randint(0, 80, size=500).astype(np.uint32)
    found, vals = ex.hash_join(jnp.asarray(dim_keys), jnp.asarray(dim_vals),
                               jnp.asarray(fact))
    found, vals = np.asarray(found), np.asarray(vals)
    np.testing.assert_array_equal(found, fact < 64)
    np.testing.assert_array_equal(vals[found], dim_vals[fact[found]])
