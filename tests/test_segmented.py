"""Segmented scan tests: differential check against a serial host oracle.

Same strategy as the plain-scan tests (serial oracle with explicit dtype
semantics, `src/benchmarks/clo_scan_bench.c:246-271`), extended with the
segment dimension: random flag densities, all-flag/no-flag edges, flags
straddling block boundaries, and both the Pallas (interpret on CPU) and XLA
paths.
"""

import numpy as np
import pytest

from cl_ops_tpu.ops.scan import flags_from_segment_ids, segmented_scan_1d


def host_segmented_scan(x, flags, sum_dtype, exclusive):
    """Serial oracle with wrapping integer semantics."""
    out = np.zeros(len(x), dtype=sum_dtype)
    acc = np.asarray(0, sum_dtype)
    for i in range(len(x)):
        v = np.asarray(x[i], sum_dtype)
        if flags[i]:
            acc = np.asarray(0, sum_dtype)
        if exclusive:
            out[i] = acc
            acc = acc + v
        else:
            acc = acc + v
            out[i] = acc
    return out


def make_case(n, density, seed, dtype=np.uint32, hi=1000):
    rng = np.random.RandomState(seed)
    if np.dtype(dtype).kind in "iu":
        x = rng.randint(0, hi, size=n).astype(dtype)
    else:
        x = rng.rand(n).astype(dtype)
    flags = (rng.rand(n) < density).astype(np.int32)
    return x, flags


@pytest.mark.parametrize("use_pallas", [True, False])
@pytest.mark.parametrize("exclusive", [True, False])
@pytest.mark.parametrize("n,density", [(1, 0.5), (7, 0.3), (128, 0.1),
                                       (1000, 0.05), (4096, 0.02),
                                       (70000, 0.001)])
def test_matches_serial(n, density, exclusive, use_pallas):
    x, flags = make_case(n, density, seed=n + int(density * 100))
    out = np.asarray(segmented_scan_1d(
        x, flags, exclusive=exclusive, block_rows=8, use_pallas=use_pallas))
    expect = host_segmented_scan(x, flags, np.uint32, exclusive)
    np.testing.assert_array_equal(out, expect)


@pytest.mark.parametrize("use_pallas", [True, False])
@pytest.mark.parametrize("density", [0.0, 1.0])
def test_degenerate_flags(density, use_pallas):
    """No flags == plain scan; all flags == exclusive gives zeros."""
    x, flags = make_case(3000, density, seed=9)
    out = np.asarray(segmented_scan_1d(
        x, flags, exclusive=True, block_rows=8, use_pallas=use_pallas))
    if density == 0.0:
        expect = (np.cumsum(x, dtype=np.uint32) - x).astype(np.uint32)
    else:
        expect = np.zeros_like(x)
    np.testing.assert_array_equal(out, expect)


@pytest.mark.parametrize("use_pallas", [True, False])
def test_block_boundary_runs(use_pallas):
    """Segments spanning multiple kernel blocks exercise the SMEM carry."""
    n = 8 * 128 * 5  # 5 blocks at block_rows=8
    x = np.ones(n, np.uint32)
    flags = np.zeros(n, np.int32)
    flags[[0, 1500, 1501, 4000]] = 1  # mid-block, adjacent, cross-block runs
    out = np.asarray(segmented_scan_1d(
        x, flags, exclusive=False, block_rows=8, use_pallas=use_pallas))
    expect = host_segmented_scan(x, flags, np.uint32, exclusive=False)
    np.testing.assert_array_equal(out, expect)


@pytest.mark.parametrize("dtype,sum_dtype", [
    (np.uint8, np.uint32), (np.int32, np.int32), (np.uint32, np.uint64),
    (np.float32, np.float32), (np.int64, np.int64)])
def test_dtypes(dtype, sum_dtype):
    """Widening, 64-bit XLA fallback, and float paths."""
    x, flags = make_case(5000, 0.02, seed=11, dtype=dtype, hi=100)
    out = np.asarray(segmented_scan_1d(
        x, flags, sum_dtype=sum_dtype, exclusive=True, block_rows=8))
    expect = host_segmented_scan(x, flags, sum_dtype, exclusive=True)
    if np.dtype(sum_dtype).kind == "f":
        # Tree-scan association order differs from the serial oracle.
        np.testing.assert_allclose(out, expect, rtol=1e-5)
    else:
        np.testing.assert_array_equal(out, expect)


def test_wrapping_mod32():
    """Per-segment sums that overflow u32 wrap exactly like the oracle."""
    x, flags = make_case(4000, 0.005, seed=13, dtype=np.uint32,
                         hi=2**31 - 1)
    out = np.asarray(segmented_scan_1d(x, flags, exclusive=False,
                                       block_rows=8))
    expect = host_segmented_scan(x, flags, np.uint32, exclusive=False)
    np.testing.assert_array_equal(out, expect)


def test_flags_from_segment_ids():
    ids = np.array([5, 5, 5, 2, 2, 9, 9, 9, 9, 5], np.int32)
    flags = np.asarray(flags_from_segment_ids(ids))
    np.testing.assert_array_equal(
        flags, [1, 0, 0, 1, 0, 1, 0, 0, 0, 1])
    x = np.ones(len(ids), np.uint32)
    out = np.asarray(segmented_scan_1d(x, flags, exclusive=False))
    np.testing.assert_array_equal(out, [1, 2, 3, 1, 2, 1, 2, 3, 4, 1])


def test_flags_shape_mismatch():
    with pytest.raises(ValueError, match="flags shape"):
        segmented_scan_1d(np.ones(5, np.uint32), np.ones(4, np.int32))
