"""Basic statistical quality battery for the RNG generators.

The reference outsources statistical testing to dieharder
(`src/benchmarks/clo_rng_bench.c:266-270`), which is not available in this
image; this is a lightweight in-repo battery (monobit frequency, byte
chi-square, serial run-length) that would catch gross regressions — a
broken shift constant or seeding collapse — not subtle bias.
"""

import numpy as np
import pytest

from cl_ops_tpu.ops import rng as rng_mod

GENS = ["lcg", "xorshift64", "xorshift128", "mwc64x", "tauslcg", "threefry"]
# parkmiller draws have a zero low bit by construction (value << 1,
# clo_rng_parkmiller.cl:57) — excluded from bit-level tests like the
# reference excludes nothing but documents visual artifacts.
#
# Battery setup: xs1 seed hash + 16-draw warm-up. The LCG-family
# generators seeded from consecutive hashed gids need both (measured:
# tauslcg under the knuth hash shows 0.45 cross-stream correlation —
# characterized below; the reference has the identical seeding).
WARMUP = 16


def _corr(a, b):
    """Pearson correlation of two equally-shaped draw matrices."""
    a = a.astype(np.float64) - a.astype(np.float64).mean()
    b = b.astype(np.float64) - b.astype(np.float64).mean()
    return float((a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum()))


def _draws(gen, n_streams=4096, draws=64, seed=123):
    r = rng_mod.rng_new(gen, "dev_gid", num_streams=n_streams,
                        main_seed=seed, hash_name="xs1")
    return np.asarray(r.generate(draws + WARMUP))[WARMUP:]


@pytest.mark.parametrize("gen", GENS)
def test_monobit_frequency(gen):
    vals = _draws(gen)
    bits = np.unpackbits(vals.view(np.uint8))
    ones = bits.mean()
    # n = 4096*64*32 bits; 5-sigma bound on the proportion ~ 0.5 +- 0.001
    assert abs(ones - 0.5) < 2e-3, f"{gen}: ones fraction {ones}"


@pytest.mark.parametrize("gen", GENS)
def test_byte_chi_square(gen):
    vals = _draws(gen)
    counts = np.bincount(vals.reshape(-1).view(np.uint8), minlength=256)
    n = counts.sum()
    expect = n / 256
    chi2 = float(((counts - expect) ** 2 / expect).sum())
    # df=255: mean 255, sd ~22.6; allow 6 sigma
    assert chi2 < 255 + 6 * 22.6, f"{gen}: chi2={chi2}"


@pytest.mark.parametrize("gen", GENS)
def test_stream_decorrelation(gen):
    """Adjacent streams must not be correlated (GID seeding + hash)."""
    vals = _draws(gen, n_streams=512, draws=256)
    corr = _corr(vals[:, ::2], vals[:, 1::2])
    assert abs(corr) < 0.01, f"{gen}: stream corr {corr}"


def test_threefry_draw_decorrelation():
    """Successive draws of one stream are independent (counter-based)."""
    vals = _draws("threefry", n_streams=256, draws=512)
    assert abs(_corr(vals[:-1], vals[1:])) < 0.01


def test_tauslcg_knuth_seeding_weakness_characterized():
    """Documented weakness: tauslcg + knuth hash correlates adjacent
    streams (the seed is duplicated into both state halves,
    clo_rng_tauslcg.cl:32; the reference seeds identically). The xs1 hash
    or a warm-up fixes it — this test pins the behavior so a future
    seeding change is noticed."""
    r = rng_mod.rng_new("tauslcg", "dev_gid", num_streams=512,
                        main_seed=123, hash_name="knuth")
    vals = np.asarray(r.generate(256))
    assert _corr(vals[:, ::2], vals[:, 1::2]) > 0.1  # real and measurable
