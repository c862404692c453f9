"""Measurement + verification harness (ref L4: src/benchmarks/).

CLIs (argparse analogs of the reference's GOption executables):
  python -m cl_ops_tpu.bench.sort_bench   — clo_sort_bench parity
  python -m cl_ops_tpu.bench.scan_bench   — clo_scan_bench parity
  python -m cl_ops_tpu.bench.rng_bench    — clo_rng_bench parity
  python -m cl_ops_tpu.bench.plot_rng     — scripts/clo_rng_plot.py parity
"""

from cl_ops_tpu.bench.common import (compare_values, rand_array,
                                     throughput_m, time_async, write_tsv)

__all__ = ["compare_values", "rand_array", "throughput_m", "time_async",
           "write_tsv"]
