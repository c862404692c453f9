"""Scan operator family: prefix sums (exclusive/inclusive).

Public surface mirrors the reference's scan module (`src/cl_ops/scan/`):
  scan_new(...)                 — clo_scan_new (clo_scan_abstract.c:74)
  Scan.scan_with_device_data    — clo_scan_with_device_data
  Scan.scan_with_host_data      — clo_scan_with_host_data
  scan_names()                  — impl registry introspection
"""

from cl_ops_tpu.ops.scan.abstract import (Scan, ScanImplDef, scan_impls,
                                          scan_names, scan_new)
from cl_ops_tpu.ops.scan.kernels import scan_1d
from cl_ops_tpu.ops.scan.segmented import (flags_from_segment_ids,
                                           segmented_scan_1d)

__all__ = ["Scan", "ScanImplDef", "flags_from_segment_ids", "scan_1d",
           "scan_impls", "scan_names", "scan_new", "segmented_scan_1d"]
