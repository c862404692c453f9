"""Sort operator family: 4 reference-parity algorithms + XLA baseline.

Public surface mirrors the reference's sort module (`src/cl_ops/sort/`):
  sort_new(...)                 — clo_sort_new (clo_sort_abstract.c:91)
  Sorter.sort_with_device_data  — clo_sort_with_device_data (+ KV extension)
  Sorter.sort_with_host_data    — clo_sort_with_host_data
  sort_names()                  — impl registry ("sbitonic", "abitonic",
                                  "gselect", "satradix", "xla")
"""

from cl_ops_tpu.ops.sort import keys
from cl_ops_tpu.ops.sort.abstract import (Sorter, SortImplDef, SortSpec,
                                          sort_impls, sort_names, sort_new)
# Implementations self-register on import.
from cl_ops_tpu.ops.sort import bitonic as _bitonic  # noqa: F401
from cl_ops_tpu.ops.sort import gselect as _gselect  # noqa: F401
from cl_ops_tpu.ops.sort import satradix as _satradix  # noqa: F401
from cl_ops_tpu.ops.sort import xla_impl as _xla  # noqa: F401

__all__ = ["SortImplDef", "SortSpec", "Sorter", "keys", "sort_impls",
           "sort_names", "sort_new"]
