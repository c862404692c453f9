"""Mesh + collective layer: multi-chip operator scaling.

No referent in the reference library (single-device only, SURVEY.md §2.3);
this layer realizes the BASELINE.json north star: row-partitioned tables over
a device mesh, per-chip Pallas kernels wrapped in shard_map, XLA collectives
(all_gather/psum/all_to_all) over ICI/DCN as the exchange backend.
"""

from cl_ops_tpu.parallel.mesh import (DATA_AXIS, make_mesh, replicated,
                                      row_sharding)
from cl_ops_tpu.parallel.scan import dist_scan
from cl_ops_tpu.parallel.sort import dist_sort

__all__ = ["DATA_AXIS", "dist_scan", "dist_sort", "make_mesh", "replicated",
           "row_sharding"]
