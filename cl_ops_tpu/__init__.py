"""cl_ops_tpu — TPU-native data-parallel primitives and query execution.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
OpenCL library `nunofachada/cl_ops` (sorting, prefix-sum scan, per-stream PRNG),
re-designed TPU-first and extended into a vectorized query-execution engine
(filter, hash aggregate, hash join) that scales over device meshes.

Layer map (new framework):
  core/     — dtype registry, op registries, errors        (ref L1: common/)
  utils/    — bit/worksize helpers, logging                  (ref L1)
  ops/      — rng/, scan/, sort/, exec/ operator families    (ref L2+L3)
  parallel/ — mesh + collective layer (shard_map, all_to_all)(no referent; north star)
  models/   — flagship query pipelines                       (north star)
  bench/    — measurement + verification harness             (ref L4: benchmarks/)
"""

from cl_ops_tpu.core import dtypes, errors, registry
from cl_ops_tpu.utils import bits

__version__ = "0.1.0"

__all__ = ["dtypes", "errors", "registry", "bits", "__version__"]
