"""Device-mesh helpers.

The reference is strictly single-device (`SURVEY.md` §2.3; e.g.
`clo_sort_abstract.c:333-341` picks device 0 of one context). The mesh layer
is therefore new-framework territory (BASELINE.json north star): operators
scale by hash/range-partitioning rows over a 1-D "data" mesh axis, with XLA
collectives over ICI/DCN replacing the reference's absent distributed backend.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, axis: str = DATA_AXIS) -> Mesh:
    """A 1-D mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def row_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Rows partitioned over the mesh axis — the DP-for-tables layout."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
