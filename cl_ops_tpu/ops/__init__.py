"""Operator families: rng, scan, sort, exec (query operators)."""

from cl_ops_tpu.ops import rng, scan, sort  # noqa: F401

__all__ = ["rng", "scan", "sort"]
