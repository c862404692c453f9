"""Flagship pipelines (the framework's "models")."""

from cl_ops_tpu.models.pipeline import (analytics_query, generate_table,
                                        rollup_query, sort_pipeline,
                                        star_query)

__all__ = ["analytics_query", "generate_table", "rollup_query",
           "sort_pipeline",
           "star_query"]
