"""Flagship pipelines (the framework's "models")."""

from cl_ops_tpu.models.pipeline import (analytics_query, generate_table,
                                        sort_pipeline, star_query)

__all__ = ["analytics_query", "generate_table", "sort_pipeline",
           "star_query"]
