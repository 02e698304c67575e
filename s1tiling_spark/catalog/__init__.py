"""Catalog: binds engine operators to the driver tables and pairs each
with its DuckDB oracle SQL. Importing this package populates the
registry (see s1tiling_spark.registry)."""

from s1tiling_spark.catalog import (  # noqa: F401
    dedup_queries,
    gapfill,
    relational,
    relational2,
    rollups,
    router_queries,
    scalar_exprs,
    multimodal_queries,
    pipeline_ops,
    similarity_queries,
    textstats_queries,
    timeseries_extras,
    tpch,
    windows_kernels,
)
