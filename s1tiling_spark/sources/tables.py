"""Parquet table loaders for the driver-generated test data.

The reference discovers its inputs by scanning a file catalog with
pushed-down predicates (`/root/reference/s1tiling/libs/S1FileManager.py:750-845`,
`_refresh_s1_product_list` `S1FileManager.py:1056-1146`). Here the
catalog is the storage layer itself: ``spark.read.parquet`` gives file
listing, schema, column pruning and predicate pushdown for free — the
Spark-native equivalent of that whole subsystem.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Load one driver parquet table. Predicates/projections applied by
    callers reach the scan via Catalyst pushdown — keep this a bare read."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
