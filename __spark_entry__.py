"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``s1tiling_spark`` package; this module is
the thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full 1h→1d→30d retention-tier cascade over the
    tokenized sequence table at sf0.001, returned as one stacked tier
    table (tier, bucket_start, source, cnt, sum_n_tok, min_n_tok,
    max_n_tok)."""
    from s1tiling_spark.operators.rollup import rollup_from_lower, rollup_sequences
    from s1tiling_spark.sources.sequences import sequences_from_documents

    seq = sequences_from_documents(spark, "/root/testdata/sf0.001")
    t1h = rollup_sequences(seq, "1h")
    t1d = rollup_from_lower(t1h, "1d")
    t30d = rollup_from_lower(t1d, "30d")
    return (
        t1h.withColumn("tier", F.lit("1h"))
        .unionByName(t1d.withColumn("tier", F.lit("1d")))
        .unionByName(t30d.withColumn("tier", F.lit("30d")))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from s1tiling_spark import registry

    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (tables pre-registered as views)."""
    from s1tiling_spark import registry

    return registry.oracle_sql()
