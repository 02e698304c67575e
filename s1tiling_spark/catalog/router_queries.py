"""Tier-router query: a time-range aggregate answered from the
materialized tiers (coarsest-covering decomposition, plans/router.py)
and gated against a DIRECT RAW-TABLE SCAN oracle — the strongest
possible statement that the continuous aggregates are lossless.

The fixture spans 45 days, which cannot contain a full epoch-aligned
30d block interior to a day-aligned range, so the registered query
exercises the 1h+1d paths; the 30d path is exercised by
tests/test_router.py over a 90-day synthetic series.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

from s1tiling_spark.operators.rollup import rollup_from_lower, rollup_sequences
from s1tiling_spark.plans.router import routed_range_totals
from s1tiling_spark.registry import register
from s1tiling_spark.sources.sequences import SEQUENCES_ORACLE_CTE, sequences_from_documents

_START = "2024-01-03 07:00:00"
_END = "2024-02-09 17:00:00"


@register(
    "tier_routed_range",
    oracle=(
        f"WITH {SEQUENCES_ORACLE_CTE} "
        "SELECT source, count(*) AS cnt, "
        "CAST(sum(n_tok) AS BIGINT) AS sum_n_tok FROM sequences "
        f"WHERE event_ts >= TIMESTAMP '{_START}' "
        f"AND event_ts < TIMESTAMP '{_END}' GROUP BY source"
    ),
)
def tier_routed_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    seq = sequences_from_documents(spark, sf_dir)
    # persist the fine tiers: the 3-way union would otherwise re-derive
    # the raw scan + 1h aggregate once per tier slice (in production
    # the tiers are materialized tables, so the cache stands in for the
    # store read)
    t1h = rollup_sequences(seq, "1h").persist()
    t1d = rollup_from_lower(t1h, "1d").persist()
    t30d = rollup_from_lower(t1d, "30d")
    return routed_range_totals(
        t1h,
        t1d,
        t30d,
        datetime.fromisoformat(_START),
        datetime.fromisoformat(_END),
    )
