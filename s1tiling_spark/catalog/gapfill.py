"""Gap-fill queries + oracles (LOCF, linear interpolation) over the 1h
sequence tier."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s1tiling_spark.operators.gapfill import densify, linear_interpolate, locf
from s1tiling_spark.operators.rollup import rollup_sequences
from s1tiling_spark.registry import register
from s1tiling_spark.sources.sequences import SEQUENCES_ORACLE_CTE, sequences_from_documents

_TIER_1H_CTE = (
    "tier AS (SELECT date_trunc('hour', event_ts) AS bucket_start, source, "
    "count(*) AS cnt, CAST(sum(n_tok) AS BIGINT) AS sum_n_tok FROM sequences "
    "GROUP BY 1, 2), "
    "bounds AS (SELECT source, min(bucket_start) AS lo, max(bucket_start) AS hi "
    "FROM tier GROUP BY 1), "
    "grid AS (SELECT source, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) "
    "AS bucket_start FROM bounds), "
    "dense AS (SELECT g.source, g.bucket_start, t.cnt, t.sum_n_tok, "
    "t.cnt IS NULL AS gap_filled FROM grid g LEFT JOIN tier t "
    "USING (source, bucket_start))"
)

_LOCF_ORACLE = (
    f"WITH {SEQUENCES_ORACLE_CTE}, {_TIER_1H_CTE} "
    "SELECT source, bucket_start, "
    "last_value(cnt IGNORE NULLS) OVER w AS cnt, "
    "last_value(sum_n_tok IGNORE NULLS) OVER w AS sum_n_tok, gap_filled "
    "FROM dense WINDOW w AS (PARTITION BY source ORDER BY bucket_start "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
)


def _tier_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    seq = sequences_from_documents(spark, sf_dir)
    return rollup_sequences(seq, "1h").select("bucket_start", "source", "cnt", "sum_n_tok")


@register("gapfill_locf_1h", oracle=_LOCF_ORACLE)
def gapfill_locf_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    dense = densify(_tier_1h(spark, sf_dir), "1h")
    return locf(dense, ["cnt", "sum_n_tok"]).select(
        "source", "bucket_start", "cnt", "sum_n_tok", "gap_filled"
    )


_LINEAR_ORACLE = (
    f"WITH {SEQUENCES_ORACLE_CTE}, {_TIER_1H_CTE} "
    "SELECT source, bucket_start, "
    "CASE WHEN avg_v IS NOT NULL THEN avg_v "
    "     WHEN pv IS NOT NULL AND nv IS NOT NULL THEN "
    "          pv + (nv - pv) * ((ts - pt) / (nt - pt)) "
    "     WHEN pv IS NOT NULL THEN pv ELSE nv END AS avg_n_tok, gap_filled "
    "FROM (SELECT source, bucket_start, gap_filled, avg_v, "
    "  CAST(epoch(bucket_start) AS DOUBLE) AS ts, "
    "  last_value(avg_v IGNORE NULLS) OVER wp AS pv, "
    "  last_value(CASE WHEN avg_v IS NOT NULL THEN CAST(epoch(bucket_start) AS DOUBLE) END "
    "             IGNORE NULLS) OVER wp AS pt, "
    "  first_value(avg_v IGNORE NULLS) OVER wn AS nv, "
    "  first_value(CASE WHEN avg_v IS NOT NULL THEN CAST(epoch(bucket_start) AS DOUBLE) END "
    "              IGNORE NULLS) OVER wn AS nt "
    "  FROM (SELECT *, CAST(sum_n_tok AS DOUBLE) / cnt AS avg_v FROM dense) "
    "  WINDOW wp AS (PARTITION BY source ORDER BY bucket_start "
    "                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), "
    "         wn AS (PARTITION BY source ORDER BY bucket_start "
    "                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))"
)


@register("gapfill_linear_1h", oracle=_LINEAR_ORACLE)
def gapfill_linear_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    dense = densify(_tier_1h(spark, sf_dir), "1h").withColumn(
        "avg_n_tok", F.col("sum_n_tok").cast("double") / F.col("cnt")
    )
    return linear_interpolate(dense, "avg_n_tok").select(
        "source", "bucket_start", "avg_n_tok", "gap_filled"
    )
