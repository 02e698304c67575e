"""Gap-fill query + oracle: LOCF and linear interpolation over the 1h
sequence tier, emitted as one multi-column gated query (the driver's
correctness window caps at 50 entries, so overlapping gates are folded
— each §2 row maps to a COLUMN here: ``cnt``/``sum_n_tok`` = LOCF,
``avg_n_tok`` = linear interpolation)."""

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
    "CAST(t.sum_n_tok AS DOUBLE) / t.cnt AS avg_v, "
    "t.cnt IS NULL AS gap_filled FROM grid g LEFT JOIN tier t "
    "USING (source, bucket_start))"
)

# LOCF (cnt, sum_n_tok) + linear interpolation (avg_n_tok) in one body:
# both reuse the same densified grid, same window frames as the Spark
# operators (operators/gapfill.py).
_GAPFILL_ORACLE = (
    f"WITH {SEQUENCES_ORACLE_CTE}, {_TIER_1H_CTE} "
    "SELECT source, bucket_start, "
    "last_value(cnt IGNORE NULLS) OVER wp AS cnt, "
    "last_value(sum_n_tok IGNORE NULLS) OVER wp AS sum_n_tok, "
    "CASE WHEN avg_v IS NOT NULL THEN avg_v "
    "     WHEN pv IS NOT NULL AND nv IS NOT NULL THEN "
    "          pv + (nv - pv) * ((ts - pt) / (nt - pt)) "
    "     WHEN pv IS NOT NULL THEN pv ELSE nv END AS avg_n_tok, gap_filled "
    "FROM (SELECT source, bucket_start, cnt, sum_n_tok, gap_filled, avg_v, "
    "  CAST(epoch(bucket_start) AS DOUBLE) AS ts, "
    "  last_value(avg_v IGNORE NULLS) OVER wp AS pv, "
    "  last_value(CASE WHEN avg_v IS NOT NULL THEN CAST(epoch(bucket_start) AS DOUBLE) END "
    "             IGNORE NULLS) OVER wp AS pt, "
    "  first_value(avg_v IGNORE NULLS) OVER wn AS nv, "
    "  first_value(CASE WHEN avg_v IS NOT NULL THEN CAST(epoch(bucket_start) AS DOUBLE) END "
    "              IGNORE NULLS) OVER wn AS nt "
    "  FROM dense "
    "  WINDOW wp AS (PARTITION BY source ORDER BY bucket_start "
    "                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), "
    "         wn AS (PARTITION BY source ORDER BY bucket_start "
    "                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) "
    "WINDOW wp AS (PARTITION BY source ORDER BY bucket_start "
    "              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
)


@register("gapfill_1h", oracle=_GAPFILL_ORACLE)
def gapfill_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densified 1h tier with LOCF-filled counts and linearly
    interpolated mean token length — both fill strategies over one
    grid pass."""
    seq = sequences_from_documents(spark, sf_dir)
    tier = rollup_sequences(seq, "1h").select(
        "bucket_start", "source", "cnt", "sum_n_tok"
    )
    dense = densify(tier, "1h").withColumn(
        "avg_n_tok", F.col("sum_n_tok").cast("double") / F.col("cnt")
    )
    lin = linear_interpolate(dense, "avg_n_tok")
    filled = locf(lin, ["cnt", "sum_n_tok"])
    return filled.select(
        "source", "bucket_start", "cnt", "sum_n_tok", "avg_n_tok", "gap_filled"
    )
