"""Window-frame kernel analogs of the reference's raster neighborhood
operators (SURVEY §2.9), plus the SQL-API surface and the pass-through
token invariant."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s1tiling_spark.operators.rollup import rollup_sequences
from s1tiling_spark.registry import register
from s1tiling_spark.sources.sequences import SEQUENCES_ORACLE_CTE, sequences_from_documents

_TIER_CTE = (
    "tier AS (SELECT date_trunc('hour', event_ts) AS bucket_start, source, "
    "count(*) AS cnt FROM sequences GROUP BY 1, 2)"
)


def _tier_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rollup_sequences(sequences_from_documents(spark, sf_dir), "1h").select(
        "bucket_start", "source", "cnt"
    )


# Despeckle (lee/frost smoothing, `SpatialDespeckle` s1_to_s2.py:1073-1178)
# → moving average over neighboring buckets
@register(
    "smooth_despeckle",
    oracle=(
        f"WITH {SEQUENCES_ORACLE_CTE}, {_TIER_CTE} "
        "SELECT source, bucket_start, cnt, "
        "CAST(sum(cnt) OVER w AS DOUBLE) / count(*) OVER w AS smoothed "
        "FROM tier WINDOW w AS (PARTITION BY source ORDER BY bucket_start "
        "ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)"
    ),
)
def smooth_despeckle(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("source").orderBy("bucket_start").rowsBetween(-2, 2)
    )
    tier = _tier_1h(spark, sf_dir)
    return tier.select(
        "source",
        "bucket_start",
        "cnt",
        (F.sum("cnt").over(w).cast("double") / F.count("*").over(w)).alias("smoothed"),
    )


# Morphological opening (`SmoothBorderMask` ball 5x5, s1_to_s2.py:1026-1068)
# → min-then-max over bucket neighborhoods (erosion then dilation)
@register(
    "morpho_open",
    oracle=(
        f"WITH {SEQUENCES_ORACLE_CTE}, {_TIER_CTE}, "
        "eroded AS (SELECT source, bucket_start, cnt, "
        "  min(cnt) OVER (PARTITION BY source ORDER BY bucket_start "
        "  ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS ero FROM tier) "
        "SELECT source, bucket_start, cnt, "
        "max(ero) OVER (PARTITION BY source ORDER BY bucket_start "
        "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS opened FROM eroded"
    ),
)
def morpho_open(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("source").orderBy("bucket_start").rowsBetween(-1, 1)
    tier = _tier_1h(spark, sf_dir)
    eroded = tier.withColumn("ero", F.min("cnt").over(w))
    return eroded.select(
        "source", "bucket_start", "cnt", F.max("ero").over(w).alias("opened")
    )


# SQL API surface: same rollup expressed through spark.sql over a temp
# view — proves the engine is reachable from pure SQL, the analog of the
# reference's expression-string surface (BandMath, SURVEY §2.8).
@register(
    "sql_api_rollup",
    oracle=(
        f"WITH {SEQUENCES_ORACLE_CTE} "
        "SELECT date_trunc('day', event_ts) AS bucket_start, source, "
        "count(*) AS cnt, CAST(sum(n_tok) AS BIGINT) AS sum_n_tok "
        "FROM sequences GROUP BY 1, 2"
    ),
)
def sql_api_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    sequences_from_documents(spark, sf_dir).createOrReplaceTempView("sequences_v")
    return spark.sql(
        "SELECT date_trunc('day', event_ts) AS bucket_start, source, "
        "count(*) AS cnt, CAST(sum(n_tok) AS BIGINT) AS sum_n_tok "
        "FROM sequences_v GROUP BY 1, 2"
    )


# Pass-through invariant (BASELINE.json input_hint): a calibration-style
# pass-through must preserve token arrays EXACTLY — the analog of the
# reference's Calibrate step leaving pixel geometry untouched
# (`s1_to_s2.py:346-419`) under the 1e-12 golden compare. The driver's
# canonicalizer can't sort raw array columns, so the gate compares an
# md5 digest of the full token payload per row — content-exact (any
# changed/reordered/dropped token changes the digest), and sortable.
@register(
    "passthrough_tokens",
    oracle=(
        f"WITH {SEQUENCES_ORACLE_CTE} "
        "SELECT doc_id, md5(array_to_string(tokens, ',')) AS tokens_digest, "
        "n_tok, source FROM sequences"
    ),
)
def passthrough_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    seq = sequences_from_documents(spark, sf_dir)
    # a no-op normalization pass: filter+select chain that must not
    # touch the payload
    return (
        seq.filter(F.col("n_tok") >= 0)
        .withColumn("_valid", F.size("tokens") == F.col("n_tok"))
        .filter(F.col("_valid"))
        .select(
            "doc_id",
            F.md5(F.concat_ws(",", F.col("tokens").cast("array<string>"))).alias(
                "tokens_digest"
            ),
            "n_tok",
            "source",
        )
    )
