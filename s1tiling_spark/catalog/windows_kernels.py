"""Window-frame kernel analogs of the reference's raster neighborhood
operators (SURVEY §2.9), plus the SQL-API surface and the pass-through
token invariant.

The three despeckle/morphology kernels are folded into ONE gated
multi-column query (driver correctness window caps at 50 entries):
``smoothed`` = moving-average despeckle, ``lee`` = variance-weighted
adaptive (Lee) despeckle, ``opened`` = morphological opening.
"""

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


# Per-document kernel outputs — two same-grain §2.9 gates as named
# columns of one query (driver correctness window caps at 50 entries):
#
# 1. Pass-through invariant (BASELINE.json input_hint): a
#    calibration-style pass-through must preserve token arrays EXACTLY —
#    the analog of the reference's Calibrate step leaving pixel geometry
#    untouched (`s1_to_s2.py:346-419`) under the 1e-12 golden compare.
#    The driver's canonicalizer can't sort raw array columns, so the
#    gate compares an md5 digest of the full token payload per row —
#    content-exact (any changed/reordered/dropped token changes the
#    digest), and sortable → ``tokens_digest``.
# 2. Ground + satellite XYZ derived-feature kernel
#    (`ComputeGroundAndSatPositionsOnDEM` / SARDEMProjection2,
#    `/root/reference/s1tiling/libs/otbwrappers/lia.py:402-606`): each
#    row derives a unit "ground vector" and a shifted "satellite
#    vector" from its scalar columns; the LIA-cosine analog is their
#    normalized dot product — all IEEE-exact +,*,/ and sqrt →
#    ``gx``, ``gy``, ``gz``, ``cos_lia``.
@register(
    "passthrough_tokens",
    oracle=(
        f"WITH {SEQUENCES_ORACLE_CTE}, "
        "b AS (SELECT doc_id, tokens, n_tok, source, "
        "  CAST(n_tok AS DOUBLE) AS nt, "
        "  CAST(CAST(doc_id AS BIGINT) % 1000 AS DOUBLE) AS d FROM sequences), "
        "g AS (SELECT *, sqrt(nt*nt + d*d + 1.0) AS r, "
        "  sqrt((nt+100.0)*(nt+100.0) + d*d + 1.0) AS rs FROM b) "
        "SELECT doc_id, md5(array_to_string(tokens, ',')) AS tokens_digest, "
        "n_tok, source, "
        "nt / r AS gx, d / r AS gy, 1.0 / r AS gz, "
        "((nt*(nt+100.0) + d*d + 1.0) / (r * rs)) AS cos_lia "
        "FROM g"
    ),
)
def passthrough_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    seq = sequences_from_documents(spark, sf_dir)
    nt = F.col("n_tok").cast("double")
    d = (F.col("doc_id").cast("long") % 1000).cast("double")
    r = F.sqrt(nt * nt + d * d + F.lit(1.0))
    rs = F.sqrt((nt + 100.0) * (nt + 100.0) + d * d + F.lit(1.0))
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
            (nt / r).alias("gx"),
            (d / r).alias("gy"),
            (F.lit(1.0) / r).alias("gz"),
            ((nt * (nt + 100.0) + d * d + 1.0) / (r * rs)).alias("cos_lia"),
        )
    )


# Despeckle family (`SpatialDespeckle` lee/frost/gammamap/kuan with
# window radius, s1_to_s2.py:1073-1178) + morphological opening
# (`SmoothBorderMask` ball 5x5, s1_to_s2.py:1026-1068), as window-frame
# kernels over the 1h tier:
#
# - smoothed: plain ±2 moving average (boxcar despeckle);
# - lee: the Lee adaptive filter x̂ = m + v/(v+σ²)·(x−m) with local
#   window mean m and variance v and a fixed noise variance σ² — flat
#   regions collapse to the mean, edges pass through (the family's
#   defining behaviour). Pure +,-,*,/ on exact integer window sums →
#   deterministic doubles on both engines.
# - opened: min-then-max over ±1 neighborhoods (erosion then dilation).
_NOISE_VAR = 4.0


@register(
    "window_kernels",
    oracle=(
        f"WITH {SEQUENCES_ORACLE_CTE}, {_TIER_CTE}, "
        "s AS (SELECT source, bucket_start, cnt, "
        "  CAST(sum(cnt) OVER w AS BIGINT) AS w_sum, "
        "  CAST(sum(cnt*cnt) OVER w AS BIGINT) AS w_sq, "
        "  count(*) OVER w AS w_n, "
        "  min(cnt) OVER w1 AS ero "
        "  FROM tier "
        "  WINDOW w AS (PARTITION BY source ORDER BY bucket_start "
        "               ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING), "
        "         w1 AS (PARTITION BY source ORDER BY bucket_start "
        "               ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)), "
        "m AS (SELECT source, bucket_start, cnt, "
        "  CAST(w_sum AS DOUBLE) / w_n AS mean, "
        "  greatest(CAST(w_sq AS DOUBLE) / w_n "
        "    - (CAST(w_sum AS DOUBLE) / w_n) * (CAST(w_sum AS DOUBLE) / w_n), "
        "    0.0) AS var, ero FROM s) "
        "SELECT source, bucket_start, cnt, mean AS smoothed, "
        f"mean + (var / (var + {_NOISE_VAR})) * (cnt - mean) AS lee, "
        "max(ero) OVER (PARTITION BY source ORDER BY bucket_start "
        "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS opened "
        "FROM m"
    ),
)
def window_kernels(spark: SparkSession, sf_dir: str) -> DataFrame:
    tier = _tier_1h(spark, sf_dir)
    w = Window.partitionBy("source").orderBy("bucket_start").rowsBetween(-2, 2)
    w1 = Window.partitionBy("source").orderBy("bucket_start").rowsBetween(-1, 1)
    w_sum = F.sum("cnt").over(w)
    w_sq = F.sum(F.col("cnt") * F.col("cnt")).over(w)
    w_n = F.count("*").over(w)
    mean = w_sum.cast("double") / w_n
    var = F.greatest(
        w_sq.cast("double") / w_n - mean * mean, F.lit(0.0)
    )
    lee = mean + (var / (var + F.lit(_NOISE_VAR))) * (F.col("cnt") - mean)
    eroded = tier.select(
        "source",
        "bucket_start",
        "cnt",
        mean.alias("smoothed"),
        lee.alias("lee"),
        F.min("cnt").over(w1).alias("ero"),
    )
    return eroded.select(
        "source",
        "bucket_start",
        "cnt",
        "smoothed",
        "lee",
        F.max("ero").over(w1).alias("opened"),
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
