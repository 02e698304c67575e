"""Scalar-expression queries closing the remaining SURVEY §2.8/§2.9
rows: NaN-aware nodata testing, border-mask binarization, DEM+geoid
superimpose with nodata guard, IPF version compare, discrete-derivative
windows (surface-normal analog), and the ground+satellite XYZ
derived-feature kernel.

``tier_derived_cols`` folds three same-grain gates into one query
(driver correctness window caps at 50 entries): border mask
(``mask``/``masked_cnt``), DEM+geoid superimpose (``h``/``h_total``)
and the derivative window (``slope``/``grad``) — each §2 row maps to
its column pair.

Float determinism: every derived feature uses only +,-,*,/ and sqrt —
all IEEE-754 correctly-rounded, so Spark and DuckDB produce
bit-identical doubles (no libm trig, whose last-ulp behaviour is
engine-specific).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s1tiling_spark.operators.rollup import rollup_sequences
from s1tiling_spark.registry import register
from s1tiling_spark.sources.sequences import SEQUENCES_ORACLE_CTE, sequences_from_documents

_NODATA = -999.0

_TIER_CTE = (
    "tier AS (SELECT date_trunc('hour', event_ts) AS bucket_start, source, "
    "count(*) AS cnt FROM sequences GROUP BY 1, 2)"
)


def _tier_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rollup_sequences(sequences_from_documents(spark, sf_dir), "1h").select(
        "bucket_start", "source", "cnt"
    )


# ---------------------------------------------------------------------
# NaN-aware nodata test (`test_nodata_for_bandmath`,
# `/root/reference/s1tiling/libs/Utils.py:159-167`): nodata can be a
# sentinel value OR NaN; NaN needs `x != x` (here: isnan), the sentinel
# needs a null-safe equality. A value column with injected NULL / NaN /
# sentinel rows is classified and aggregated per class.
@register(
    "nodata_nan_guard",
    oracle=(
        f"WITH {SEQUENCES_ORACLE_CTE}, "
        "v AS (SELECT source, CASE "
        "  WHEN n_tok % 11 = 0 THEN NULL "
        "  WHEN n_tok % 7 = 0 THEN CAST('NaN' AS DOUBLE) "
        f"  WHEN n_tok % 5 = 0 THEN {_NODATA} "
        "  ELSE CAST(n_tok AS DOUBLE) END AS val FROM sequences), "
        "c AS (SELECT source, CASE "
        "  WHEN val IS NULL THEN 'null' "
        "  WHEN isnan(val) THEN 'nan' "
        f"  WHEN val IS NOT DISTINCT FROM {_NODATA} THEN 'nodata' "
        "  ELSE 'valid' END AS cls, val FROM v) "
        "SELECT source, cls, count(*) AS n, "
        "CAST(sum(CASE WHEN cls = 'valid' THEN val END) AS DOUBLE) AS sum_valid "
        "FROM c GROUP BY 1, 2"
    ),
)
def nodata_nan_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    seq = sequences_from_documents(spark, sf_dir)
    val = (
        F.when(F.col("n_tok") % 11 == 0, F.lit(None).cast("double"))
        .when(F.col("n_tok") % 7 == 0, F.lit(float("nan")))
        .when(F.col("n_tok") % 5 == 0, F.lit(_NODATA))
        .otherwise(F.col("n_tok").cast("double"))
    )
    v = seq.select("source", val.alias("val"))
    cls = (
        F.when(F.col("val").isNull(), F.lit("null"))
        .when(F.isnan("val"), F.lit("nan"))
        .when(F.col("val").eqNullSafe(F.lit(_NODATA)), F.lit("nodata"))
        .otherwise(F.lit("valid"))
    )
    return (
        v.withColumn("cls", cls)
        .groupBy("source", "cls")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("cls") == "valid", F.col("val"))).alias("sum_valid"),
        )
    )


# ---------------------------------------------------------------------
# Tier derived columns — three same-grain scalar kernels over the 1h
# tier, one row per (bucket_start, source):
#
# 1. Border-mask binarization (`BorderMask` BandMath `im1b1==0?0:1` +
#    threshold, `/root/reference/s1tiling/libs/otbwrappers/s1_to_s2.py:
#    966-1023`): threshold the tier value into a 0/1 mask and apply it
#    → ``mask``, ``masked_cnt``.
# 2. DEM + geoid superimpose with nodata guard (`SumAllHeights`
#    BandMath `im1b1==nodata ? nodata : im1b1+im2b1`,
#    `/root/reference/s1tiling/libs/otbwrappers/dem.py`): broadcast-join
#    a small per-source offset dim; nodata rows pass through unchanged
#    → ``h``, ``h_total``.
# 3. Discrete-derivative window — the surface-normals analog
#    (`ComputeNormals`/ExtractNormalVector, `lia.py:609-687`): backward
#    slope (lag) and centered gradient (lead - lag) per hour, exact
#    integer diffs divided once → ``slope``, ``grad``.
@register(
    "tier_derived_cols",
    oracle=(
        f"WITH {SEQUENCES_ORACLE_CTE}, {_TIER_CTE}, "
        "geoid AS (SELECT source, "
        "CAST(length(source) * 7 AS DOUBLE) AS goff "
        "FROM (SELECT DISTINCT source FROM tier)), "
        "v AS (SELECT bucket_start, t.source, cnt, "
        "CASE WHEN cnt >= 5 THEN 1 ELSE 0 END AS mask, "
        f"CASE WHEN cnt % 5 = 0 THEN {_NODATA} ELSE CAST(cnt AS DOUBLE) END AS h, "
        "g.goff FROM tier t JOIN geoid g ON t.source = g.source) "
        "SELECT bucket_start, source, cnt, mask, cnt * mask AS masked_cnt, h, "
        f"CASE WHEN h IS NOT DISTINCT FROM {_NODATA} THEN {_NODATA} "
        "ELSE h + goff END AS h_total, "
        "CAST((cnt - lag(cnt) OVER w) * 3600.0 "
        "  / (CAST(epoch(bucket_start) AS BIGINT) "
        "     - CAST(epoch(lag(bucket_start) OVER w) AS BIGINT)) AS DOUBLE) AS slope, "
        "CAST((lead(cnt) OVER w - lag(cnt) OVER w) * 3600.0 "
        "  / (CAST(epoch(lead(bucket_start) OVER w) AS BIGINT) "
        "     - CAST(epoch(lag(bucket_start) OVER w) AS BIGINT)) AS DOUBLE) AS grad "
        "FROM v WINDOW w AS (PARTITION BY source ORDER BY bucket_start)"
    ),
)
def tier_derived_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    tier = _tier_1h(spark, sf_dir)
    geoid = (
        tier.select("source")
        .distinct()
        .select("source", (F.length("source") * 7).cast("double").alias("offset"))
    )
    mask = F.when(F.col("cnt") >= 5, F.lit(1)).otherwise(F.lit(0))
    h = (
        F.when(F.col("cnt") % 5 == 0, F.lit(_NODATA))
        .otherwise(F.col("cnt").cast("double"))
    )
    v = tier.join(F.broadcast(geoid), "source").select(
        "bucket_start", "source", "cnt", mask.alias("mask"), h.alias("h"), "offset"
    )
    w = Window.partitionBy("source").orderBy("bucket_start")
    ts = F.unix_timestamp("bucket_start")
    lag_ts = F.unix_timestamp(F.lag("bucket_start").over(w))
    lead_ts = F.unix_timestamp(F.lead("bucket_start").over(w))
    slope = (F.col("cnt") - F.lag("cnt").over(w)) * 3600.0 / (ts - lag_ts)
    grad = (F.lead("cnt").over(w) - F.lag("cnt").over(w)) * 3600.0 / (lead_ts - lag_ts)
    return v.select(
        "bucket_start",
        "source",
        "cnt",
        "mask",
        (F.col("cnt") * F.col("mask")).alias("masked_cnt"),
        "h",
        F.when(F.col("h").eqNullSafe(F.lit(_NODATA)), F.lit(_NODATA))
        .otherwise(F.col("h") + F.col("offset"))
        .alias("h_total"),
        slope.cast("double").alias("slope"),
        grad.cast("double").alias("grad"),
    )


# ---------------------------------------------------------------------
# CutBorders (`ResetMargins`/cut helpers,
# `/root/reference/s1tiling/libs/otbwrappers/s1_to_s2.py:422-530`): the
# reference trims noisy sensor-edge rows from each image; here the
# "image" is a source's time-ordered bucket series and the trim drops
# the first/last 2 buckets per source — a rank-from-both-ends window,
# not a value filter.
_CUT_K = 2


@register(
    "cut_borders",
    oracle=(
        f"WITH {SEQUENCES_ORACLE_CTE}, {_TIER_CTE}, "
        "r AS (SELECT bucket_start, source, cnt, "
        "row_number() OVER (PARTITION BY source ORDER BY bucket_start ASC) AS rn_a, "
        "row_number() OVER (PARTITION BY source ORDER BY bucket_start DESC) AS rn_d "
        "FROM tier) "
        f"SELECT bucket_start, source, cnt FROM r WHERE rn_a > {_CUT_K} AND rn_d > {_CUT_K}"
    ),
)
def cut_borders(spark: SparkSession, sf_dir: str) -> DataFrame:
    tier = _tier_1h(spark, sf_dir)
    wa = Window.partitionBy("source").orderBy(F.asc("bucket_start"))
    wd = Window.partitionBy("source").orderBy(F.desc("bucket_start"))
    return (
        tier.withColumn("rn_a", F.row_number().over(wa))
        .withColumn("rn_d", F.row_number().over(wd))
        .filter((F.col("rn_a") > _CUT_K) & (F.col("rn_d") > _CUT_K))
        .select("bucket_start", "source", "cnt")
    )


# ---------------------------------------------------------------------
# IPF version extract + compare (`get_ipf_version` /
# `s1_process --ipf` gating; the reference parses the IPF version from
# manifest metadata and branches on it — e.g. calibration changes at
# IPF 2.90). Version strings are synthesized per doc, parsed with
# regexp_extract, and compared NUMERICALLY (major, then minor) — a
# string compare would put '2.10' < '2.9'.
@register(
    "ipf_version_gate",
    oracle=(
        "WITH d AS (SELECT doc_id, source, "
        "  'IPF-' || CAST(doc_id % 4 + 1 AS VARCHAR) || '.' || "
        "  CAST(doc_id * 7 % 100 AS VARCHAR) AS ver FROM documents), "
        "p AS (SELECT doc_id, source, ver, "
        "  CAST(regexp_extract(ver, 'IPF-(\\d+)\\.(\\d+)', 1) AS INT) AS major, "
        "  CAST(regexp_extract(ver, 'IPF-(\\d+)\\.(\\d+)', 2) AS INT) AS minor "
        "FROM d) "
        "SELECT doc_id, ver, major, minor FROM p "
        "WHERE major > 2 OR (major = 2 AND minor >= 90)"
    ),
)
def ipf_version_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from s1tiling_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    d = docs.select(
        "doc_id",
        "source",
        F.concat(
            F.lit("IPF-"),
            (F.col("doc_id") % 4 + 1).cast("string"),
            F.lit("."),
            (F.col("doc_id") * 7 % 100).cast("string"),
        ).alias("ver"),
    )
    p = d.select(
        "doc_id",
        "ver",
        F.regexp_extract("ver", r"IPF-(\d+)\.(\d+)", 1).cast("int").alias("major"),
        F.regexp_extract("ver", r"IPF-(\d+)\.(\d+)", 2).cast("int").alias("minor"),
    )
    return p.filter(
        (F.col("major") > 2) | ((F.col("major") == 2) & (F.col("minor") >= 90))
    )


# NOTE: the ground+satellite XYZ derived-feature kernel
# (`ComputeGroundAndSatPositionsOnDEM` / SARDEMProjection2,
# `lia.py:402-606`) is gated as the ``gx``/``gy``/``gz``/``cos_lia``
# columns of `passthrough_tokens` (catalog/windows_kernels.py) — merged
# there to keep every core gate inside the driver's 50-entry
# correctness window (see COVERAGE.md).
