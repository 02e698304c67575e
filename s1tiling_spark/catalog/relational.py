"""SURVEY.md §2 operator inventory, line by line, over the driver
tables — each entry cites the reference operator it re-expresses and
carries an exact DuckDB oracle.

Same-family gates are folded into multi-column / tagged-union queries
(the driver's correctness window caps at 50 entries): see
``filter_union_slices`` (date filter + category filter + unionByName)
and ``census_aggs`` (NoData census + distinct agg).

Float discipline: money-like aggregations use the *integer-cents*
pattern — ``sum(cast(round(x*100) as bigint)) / 100.0`` — in BOTH
engines. Integer sums are associative (exactly reproducible across
parallelism levels, SURVEY §7 "What's hard" #1) and double→integer
rounding of the identical IEEE double agrees between engines, whereas
double→DECIMAL casts do not (Java BigDecimal rounds the shortest
decimal representation; DuckDB rounds the raw double).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s1tiling_spark.registry import register
from s1tiling_spark.sources.tables import load_table


# ---------------------------------------------------------------- §2.2/§2.7
# Date-range filter (`is_product_in_time_range`,
# /root/reference/s1tiling/libs/S1FileManager.py:1341-1353) + orbit/
# platform category filter (`_keep_requested_orbits` S1FileManager.py:
# 366-398) + union-by-concatenation (S1FileManager.py:796, 812-816):
# two pushdown-filtered slices of the events table stacked with
# unionByName under a slice tag. Both predicates reach the parquet scan
# (partition/row-group pruning at scale — the analog of the reference's
# date pushdown to the catalog search, S1FileManager.py:782-794).
@register(
    "filter_union_slices",
    oracle=(
        "SELECT 'date' AS slice, event_id, user_id, ts, event_type, value "
        "FROM events WHERE ts BETWEEN TIMESTAMP '2024-01-08 00:00:00' "
        "AND TIMESTAMP '2024-01-14 23:59:59' "
        "UNION ALL "
        "SELECT 'cat' AS slice, event_id, user_id, ts, event_type, value "
        "FROM events "
        "WHERE event_type IN ('click', 'view') AND user_id % 4 = 1"
    ),
)
def filter_union_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    cols = ["event_id", "user_id", "ts", "event_type", "value"]
    a = ev.filter(
        F.col("ts").between("2024-01-08 00:00:00", "2024-01-14 23:59:59")
    ).select(F.lit("date").alias("slice"), *cols)
    b = ev.filter(
        F.col("event_type").isin("click", "view") & (F.col("user_id") % 4 == 1)
    ).select(F.lit("cat").alias("slice"), *cols)
    return a.unionByName(b)


# Redundant-product dedup — `_discard_small_redundant`
# S1FileManager.py:332-363 (same start, keep largest) → window rank
@register(
    "window_dedup",
    oracle=(
        "SELECT user_id, event_type, event_id, value FROM ("
        "  SELECT user_id, event_type, event_id, value, "
        "         row_number() OVER (PARTITION BY user_id, event_type "
        "                            ORDER BY ts DESC, event_id DESC) AS rk "
        "  FROM events) WHERE rk = 1"
    ),
)
def window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", "event_type", "event_id", "value")
    )


# Coverage-pair HAVING + semi-join back —
# `_filter_images_providing_enough_cover_by_pair` S1FileManager.py:240-288
@register(
    "having_semi_join",
    oracle=(
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
        "WHERE o_custkey IN (SELECT o_custkey FROM orders "
        "                    GROUP BY o_custkey "
        "                    HAVING CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) "
        "                           AS BIGINT) > 150000000)"
    ),
)
def having_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy + HAVING, then LEFT SEMI join back to keep contributing
    rows — exactly the reference's enough-cover-by-pair shape."""
    o = load_table(spark, "orders", sf_dir)
    good = (
        o.groupBy("o_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("tot"))
        .filter(F.col("tot") > 150000000)
        .select("o_custkey")
    )
    return o.join(good, "o_custkey", "left_semi").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


# Anti-join vs finished outputs —
# `does_final_product_need_to_be_generated_for` S1FileManager.py:164-218
@register(
    "anti_join_done",
    oracle=(
        "SELECT o_orderkey, o_orderstatus FROM orders o "
        "WHERE NOT EXISTS (SELECT 1 FROM lineitem l "
        "                  WHERE l.l_orderkey = o.o_orderkey "
        "                  AND l.l_returnflag = 'R')"
    ),
)
def anti_join_done(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    return o.join(
        li, o.o_orderkey == li.l_orderkey, "left_anti"
    ).select("o_orderkey", "o_orderstatus")


# ---------------------------------------------------------------- §2.3
# Broadcast dimension join — S2-tile × DEM-tile intersection
# `check_dem_coverage` S1FileManager.py:1390-1416 (small dim side)
@register(
    "broadcast_dim_join",
    oracle=(
        "SELECT r_name, n_name, count(*) AS n_cust, "
        "CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT)/100.0 AS sum_bal "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "GROUP BY r_name, n_name"
    ),
)
def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    n = F.broadcast(load_table(spark, "nation", sf_dir))
    r = F.broadcast(load_table(spark, "region", sf_dir))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_cust"),
            (F.sum(F.round(F.col("c_acctbal") * 100).cast("long")) / 100.0).alias(
                "sum_bal"
            ),
        )
    )


# σ0 × sin(LIA) calibration join — 1:N broadcast join + clamped product
# `ApplyLIACalibration` lia.py:952-1084, expression lia.py:1079-1083
@register(
    "calibration_join",
    oracle=(
        "WITH lia AS (SELECT event_type, avg(value) AS scale FROM events "
        "             GROUP BY event_type) "
        "SELECT e.event_id, e.event_type, "
        "CASE WHEN e.value = 0 THEN 0.0 "
        "     ELSE greatest(0.001, e.value / lia.scale) END AS calibrated "
        "FROM events e JOIN lia USING (event_type)"
    ),
)
def calibration_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact × tiny per-key map (one LIA map shared by N dates →
    broadcast), then `max(lower, x*y)`-style clamped expression."""
    ev = load_table(spark, "events", sf_dir)
    lia = ev.groupBy("event_type").agg(F.avg("value").alias("scale"))
    return ev.join(F.broadcast(lia), "event_type").select(
        "event_id",
        "event_type",
        F.when(F.col("value") == 0, F.lit(0.0))
        .otherwise(F.greatest(F.lit(0.001), F.col("value") / F.col("scale")))
        .alias("calibrated"),
    )


# Multi-input equi-join — SARDEMProjection/XYZ zips 2-3 named inputs
# lia.py:1427-1448, lia.py:512-526
@register(
    "multiway_join",
    oracle=(
        "SELECT n_name, count(*) AS n_items, "
        "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) "
        "     AS BIGINT)/100.0 AS revenue "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "WHERE o_orderstatus = 'F' GROUP BY n_name"
    ),
)
def multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "F")
    c = load_table(spark, "customer", sf_dir)
    n = F.broadcast(load_table(spark, "nation", sf_dir))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_items"),
            (
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    ).cast("long")
                )
                / 100.0
            ).alias("revenue"),
        )
    )


# As-of / best-input argmax — `SelectBestCoverage` lia.py:1693-1769
# (max coverage, tie → oldest) and `reduce_inputs` lia.py:451-487
@register(
    "argmax_best",
    oracle=(
        "SELECT source, bucket_start, cnt FROM ("
        "  SELECT source, date_trunc('day', "
        "           TIMESTAMP '2024-01-01 00:00:00' + (doc_id*797 % 64800) "
        "           * INTERVAL 1 MINUTE) AS bucket_start, "
        "         count(*) AS cnt FROM documents GROUP BY 1, 2) t "
        "QUALIFY row_number() OVER (PARTITION BY source "
        "        ORDER BY cnt DESC, bucket_start ASC) = 1"
    ),
)
def argmax_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source: the day with the highest sequence count (tie →
    earliest day) — rank-1 window, the reference's best-coverage pick."""
    from s1tiling_spark.operators.rollup import rollup_sequences
    from s1tiling_spark.sources.sequences import sequences_from_documents

    tier = rollup_sequences(sequences_from_documents(spark, sf_dir), "1d")
    w = Window.partitionBy("source").orderBy(F.desc("cnt"), F.asc("bucket_start"))
    return (
        tier.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("source", "bucket_start", "cnt")
    )


# ---------------------------------------------------------------- §2.4
# Mosaic / Synthetize — per-group first non-null (deterministic pick:
# smallest event_id) s1_to_s2.py:776-888
@register(
    "mosaic_first",
    oracle=(
        "SELECT date_trunc('hour', ts) AS bucket_start, event_type, "
        "min_by(value, event_id) AS first_val, count(*) AS n "
        "FROM events GROUP BY 1, 2"
    ),
)
def mosaic_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("bucket_start"), "event_type"
    ).agg(
        F.min_by("value", "event_id").alias("first_val"),
        F.count("*").alias("n"),
    )


# NoData census (`has_too_many_NoData` s1_to_s2.py:81-91) + exact
# count-distinct per group (absent in the reference — SURVEY §2.4
# note), folded into one per-event_type aggregate row.
@register(
    "census_aggs",
    oracle=(
        "SELECT event_type, "
        "CAST(sum(CASE WHEN value < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_nodata, "
        "count(*) AS n_total, "
        "count(DISTINCT user_id) AS n_users FROM events GROUP BY event_type"
    ),
)
def census_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        F.sum(F.when(F.col("value") < 10, 1).otherwise(0))
        .cast("long")
        .alias("n_nodata"),
        F.count("*").alias("n_total"),
        F.countDistinct("user_id").alias("n_users"),
    )


# ---------------------------------------------------------------- §2.6
# Top-k retention — `keep_X_latest_S1_files` S1FileManager.py:735-748
@register(
    "topk_latest",
    oracle=(
        "SELECT event_id, ts, user_id FROM events "
        "ORDER BY ts DESC, event_id DESC LIMIT 500"
    ),
)
def topk_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return ev.orderBy(F.desc("ts"), F.desc("event_id")).limit(500).select(
        "event_id", "ts", "user_id"
    )


# ---------------------------------------------------------------- §2.8
# BandMath expression chain — denoising floor
# `CorrectDenoising.parameters` s1_to_s2.py:504-527:
# im2b1==0?0:im1b1==0?1e-7:im1b1
@register(
    "denoise_expr",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        "CASE WHEN l_quantity = 0 THEN 0.0 "
        "     WHEN l_discount = 0 THEN 0.0000001 "
        "     ELSE l_extendedprice * (1 - l_discount) END AS denoised "
        "FROM lineitem"
    ),
)
def denoise_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") == 0, F.lit(0.0))
        .when(F.col("l_discount") == 0, F.lit(1e-7))
        .otherwise(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .alias("denoised"),
    )
