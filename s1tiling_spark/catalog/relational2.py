"""Second batch of SURVEY §2 mappings: failed-pair blacklisting,
range join, as-of join, distinct aggregation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s1tiling_spark.registry import register
from s1tiling_spark.sources.tables import load_table


# Failed-pair blacklisting — `_filter_complete_dowloads_by_pair`
# S1FileManager.py:1148-1206: if any member of a group failed, drop the
# whole group (bool_and) and emit the skipped set as a side output.
@register(
    "pair_blacklist",
    oracle=(
        "SELECT e.event_id, e.user_id, e.event_type FROM events e "
        "JOIN (SELECT user_id, bool_and(event_type <> 'error') AS ok "
        "      FROM events GROUP BY user_id) g USING (user_id) "
        "WHERE g.ok"
    ),
)
def pair_blacklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    ok = ev.groupBy("user_id").agg(
        F.bool_and(F.col("event_type") != "error").alias("ok")
    )
    return (
        ev.join(ok, "user_id")
        .filter(F.col("ok"))
        .select("event_id", "user_id", "event_type")
    )


# Spatial theta-join analog — `get_s1_intersect_by_tile`
# S1FileManager.py:1355-1388: polygon∩polygon nested loop → here a true
# RANGE (non-equi) join: events against a small interval dimension,
# broadcast nested-loop on ts BETWEEN lo AND hi.
@register(
    "range_join",
    oracle=(
        "WITH intervals AS ("
        "  SELECT CAST(r_regionkey AS BIGINT) AS iv_id, "
        "  TIMESTAMP '2024-01-01' + CAST(r_regionkey*60 AS BIGINT) * INTERVAL 1 HOUR AS lo, "
        "  TIMESTAMP '2024-01-01' + CAST((r_regionkey*60 + 59) AS BIGINT) * INTERVAL 1 HOUR AS hi "
        "  FROM region) "
        "SELECT iv_id, count(*) AS n_events, count(DISTINCT user_id) AS n_users "
        "FROM events JOIN intervals ON ts >= lo AND ts <= hi "
        "GROUP BY iv_id"
    ),
)
def range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    region = load_table(spark, "region", sf_dir)
    base = F.lit("2024-01-01 00:00:00").cast("timestamp")
    intervals = region.select(
        F.col("r_regionkey").cast("long").alias("iv_id"),
        F.timestamp_add("HOUR", (F.col("r_regionkey") * 60).cast("int"), base).alias("lo"),
        F.timestamp_add("HOUR", (F.col("r_regionkey") * 60 + 59).cast("int"), base).alias("hi"),
    )
    return (
        ev.join(
            F.broadcast(intervals),
            (F.col("ts") >= F.col("lo")) & (F.col("ts") <= F.col("hi")),
        )
        .groupBy("iv_id")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# As-of join — the reference's best-input-before-this-one reduction
# (`reduce_inputs` lia.py:451-487) as a true time-ordered as-of: for
# every 'signup' event, the user's latest earlier 'click'. Implemented
# with the union+ordered-window LOCF trick (no native asof in Spark);
# the oracle uses the identical window formulation.
@register(
    "asof_join",
    oracle=(
        "SELECT event_id, user_id, ts, asof_click_ts FROM ("
        "  SELECT event_id, user_id, ts, event_type, "
        "    max(CASE WHEN event_type = 'click' THEN ts END) OVER ("
        "      PARTITION BY user_id ORDER BY ts, event_id "
        "      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS asof_click_ts "
        "  FROM events WHERE event_type IN ('signup', 'click')) "
        "WHERE event_type = 'signup'"
    ),
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("event_type").isin("signup", "click")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    clicked = ev.withColumn(
        "asof_click_ts",
        F.max(F.when(F.col("event_type") == "click", F.col("ts"))).over(w),
    )
    return clicked.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts", "asof_click_ts"
    )


# Distinct aggregation (absent in the reference — SURVEY §2.4 note):
# exact count-distinct per group.
@register(
    "distinct_agg",
    oracle=(
        "SELECT event_type, count(DISTINCT user_id) AS n_users, "
        "count(*) AS n_events FROM events GROUP BY event_type"
    ),
)
def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )
