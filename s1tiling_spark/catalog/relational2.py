"""Second batch of SURVEY §2 mappings: failed-pair blacklisting,
interval-coverage join (the reference's spatial coverage semantics in
1-D), as-of join."""

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


# Spatial coverage join — `get_s1_intersect_by_tile` +
# `_filter_images_or_pairs_providing_enough_cover_by_pair`
# (S1FileManager.py:1355-1388, 291-329; coverage arithmetic
# Utils.py:382-407): the reference computes polygon-intersection
# COVERAGE PER PAIR and keeps pairs above a threshold — not mere
# membership. 1-D analog: each event spawns a duration segment
# [ts, ts + (1 + user_id%6) hours]; segments theta-join a small
# broadcast interval dimension, the overlap FRACTION of each segment is
# computed in exact integer seconds, pairs below 50% coverage are
# dropped (the per-pair HAVING), and surviving pairs aggregate to
# per-interval stats. Aggregation sums INTEGER seconds (associative →
# deterministic at any parallelism); the single final division produces
# the mean coverage.
_COV_TAU = 0.5  # keep pairs covering >= 50% of the segment


@register(
    "coverage_join",
    oracle=(
        # all bounds in exact integer MICROSECONDS (epoch_us == Spark's
        # unix_micros; epoch() seconds would ROUND fractional seconds in
        # DuckDB while Spark's unix_timestamp truncates)
        "WITH intervals AS ("
        "  SELECT CAST(r_regionkey AS BIGINT) AS iv_id, "
        "  epoch_us(TIMESTAMP '2024-01-01') "
        "    + CAST(r_regionkey AS BIGINT)*60*3600*1000000 AS lo_s, "
        "  epoch_us(TIMESTAMP '2024-01-01') "
        "    + (CAST(r_regionkey AS BIGINT)*60 + 59)*3600*1000000 AS hi_s "
        "  FROM region), "
        "segs AS (SELECT event_id, user_id, "
        "  epoch_us(ts) AS s_lo, "
        "  epoch_us(ts) + CAST(1 + user_id % 6 AS BIGINT) * 3600 * 1000000 AS s_hi "
        "  FROM events), "
        "pairs AS ("
        "  SELECT iv_id, event_id, "
        "    least(hi_s, s_hi) - greatest(lo_s, s_lo) AS overlap_s, "
        "    s_hi - s_lo AS seg_s "
        "  FROM segs JOIN intervals "
        "    ON s_lo <= hi_s AND s_hi >= lo_s), "
        "cov AS (SELECT iv_id, event_id, overlap_s, seg_s "
        f"  FROM pairs WHERE overlap_s > 0 AND overlap_s >= {_COV_TAU} * seg_s) "
        "SELECT iv_id, count(*) AS n_cov, "
        "CAST(sum(overlap_s) AS BIGINT) AS sum_overlap_s, "
        "CAST(sum(seg_s) AS BIGINT) AS sum_seg_s, "
        "CAST(sum(overlap_s) AS BIGINT) / CAST(CAST(sum(seg_s) AS BIGINT) AS DOUBLE) "
        "AS mean_cov FROM cov GROUP BY iv_id"
    ),
)
def coverage_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    region = load_table(spark, "region", sf_dir)
    base_us = F.unix_micros(F.lit("2024-01-01 00:00:00").cast("timestamp"))
    intervals = region.select(
        F.col("r_regionkey").cast("long").alias("iv_id"),
        (base_us + F.col("r_regionkey").cast("long") * 60 * 3600 * 1_000_000).alias(
            "lo_s"
        ),
        (
            base_us
            + (F.col("r_regionkey").cast("long") * 60 + 59) * 3600 * 1_000_000
        ).alias("hi_s"),
    )
    segs = ev.select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s_lo"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            + (1 + F.col("user_id") % 6).cast("long") * 3600 * 1_000_000
        ).alias("s_hi"),
    )
    pairs = segs.join(
        F.broadcast(intervals),
        (F.col("s_lo") <= F.col("hi_s")) & (F.col("s_hi") >= F.col("lo_s")),
    ).select(
        "iv_id",
        "event_id",
        (F.least("hi_s", "s_hi") - F.greatest("lo_s", "s_lo")).alias("overlap_s"),
        (F.col("s_hi") - F.col("s_lo")).alias("seg_s"),
    )
    cov = pairs.filter(
        (F.col("overlap_s") > 0)
        & (F.col("overlap_s") >= F.lit(_COV_TAU) * F.col("seg_s"))
    )
    return cov.groupBy("iv_id").agg(
        F.count("*").alias("n_cov"),
        F.sum("overlap_s").alias("sum_overlap_s"),
        F.sum("seg_s").alias("sum_seg_s"),
        (
            F.sum("overlap_s") / F.sum("seg_s").cast("double")
        ).alias("mean_cov"),
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
