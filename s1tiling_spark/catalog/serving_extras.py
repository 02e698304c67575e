"""Serving-side analytics, second wave: PromQL ``topk`` per bucket,
``absent()``-style staleness detection, MAD-based robust anomaly
scoring, and stuck-sensor plateau detection (longest flat run).

BEYOND-WINDOW EXTRAS: registered after every §2 gate — verify with
``python tools/check_oracle.py promql_topk_1d absent_series_1h
mad_anomaly_1d plateau_runs``.

Determinism: money-valued doubles are quantized to integer cents
before any aggregate (the repo-wide rule); medians use Spark
``percentile`` == DuckDB ``quantile_cont`` (bit-identical linear
interpolation, established in timeseries_extras.py); every rank
tie-breaks on a total order.

Reference analog: SelectBestCoverage's per-group argmax ranking
(`/root/reference/s1tiling/libs/otbwrappers/lia.py:1693-1769`)
generalized to per-bucket top-k; the missing-input detection that
gates pairing (`s1_file_manager` coverage checks) generalized to
grid-anti-join staleness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s1tiling_spark.registry import register
from s1tiling_spark.sources.tables import load_table

_CENTS = "CAST(round(value * 100) AS BIGINT)"
_TOPK = 3


# ---------------------------------------------------------------------
# PromQL topk(k, sum by (series)(metric)) per day: which series
# dominate each bucket. One partial-agg'd groupBy + one rank window —
# at 10^12 rows the shuffle is O(buckets × series), never O(samples).
@register(
    "promql_topk_1d",
    oracle=(
        "WITH s AS (SELECT date_trunc('day', ts) AS bucket_start, event_type, "
        f"  CAST(sum({_CENTS}) AS BIGINT) AS total_cents "
        "  FROM events GROUP BY 1, 2), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY bucket_start "
        "  ORDER BY total_cents DESC, event_type ASC) AS rk FROM s) "
        f"SELECT bucket_start, event_type, total_cents, CAST(rk AS INT) AS rk "
        f"FROM r WHERE rk <= {_TOPK}"
    ),
)
def promql_topk_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    s = ev.groupBy(
        F.date_trunc("day", "ts").alias("bucket_start"), "event_type"
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("total_cents")
    )
    w = Window.partitionBy("bucket_start").orderBy(
        F.desc("total_cents"), F.asc("event_type")
    )
    return (
        s.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOPK)
        .select("bucket_start", "event_type", "total_cents", "rk")
    )


# ---------------------------------------------------------------------
# PromQL absent()/staleness: every (hour, series) cell of the observed
# grid where the series emitted NOTHING — the alert a scrape gap
# fires. Grid = distinct-hours × distinct-series (metadata-sized
# relations; the cross join broadcasts), anti-joined against observed
# cells. O(samples) scan + O(grid) join — never a per-sample product.
@register(
    "absent_series_1h",
    oracle=(
        "WITH h AS (SELECT DISTINCT date_trunc('hour', ts) AS bucket_start "
        "  FROM events), "
        "t AS (SELECT DISTINCT event_type FROM events), "
        "o AS (SELECT DISTINCT date_trunc('hour', ts) AS bucket_start, "
        "  event_type FROM events) "
        "SELECT h.bucket_start, t.event_type FROM h CROSS JOIN t "
        "WHERE NOT EXISTS (SELECT 1 FROM o WHERE "
        "  o.bucket_start = h.bucket_start AND o.event_type = t.event_type)"
    ),
)
def absent_series_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    hours = ev.select(F.date_trunc("hour", "ts").alias("bucket_start")).distinct()
    types = ev.select("event_type").distinct()
    observed = ev.select(
        F.date_trunc("hour", "ts").alias("bucket_start"), "event_type"
    ).distinct()
    return hours.crossJoin(F.broadcast(types)).join(
        observed, ["bucket_start", "event_type"], "left_anti"
    )


# ---------------------------------------------------------------------
# Robust anomaly scoring: per (series, day), the median and MAD
# (median absolute deviation) of the HOURLY sums; hours deviating more
# than 3 MADs are anomalies. Median+MAD resist the exact skew that
# wrecks mean/stddev z-scores (one hot hour inflates stddev and hides
# itself). Two exact percentiles per group — O(buckets) state, and the
# hourly pre-aggregate keeps the percentile input at 24 rows per group
# regardless of raw volume.
@register(
    "mad_anomaly_1d",
    oracle=(
        "WITH hsum AS (SELECT date_trunc('hour', ts) AS hour_start, "
        "  date_trunc('day', ts) AS bucket_start, event_type, "
        f"  CAST(sum({_CENTS}) AS BIGINT) AS h_cents "
        "  FROM events GROUP BY 1, 2, 3), "
        "med AS (SELECT bucket_start, event_type, "
        "  quantile_cont(h_cents, 0.5) AS med FROM hsum GROUP BY 1, 2), "
        "dev AS (SELECT h.*, m.med, abs(h.h_cents - m.med) AS adev "
        "  FROM hsum h JOIN med m USING (bucket_start, event_type)), "
        "mad AS (SELECT bucket_start, event_type, "
        "  quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1, 2) "
        "SELECT d.hour_start, d.event_type, d.h_cents, d.med, a.mad, "
        "  (d.h_cents - d.med) / a.mad AS score "
        "FROM dev d JOIN mad a USING (bucket_start, event_type) "
        "WHERE a.mad > 0 AND abs(d.h_cents - d.med) > 3 * a.mad"
    ),
)
def mad_anomaly_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    hsum = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour_start"),
        F.date_trunc("day", "ts").alias("bucket_start"),
        "event_type",
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("h_cents")
    )
    med = hsum.groupBy("bucket_start", "event_type").agg(
        F.expr("percentile(h_cents, 0.5)").alias("med")
    )
    dev = hsum.join(med, ["bucket_start", "event_type"]).withColumn(
        "adev", F.abs(F.col("h_cents") - F.col("med"))
    )
    mad = dev.groupBy("bucket_start", "event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(mad, ["bucket_start", "event_type"])
        .filter((F.col("mad") > 0) & (F.col("adev") > 3 * F.col("mad")))
        .select(
            "hour_start",
            "event_type",
            "h_cents",
            "med",
            "mad",
            ((F.col("h_cents") - F.col("med")) / F.col("mad")).alias("score"),
        )
    )


# ---------------------------------------------------------------------
# Stuck-sensor detection: per series, the LONGEST run of consecutive
# samples reporting the identical value (run-length encoding via
# gaps-and-islands: change-flag lag, running sum = island id, argmax
# island by length). A plateau spanning hours is the classic frozen
# gauge; rank ties break on earliest start. Single sort per series —
# the same one-exchange shape as the sessionizer.
@register(
    "plateau_runs",
    oracle=(
        f"WITH s AS (SELECT event_type, ts, event_id, {_CENTS} AS cents "
        "  FROM events), "
        "flg AS (SELECT *, CASE WHEN lag(cents) OVER w IS DISTINCT FROM cents "
        "  THEN 1 ELSE 0 END AS chg FROM s "
        "  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)), "
        "isl AS (SELECT *, sum(chg) OVER (PARTITION BY event_type "
        "  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS island FROM flg), "
        "runs AS (SELECT event_type, island, cents, "
        "  CAST(count(*) AS BIGINT) AS run_len, "
        "  min(ts) AS start_ts, max(ts) AS end_ts "
        "  FROM isl GROUP BY 1, 2, 3), "
        "best AS (SELECT *, row_number() OVER (PARTITION BY event_type "
        "  ORDER BY run_len DESC, start_ts ASC) AS rk FROM runs) "
        "SELECT event_type, cents, run_len, start_ts, end_ts "
        "FROM best WHERE rk = 1"
    ),
)
def plateau_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).select(
        "event_type",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    flg = ev.withColumn(
        "chg",
        F.when(
            ~F.lag("cents").over(w).eqNullSafe(F.col("cents")), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    isl = flg.withColumn(
        "island",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    runs = isl.groupBy("event_type", "island", "cents").agg(
        F.count("*").alias("run_len"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
    )
    best = Window.partitionBy("event_type").orderBy(
        F.desc("run_len"), F.asc("start_ts")
    )
    return (
        runs.withColumn("rk", F.row_number().over(best))
        .filter(F.col("rk") == 1)
        .select("event_type", "cents", "run_len", "start_ts", "end_ts")
    )
