"""Counter-semantics rollup: PromQL ``increase``/``rate`` with reset
handling, over the ``events`` table.

BEYOND-WINDOW EXTRA: registered after the TPC-H demonstrations, so it
never competes with a §2 gate for the driver's 50-entry correctness
window — verify with ``python tools/check_oracle.py counter_rate_1h``.

The input counter is derived deterministically in-query: the running
sum of integer value-cents per event_type, wrapped modulo ``_MOD`` —
a faithful model of a 32-bit-style cumulative counter that resets
(wraps) mid-stream, so the reset branch of the operator is actually
exercised (≈ a dozen wraps per series at sf0.01). All arithmetic is
integer until the final rate division, so both engines agree exactly.

Reference analog: the incremental coverage accumulator
(`/root/reference/s1tiling/libs/lia.py:1658-1683`) is a
monotonic-accumulate-then-difference pattern; this generalizes it to
restartable counters, the semantics every metrics backend ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s1tiling_spark.operators.rollup import counter_increase
from s1tiling_spark.registry import register
from s1tiling_spark.sources.tables import load_table

COUNTER_MOD = 100_000  # counter wraps at 1000.00 value-units

# Shared derived-counter construction (Spark + oracle CTE) — imported
# by `analytics_queries.counter_resets_1d` so resets() models the SAME
# counter as increase()/rate(). The SQL wrap is ((x % m) + m) % m, the
# pmod identity: DuckDB's plain `%` keeps the dividend's sign, so a
# negative running cents sum (legal — `value` is an unconstrained
# double) would diverge from Spark's pmod under bare `cum % m`.
COUNTER_CTE = f"""cum AS (
  SELECT event_type, ts, event_id, value,
         sum(CAST(round(value * 100) AS BIGINT)) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
         ) AS cum
  FROM events
),
ctr AS (
  SELECT event_type, ts, event_id, value,
         CAST(((cum % {COUNTER_MOD}) + {COUNTER_MOD}) % {COUNTER_MOD}
              AS BIGINT) AS counter
  FROM cum
)"""


def derived_counter(ev: DataFrame) -> DataFrame:
    """events → (event_type, ts, event_id, value, counter): running
    value-cents sum wrapped modulo ``COUNTER_MOD`` (pmod — always
    non-negative, matching :data:`COUNTER_CTE`)."""
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    return ev.select(
        "event_type",
        "ts",
        "event_id",
        "value",
        F.pmod(
            F.sum(F.round(F.col("value") * 100).cast("long")).over(w),
            F.lit(COUNTER_MOD),
        ).alias("counter"),
    )


_COUNTER_ORACLE = f"""
WITH {COUNTER_CTE},
lagd AS (
  SELECT event_type, ts, counter,
         lag(counter) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
         ) AS prev
  FROM ctr
),
d AS (
  SELECT event_type, ts,
         CASE WHEN prev IS NULL THEN NULL
              WHEN counter >= prev THEN counter - prev
              ELSE counter END AS delta
  FROM lagd
)
SELECT event_type, date_trunc('hour', ts) AS bucket_start,
       CAST(sum(delta) AS BIGINT) AS increase,
       CAST(count(delta) AS BIGINT) AS n_samples,
       CAST(sum(delta) AS BIGINT) / 3600.0 AS rate_per_sec
FROM d GROUP BY 1, 2
"""


@register("counter_rate_1h", oracle=_COUNTER_ORACLE)
def counter_rate_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    ctr = derived_counter(ev)
    return counter_increase(
        ctr,
        keys=["event_type"],
        ts_col="ts",
        counter_col="counter",
        tier="1h",
        order_cols=("event_id",),
    )


# ---------------------------------------------------------------------
# OHLC downsample: per (series, bucket) open/high/low/close — the M4
# visualization-preserving aggregate (Jugel et al., VLDB 2014) and the
# candlestick rollup every financial/metrics store ships. The Spark
# side is ONE groupBy aggregate: open/close ride struct-min/max (a
# struct ordered (ts, event_id, value) compares lexicographically, so
# its min is the earliest row and the value field falls out) — full
# map-side partial aggregation, no window, no second shuffle. Struct
# ordering drops the aggregate out of hash-agg codegen into a
# partial+final SortAggregate (min_by/max_by plan identically) —
# still one shuffle of O(groups) partials; audited in PLANS.md. The
# oracle mirrors the SEMANTICS with row_number windows (DuckDB struct
# min doesn't project fields the same way); values are compared, not
# plan shape.
_OHLC_ORACLE = """
WITH r AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_start, value,
         row_number() OVER (
           PARTITION BY event_type, date_trunc('hour', ts)
           ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (
           PARTITION BY event_type, date_trunc('hour', ts)
           ORDER BY ts DESC, event_id DESC) AS rn_z
  FROM events
)
SELECT event_type, bucket_start,
       max(CASE WHEN rn_a = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN rn_z = 1 THEN value END) AS close,
       CAST(count(*) AS BIGINT) AS n_samples
FROM r GROUP BY 1, 2
"""


@register("ohlc_1h", oracle=_OHLC_ORACLE)
def ohlc_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    first = F.min(F.struct("ts", "event_id", "value"))["value"]
    last = F.max(F.struct("ts", "event_id", "value"))["value"]
    return (
        ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("bucket_start")
        ).agg(
            first.alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            last.alias("close"),
            F.count("*").cast("long").alias("n_samples"),
        )
    )
