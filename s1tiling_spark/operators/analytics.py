"""Time-series analytics operators: visualization downsampling (LTTB),
rolling anomaly detection, and seasonal-profile deviation census.

These complete the retention-tier story on the serving side: a tier
store answers "what happened", these answer "what should a dashboard
draw" (LTTB — Steinarsson, 2013) and "what deviates" (rolling z-score,
the 3-sigma rule; seasonal hour-of-day baselines). Reference analog:
the quicklook/preview generation step (`/root/reference/s1tiling/libs/
otbpipeline.py` quicklook products are a fixed-ratio downsample; LTTB
is the shape-preserving generalization every metrics UI ships).

Cross-engine determinism discipline (same as the sketch family): all
selection/comparison arithmetic is INTEGER — value-cents, epoch
microseconds, integer-floored anchor means — so Spark and the DuckDB
oracle pick bit-identical winners at any parallelism. Doubles appear
only in output columns, restricted to +,-,*,/,sqrt of exact integers
(IEEE-identical in both engines).

Scale shape: every operator here is ONE shuffle on its series key
(window partitions and the groupBys share it); per-series state is
O(1) or O(window). Series cardinality is the parallelism floor, as
with counter_increase.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------
# LTTB downsampling (Largest-Triangle-Three-Buckets), bucket-anchored
# parallel variant.
#
# Classic LTTB is sequential: bucket i's choice depends on bucket
# i-1's CHOSEN point, an O(n) chain that cannot fan out. The standard
# parallel relaxation (used by M4/LTTB hybrids) anchors each bucket's
# triangle on its NEIGHBOR BUCKETS' centroids instead of the previous
# chosen point — every bucket then selects independently, which is
# exactly a window + argmax in Spark. Semantics (deterministic, both
# engines):
#   x = epoch_us(ts), y = cents(value); bucket b = x div span_us
#   anchor of a neighbor bucket = (its mid-time in us,
#                                  sum(y) div n)           -- integers
#   (`div` TRUNCATES toward zero in Spark and DuckDB alike — not a
#   floor; they differ on negative sums, Python's // is the floor)
#   area2(point) = |(ax-cx)(y-ay) - (ax-x)(cy-ay)|         -- integer
#   winner: max area2, ties -> earliest (x, id)
#   series-first bucket keeps its FIRST point, series-last its LAST
#   (LTTB's keep-the-endpoints convention); neighbors are adjacent
#   NON-EMPTY buckets (lag/lead over the bucket relation).
#
# Integer-overflow bound (DuckDB raises, it cannot silently wrap):
# |area2| <= 2*span_us * max_cents * 2  — with 6h buckets and cents
# up to 10^7 that is ~10^18 < 2^63. For wider buckets, downscale x to
# milliseconds first; the argmax is scale-invariant.


def lttb_downsample(
    points: DataFrame,
    keys: list[str],
    ts_col: str,
    cents_col: Column,
    bucket_seconds: int,
    id_col: str,
) -> DataFrame:
    """One representative row per (series, bucket): the LTTB winner.

    Output: ``*keys, bucket_start, <ts_col>, <id_col>, y_cents,
    n_bucket, area2`` (``area2`` NULL on the endpoint buckets, which
    select by position instead of area).
    """
    span_us = bucket_seconds * 1_000_000
    pts = points.select(
        *keys,
        F.col(ts_col),
        F.col(id_col),
        # ts is TIMESTAMP_NTZ; unix_micros needs TIMESTAMP. Session tz
        # is pinned UTC (session.py:84) so the cast is wall-clock
        # identity and x == DuckDB's epoch_us over the same column.
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("x"),
        cents_col.cast("long").alias("y"),
    ).withColumn("b", F.expr(f"x div {span_us}"))

    per_bucket = pts.groupBy(*keys, "b").agg(
        F.count("*").alias("n_bucket"), F.sum("y").alias("sy")
    )
    wb = Window.partitionBy(*keys).orderBy("b")
    mid = F.col("b") * F.lit(span_us) + F.lit(span_us // 2)
    anchors = per_bucket.select(
        *keys,
        "b",
        "n_bucket",
        F.lag(mid).over(wb).alias("ax"),
        F.lag(F.expr("sy div n_bucket")).over(wb).alias("ay"),
        F.lead(mid).over(wb).alias("cx"),
        F.lead(F.expr("sy div n_bucket")).over(wb).alias("cy"),
    )

    j = pts.join(anchors, [*keys, "b"])
    area2 = F.abs(
        (F.col("ax") - F.col("cx")) * (F.col("y") - F.col("ay"))
        - (F.col("ax") - F.col("x")) * (F.col("cy") - F.col("ay"))
    )
    j = j.withColumn(
        "area2",
        F.when(F.col("ax").isNotNull() & F.col("cx").isNotNull(), area2),
    )
    wp = Window.partitionBy(*keys, "b")
    rn_area = F.row_number().over(
        wp.orderBy(F.desc("area2"), "x", id_col)
    )
    rn_first = F.row_number().over(wp.orderBy("x", id_col))
    rn_last = F.row_number().over(
        wp.orderBy(F.desc("x"), F.desc(id_col))
    )
    pick = (
        F.when(F.col("ax").isNull(), rn_first)
        .when(F.col("cx").isNull(), rn_last)
        .otherwise(rn_area)
    )
    return (
        j.withColumn("_rn", pick)
        .where(F.col("_rn") == 1)
        .select(
            *keys,
            # back to NTZ so the schema matches the source ts column
            # (and DuckDB's make_timestamp, which is tz-naive)
            F.timestamp_micros(F.col("b") * F.lit(span_us))
            .cast("timestamp_ntz")
            .alias("bucket_start"),
            ts_col,
            id_col,
            F.col("y").alias("y_cents"),
            "n_bucket",
            "area2",
        )
    )


def lttb_sql(
    table: str,
    keys: list[str],
    ts_col: str,
    cents_expr: str,
    bucket_seconds: int,
    id_col: str,
) -> str:
    """DuckDB oracle mirroring :func:`lttb_downsample` exactly (same
    integer arithmetic, same tie-breaks)."""
    span_us = bucket_seconds * 1_000_000
    k = ", ".join(keys)
    return f"""
WITH pts AS (
  SELECT {k}, {ts_col}, {id_col},
         epoch_us({ts_col}) AS x,
         CAST({cents_expr} AS BIGINT) AS y,
         epoch_us({ts_col}) // {span_us} AS b
  FROM {table}
),
pb AS (
  SELECT {k}, b, count(*) AS n_bucket, sum(y) AS sy
  FROM pts GROUP BY ALL
),
anch AS (
  SELECT {k}, b, n_bucket,
         lag(b * {span_us} + {span_us // 2})
           OVER (PARTITION BY {k} ORDER BY b) AS ax,
         lag(sy // n_bucket) OVER (PARTITION BY {k} ORDER BY b) AS ay,
         lead(b * {span_us} + {span_us // 2})
           OVER (PARTITION BY {k} ORDER BY b) AS cx,
         lead(sy // n_bucket) OVER (PARTITION BY {k} ORDER BY b) AS cy
  FROM pb
),
j AS (
  SELECT pts.*, anch.n_bucket, anch.ax, anch.ay, anch.cx, anch.cy,
         CASE WHEN ax IS NOT NULL AND cx IS NOT NULL THEN
           abs((ax - cx) * (y - ay) - (ax - x) * (cy - ay))
         END AS area2
  FROM pts JOIN anch USING ({k}, b)
),
r AS (
  SELECT j.*,
         CASE
           WHEN ax IS NULL THEN row_number() OVER (
             PARTITION BY {k}, b ORDER BY x, {id_col})
           WHEN cx IS NULL THEN row_number() OVER (
             PARTITION BY {k}, b ORDER BY x DESC, {id_col} DESC)
           ELSE row_number() OVER (
             PARTITION BY {k}, b
             ORDER BY area2 DESC NULLS LAST, x, {id_col})
         END AS _rn
  FROM j
)
SELECT {k}, make_timestamp(b * {span_us}) AS bucket_start,
       {ts_col}, {id_col}, y AS y_cents, n_bucket, area2
FROM r WHERE _rn = 1
"""


# ---------------------------------------------------------------------
# Rolling z-score anomaly detection (the 3-sigma rule over a trailing
# window). The entire statistic reduces to ONE integer numerator and
# ONE integer radicand:
#     z = (y*n - s1) / sqrt(n*s2 - s1^2)
# (population variance; derivation: mean = s1/n, var = (n*s2-s1^2)/n^2,
# so (y-mean)/sd telescopes the n's away). s1/s2/n are trailing-window
# integer sums of cents — exact and parallelism-invariant — and sqrt
# of an exactly-representable integer is correctly rounded IEEE in
# both engines, so z is bit-identical cross-engine. Int64 bound:
# n*s2 <= W^2 * cents^2 — with the default W=32 that admits cents up
# to ~9e7 (values to ~$900k), far past the data domain; W is a small
# constant, so unlike the seasonal census this stays pure-integer.


def rolling_zscore(
    points: DataFrame,
    keys: list[str],
    ts_col: str,
    cents_col: Column,
    id_col: str,
    window_n: int = 32,
    min_periods: int = 12,
) -> DataFrame:
    """Trailing-window z-score per row (window EXCLUDES the current
    row — the score compares a sample against its recent past, so a
    lone spike cannot inflate its own baseline). z is NULL until
    ``min_periods`` prior samples exist or when the window variance
    is zero."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col, id_col)
        .rowsBetween(-window_n, -1)
    )
    y = cents_col.cast("long")
    df = points.withColumn("_y", y)
    s1 = F.sum("_y").over(w)
    s2 = F.sum(F.col("_y") * F.col("_y")).over(w)
    n = F.count("_y").over(w)
    num = F.col("_y") * n - s1
    rad = n * s2 - s1 * s1
    z = F.when(
        (n >= F.lit(min_periods)) & (rad > 0),
        num.cast("double") / F.sqrt(rad.cast("double")),
    )
    return df.withColumn("z", z).drop("_y")


# ---------------------------------------------------------------------
# Seasonal profile census: per (series, hour-of-day) integer moments
# and a k-sigma deviation count. The outlier predicate is the squared
# z-score cross-multiplied into integers:
#     (y*n - s1)^2 > k^2 * (n*s2 - s1^2)
# evaluated in doubles (products of exact integers — both engines
# perform the identical IEEE multiplications, so the comparison is
# deterministic at any scale, with no int64-overflow hazard).


def seasonal_profile(
    points: DataFrame,
    keys: list[str],
    ts_col: str,
    cents_col: Column,
    k_sigma: int = 2,
) -> DataFrame:
    """Hour-of-day baseline per series: ``*keys, hod, n, baseline,
    sd, n_outliers`` where baseline/sd are in original value units
    and n_outliers counts rows beyond ``k_sigma`` deviations from
    their own (series, hod) group."""
    g = Window.partitionBy(*keys, "hod")
    df = points.select(
        *keys,
        F.hour(F.col(ts_col)).alias("hod"),
        cents_col.cast("long").alias("_y"),
    )
    # All moment algebra in DOUBLES built from exact integer window
    # sums: s1/s2/n themselves stay exact int64 (linear sums), but the
    # PRODUCTS (s1^2, n*s2) would overflow int64 on big groups —
    # DuckDB raises on that — so both engines cast first and perform
    # the identical IEEE multiplications.
    s1 = F.sum("_y").over(g).cast("double")
    s2 = F.sum(F.col("_y") * F.col("_y")).over(g).cast("double")
    n = F.count("_y").over(g).cast("double")
    num = F.col("_y").cast("double") * n - s1
    rad = n * s2 - s1 * s1
    outlier = (num * num) > (F.lit(float(k_sigma * k_sigma)) * rad)
    return (
        df.withColumn("_s1", s1)
        .withColumn("_s2", s2)
        .withColumn("_n", n)
        .withColumn("_out", outlier)
        .groupBy(*keys, "hod")
        .agg(
            F.max("_n").cast("long").alias("n"),
            (F.max("_s1") / (F.max("_n") * F.lit(100.0))).alias(
                "baseline"
            ),
            (
                F.sqrt(F.max("_n") * F.max("_s2") - F.max("_s1") * F.max("_s1"))
                / (F.max("_n") * F.lit(100.0))
            ).alias("sd"),
            F.sum(F.col("_out").cast("long")).alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------
# Cross-metric correlation: Pearson r between every pair of series,
# computed over integer anchor values aligned to a common time grid.
# The PromQL/Grafana "which metrics move together" panel, and the
# feature-selection primitive of every metrics warehouse.
#
# Determinism discipline: each series is first reduced to ONE exact
# integer per (series, align bucket) — the truncated integer mean
# sum(cents) div count, which stays bounded by max(cents) at ANY data
# scale (a sum anchor would overflow int64 at ~3e9 rows/bucket). The
# five moment sums (sx sy sxy sxx syy) over those anchors are exact
# int64 (bounds: 24 anchors/day x (5.6e6 cents)^2 ~ 7.5e14 < 2^63).
# Pearson then runs in doubles OF those exact ints:
#     r = (n*sxy - sx*sy) / (sqrt(n*sxx - sx^2) * sqrt(n*syy - sy^2))
# — identical IEEE ops in both engines (the denominator is split into
# two sqrts so the radicand product never overflows), NULL when either
# variance is zero or only one common bucket exists.
#
# Scale shape: one shuffle to the align grid, a self-equi-join ON the
# grid bucket (fan-out = #series-pairs per bucket — the series
# universe, not the row count), one groupBy (pair, day). At 100 TB the
# join key stays the coarse grid, so skew is bounded by series
# cardinality; AQE handles a hot bucket.


def metric_correlation(
    points: DataFrame,
    key_col: str,
    ts_col: str,
    cents_col: Column,
    align_tier: str = "1h",
    out_tier: str = "1d",
) -> DataFrame:
    """Pairwise Pearson correlation per (series_a < series_b,
    out-tier bucket) over align-tier integer mean anchors. Output:
    ``et_a, et_b, bucket_start, n_buckets, corr``."""
    from s1tiling_spark.operators.rollup import bucket_col

    from s1tiling_spark.operators.cache import persist_tracked

    hourly = (
        points.select(
            F.col(key_col).alias("k"),
            bucket_col(F.col(ts_col), align_tier).alias("hb"),
            cents_col.cast("long").alias("_c"),
        )
        .groupBy("k", "hb")
        # truncated integer mean (`div`) — the scale-bounded anchor
        .agg(F.expr("sum(_c) div count(_c)").alias("v"))
    )
    # persist the O(series x grid) anchor relation: without it the
    # self-join's broadcast side re-scans and re-aggregates the full
    # input (two table scans at 100 TB for a KB-sized relation)
    hourly = persist_tracked(hourly)
    a = hourly.alias("a")
    b = hourly.alias("b")
    j = a.join(b, F.col("a.hb") == F.col("b.hb")).where(
        F.col("a.k") < F.col("b.k")
    )
    g = j.groupBy(
        F.col("a.k").alias("et_a"),
        F.col("b.k").alias("et_b"),
        bucket_col(F.col("a.hb"), out_tier).alias("bucket_start"),
    ).agg(
        F.count("*").alias("n_buckets"),
        F.sum("a.v").alias("sx"),
        F.sum("b.v").alias("sy"),
        F.sum(F.col("a.v") * F.col("b.v")).alias("sxy"),
        F.sum(F.col("a.v") * F.col("a.v")).alias("sxx"),
        F.sum(F.col("b.v") * F.col("b.v")).alias("syy"),
    )
    n = F.col("n_buckets").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    corr = F.when(den > 0, (n * sxy - sx * sy) / den)
    return g.select(
        "et_a", "et_b", "bucket_start", "n_buckets", corr.alias("corr")
    )


# ---------------------------------------------------------------------
# Threshold alerting with a hold duration — PromQL's `for:` clause:
# an alert FIRES when the condition holds on every consecutive sample
# for at least `for_duration`. Sample-space islands (the classic
# rn-difference trick: row_number over all rows minus row_number over
# condition rows is constant within a consecutive run), then an exact
# integer duration test in epoch microseconds. One shuffle on the
# series key; both windows and the groupBy share it.


def threshold_alerts(
    points: DataFrame,
    keys: list[str],
    ts_col: str,
    cents_col: Column,
    threshold_cents: int,
    for_duration_s: int,
    id_col: str,
) -> DataFrame:
    """Fired alert ranges per series: ``*keys, alert_start, alert_end,
    n_samples, duration_us`` for every maximal consecutive run of
    samples with cents > threshold whose time span reaches
    ``for_duration_s`` (runs still pending at their last sample ARE
    reported if they already held long enough — streaming semantics
    would keep them open)."""
    w = Window.partitionBy(*keys).orderBy(ts_col, id_col)
    df = points.withColumn("_y", cents_col.cast("long")).withColumn(
        "_cond", (F.col("_y") > F.lit(int(threshold_cents))).cast("int")
    )
    wc = Window.partitionBy(*keys, "_cond").orderBy(ts_col, id_col)
    df = df.withColumn(
        "_grp", F.row_number().over(w) - F.row_number().over(wc)
    )
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    runs = (
        df.where(F.col("_cond") == 1)
        .groupBy(*keys, "_grp")
        .agg(
            F.min(ts_col).alias("alert_start"),
            F.max(ts_col).alias("alert_end"),
            F.count("*").cast("long").alias("n_samples"),
            (F.max(us) - F.min(us)).alias("duration_us"),
        )
    )
    return runs.where(
        F.col("duration_us") >= F.lit(for_duration_s * 1_000_000)
    ).select(*keys, "alert_start", "alert_end", "n_samples", "duration_us")


def linear_fit(
    points: DataFrame,
    keys: list[str],
    ts_col: str,
    cents_col: Column,
    bucket: str = "day",
) -> DataFrame:
    """PromQL ``deriv`` + ``predict_linear`` per (series, bucket):
    least-squares line over (seconds-into-bucket, value-cents), emitting
    the slope in value-units/hour and the extrapolated value at the
    bucket's end.

    Exactness discipline (the repo's cross-engine rule): the five
    regression moments n, Σx, Σy, Σxy, Σx² are EXACT int64 aggregates —
    x is integer seconds into the bucket (< 86 400), y integer cents —
    so numerator ``n·Σxy − Σx·Σy`` and denominator ``n·Σx² − (Σx)²``
    are exact integers and the only doubles are the final divisions,
    identical IEEE ops in both engines. int64 headroom: n·Σx² <
    2^63 up to n ≈ 3.5×10⁴ samples per (series, day); past that a
    cluster deployment fits on the 1h tier's 24 pre-aggregated points
    per day instead of raw samples (same operator, n=24). Groups whose
    denominator is 0 (single sample, or all samples in one second —
    slope undefined) are excluded, as PromQL's extrapolation is.

    Reference analog: the LIA monotonic-accumulate fit
    (`/root/reference/s1tiling/libs/lia.py:1658-1683`), generalized to
    per-bucket regression; one shuffle on (keys, bucket).
    """
    spans = {"day": 86_400, "hour": 3_600}
    if bucket not in spans:
        raise ValueError(
            f"unknown bucket {bucket!r}: linear_fit supports "
            f"{sorted(spans)} (variable-length buckets like 'week'/'month' "
            "would need a per-row span, not a constant)"
        )
    ts = F.col(ts_col).cast("timestamp")
    bkt = F.date_trunc(bucket, F.col(ts_col))
    span_s = spans[bucket]
    df = points.select(
        *keys,
        bkt.alias("bucket_start"),
        (
            (F.unix_micros(ts) - F.unix_micros(bkt.cast("timestamp")))
        ).alias("_xus"),
        cents_col.cast("long").alias("_y"),
    ).withColumn("_x", F.expr("_xus div 1000000"))
    g = df.groupBy(*keys, "bucket_start").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("sx"),
        F.sum("_y").alias("sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    g = g.withColumn("_num", num).withColumn("_den", den).where(F.col("_den") != 0)
    slope_cps = F.col("_num").cast("double") / F.col("_den").cast("double")
    # same op order as the oracle SQL: ((num/den)*3600)/100
    slope_vph = slope_cps * F.lit(3600.0) / F.lit(100.0)
    predict = (
        (
            F.col("sy").cast("double")
            + slope_cps
            * (
                F.col("n").cast("double") * F.lit(float(span_s))
                - F.col("sx").cast("double")
            )
        )
        / F.col("n").cast("double")
        / F.lit(100.0)
    )
    return g.select(
        *keys,
        "bucket_start",
        "n",
        slope_vph.alias("slope_per_hour"),
        predict.alias("predict_end"),
    )


def funnel(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    step_col: str,
    steps: tuple[str, str, str],
) -> DataFrame:
    """Ordered 3-step funnel with strict temporal ordering: per user,
    the first ``steps[0]`` event, then the first ``steps[1]`` STRICTLY
    after it, then the first ``steps[2]`` strictly after that; cohorts
    aggregated by the day of the step-1 event.

    Emits exact integers only (counts + summed exact-µs lags) plus one
    derived conversion ratio — the repo's oracle-safe discipline.
    Plan shape: three filtered aggregates joined on the user key — each
    step's scan is pruned by a pushed ``step_col =`` predicate, the
    per-user relations are grouped before joining (join input is
    O(users), not O(events)), and AQE broadcasts the later (smaller)
    stages. No window over the full event stream.
    """
    s1, s2, s3 = steps
    t1 = (
        events.where(F.col(step_col) == s1)
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    t2 = (
        events.where(F.col(step_col) == s2)
        .join(t1, user_col)
        .where(F.col(ts_col) > F.col("t1"))
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t2"))
    )
    t3 = (
        events.where(F.col(step_col) == s3)
        .join(t2, user_col)
        .where(F.col(ts_col) > F.col("t2"))
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t3"))
    )
    u = t1.join(t2, user_col, "left").join(t3, user_col, "left")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return (
        u.groupBy(F.date_trunc("day", "t1").alias("cohort_day"))
        .agg(
            F.count(F.lit(1)).alias("n_step1"),
            F.count("t2").alias("n_step2"),
            F.count("t3").alias("n_step3"),
            F.coalesce(
                F.sum(
                    F.when(F.col("t2").isNotNull(), us("t2") - us("t1"))
                ),
                F.lit(0),
            ).alias("lag12_us"),
            F.coalesce(
                F.sum(
                    F.when(F.col("t3").isNotNull(), us("t3") - us("t2"))
                ),
                F.lit(0),
            ).alias("lag23_us"),
        )
        .withColumn(
            "conv_full",
            F.col("n_step3").cast("double") / F.col("n_step1").cast("double"),
        )
    )


# ---------------------------------------------------------------------
# Time-weighted average (LOCF weighting) — the continuous-aggregate
# staple for irregularly-sampled gauges: a plain avg() over-weights
# burst periods; the LOCF integral  Σ yᵢ·(tᵢ₊₁−tᵢ) / (t_last−t_first)
# weights each sample by how long it was the live value. Semantics
# match the within-bucket (non-interpolated) variant: the integral
# runs from the bucket's first sample to its last; a single-sample
# bucket has zero span and reports NULL (no duration to average over).
#
# Exactness: the weighted sum Σ cents·Δus is exact int64 (bound:
# Σ Δus ≤ bucket span 8.64e10 µs × max cents — ~8.6e16 at $10k values,
# far under 2^63); the only doubles are the final divisions. One
# shuffle on (keys, bucket): the lead window and the groupBy share it.


def time_weighted_avg(
    points: DataFrame,
    keys: list[str],
    ts_col: str,
    cents_col: Column,
    id_col: str,
    bucket: str = "day",
) -> DataFrame:
    """Per (series, bucket) LOCF time-weighted average. Output:
    ``*keys, bucket_start, n_samples, span_us, wsum_cents_us, twa``
    (``twa`` in original value units; NULL when the bucket has a
    single sample or zero span)."""
    x = F.unix_micros(F.col(ts_col).cast("timestamp"))
    df = points.select(
        *keys,
        F.date_trunc(bucket, F.col(ts_col)).alias("bucket_start"),
        x.alias("_x"),
        F.col(id_col).alias("_id"),
        cents_col.cast("long").alias("_y"),
    )
    w = Window.partitionBy(*keys, "bucket_start").orderBy("_x", "_id")
    df = df.withColumn("_dur", F.lead("_x").over(w) - F.col("_x"))
    g = df.groupBy(*keys, "bucket_start").agg(
        F.count(F.lit(1)).alias("n_samples"),
        (F.max("_x") - F.min("_x")).alias("span_us"),
        F.coalesce(F.sum(F.col("_y") * F.col("_dur")), F.lit(0)).alias(
            "wsum_cents_us"
        ),
    )
    twa = F.when(
        F.col("span_us") > 0,
        F.col("wsum_cents_us").cast("double")
        / F.col("span_us").cast("double")
        / F.lit(100.0),
    )
    return g.select(
        *keys, "bucket_start", "n_samples", "span_us", "wsum_cents_us",
        twa.alias("twa"),
    )


# ---------------------------------------------------------------------
# PromQL changes(): how many times a series' value actually changed
# per bucket — the liveness/flappiness counterpart of increase(). The
# lag runs over the FULL series (a change across a bucket boundary
# counts in the later sample's bucket, exactly PromQL's convention of
# attributing a transition to the sample that reveals it); counting is
# then a plain bucketed aggregate. Pure integers → hash-exact gate.


def value_changes(
    points: DataFrame,
    keys: list[str],
    ts_col: str,
    cents_col: Column,
    id_col: str,
    tier: str = "1h",
) -> DataFrame:
    """Per (series, tier bucket): sample count and number of samples
    whose value differs from the series' previous sample. Output:
    ``*keys, bucket_start, n_samples, n_changes``."""
    from s1tiling_spark.operators.rollup import bucket_col

    w = Window.partitionBy(*keys).orderBy(ts_col, id_col)
    df = points.withColumn("_y", cents_col.cast("long")).withColumn(
        "_prev", F.lag("_y").over(w)
    )
    changed = (
        F.col("_prev").isNotNull() & (F.col("_prev") != F.col("_y"))
    ).cast("long")
    return (
        df.groupBy(*keys, bucket_col(F.col(ts_col), tier).alias("bucket_start"))
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.sum(changed).alias("n_changes"),
        )
    )


# ---------------------------------------------------------------------
# Heartbeat / uptime aggregation: given liveness pings, each ping
# asserts the series alive for `liveness_s` seconds; per-day uptime is
# the measure of the UNION of those intervals intersected with the
# day. Two steps, both classic: (1) merge overlapping intervals into
# islands (gap > L starts a new island — a running sum over the gap
# flag, one window), (2) split each island across the days it touches
# (F.sequence over integer day indexes + explode — an island touches
# O(days) buckets, so the explode fan-out is bounded by calendar time,
# not row count) and clip. All arithmetic in exact epoch-µs integers;
# the ratio is the only double. One shuffle on the series key, one on
# (series, day).


DAY_US = 86_400 * 1_000_000


def heartbeat_uptime(
    points: DataFrame,
    keys: list[str],
    ts_col: str,
    id_col: str,
    liveness_s: int,
) -> DataFrame:
    """Per (series, day) uptime from heartbeat pings. Output: ``*keys,
    bucket_start, uptime_us, n_islands, uptime_ratio`` — ``n_islands``
    counts merged liveness intervals intersecting the day."""
    live_us = liveness_s * 1_000_000
    x = F.unix_micros(F.col(ts_col).cast("timestamp"))
    df = points.select(*keys, x.alias("_x"), F.col(id_col).alias("_id"))
    w = Window.partitionBy(*keys).orderBy("_x", "_id")
    df = df.withColumn("_prev", F.lag("_x").over(w)).withColumn(
        "_new",
        (
            F.col("_prev").isNull()
            | ((F.col("_x") - F.col("_prev")) > F.lit(live_us))
        ).cast("long"),
    )
    # running island id — same window, so still the one series shuffle
    df = df.withColumn(
        "_isl", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    islands = df.groupBy(*keys, "_isl").agg(
        F.min("_x").alias("_s"), (F.max("_x") + F.lit(live_us)).alias("_e")
    )
    # day indexes the island touches: floor(s/DAY) .. floor((e-1)/DAY)
    # (e is exclusive). Heartbeat timestamps are non-negative epochs, so
    # integer `div` IS the floor here.
    days = islands.withColumn(
        "_d",
        F.explode(
            F.sequence(
                F.expr(f"_s div {DAY_US}"), F.expr(f"(_e - 1) div {DAY_US}")
            )
        ),
    )
    d0 = F.col("_d") * F.lit(DAY_US)
    covered = F.least(F.col("_e"), d0 + F.lit(DAY_US)) - F.greatest(
        F.col("_s"), d0
    )
    return (
        days.withColumn("_cov", covered)
        .groupBy(
            *keys,
            F.timestamp_micros(d0)
            .cast("timestamp_ntz")
            .alias("bucket_start"),
        )
        .agg(
            F.sum("_cov").alias("uptime_us"),
            F.count(F.lit(1)).alias("n_islands"),
        )
        .withColumn(
            "uptime_ratio",
            F.col("uptime_us").cast("double") / F.lit(float(DAY_US)),
        )
    )


# ---------------------------------------------------------------------
# Cohort retention: assign every user to the day of their FIRST event
# (the cohort), then count how many of each cohort were active again
# k days later — the engagement matrix every product-analytics store
# ships. Day offsets are exact integer epoch-day differences (never
# engine datediff(), whose unit conventions differ). Plan shape: two
# aggregates (first-day per user, distinct active (user, day)) joined
# on the user key — join input is O(users × active-days), the cohort
# relation is O(days) and broadcast into the final ratio join.


def retention_cohorts(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    offsets: tuple[int, ...] = (0, 1, 3, 7, 14),
) -> DataFrame:
    """Per (cohort day, day offset k): distinct users active exactly k
    days after their first event, with the cohort size and retention
    ratio. Output: ``cohort_day, k_days, n_active, n_cohort,
    retention``."""
    day = F.date_trunc("day", F.col(ts_col))
    day_idx = F.expr(f"unix_micros(CAST(_day AS TIMESTAMP)) div {DAY_US}")

    first = (
        events.select(F.col(user_col).alias("_u"), day.alias("_day"))
        .groupBy("_u")
        .agg(F.min("_day").alias("cohort_day"))
    )
    active = (
        events.select(F.col(user_col).alias("_u"), day.alias("_day"))
        .distinct()
        .withColumn("_di", day_idx)
    )
    cohort_idx = F.expr(
        f"unix_micros(CAST(cohort_day AS TIMESTAMP)) div {DAY_US}"
    )
    j = active.join(first, "_u").withColumn(
        "k_days", F.col("_di") - cohort_idx
    )
    j = j.where(F.col("k_days").isin(*[int(k) for k in offsets]))
    ret = j.groupBy("cohort_day", "k_days").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    sizes = first.groupBy("cohort_day").agg(F.count(F.lit(1)).alias("n_cohort"))
    out = ret.join(F.broadcast(sizes), "cohort_day")
    return out.select(
        "cohort_day",
        "k_days",
        "n_active",
        "n_cohort",
        (
            F.col("n_active").cast("double") / F.col("n_cohort").cast("double")
        ).alias("retention"),
    )


def quantile_over_time(
    points: DataFrame,
    keys: tuple[str, ...],
    ts_col: str,
    value_col: str,
    bucket: str = "day",
    qs: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """PromQL ``quantile_over_time`` with EXACT order statistics: the
    value at ceil-rank ``(q·n + 99) div 100`` of each (keys, bucket)
    group's sorted values — the p99-per-day dashboard query, computed
    on the raw integer values rather than a sketch (the sketch path is
    ``sketch_quantiles``; this is the exact small-group/serving
    variant, and the cross-checkable oracle for it).

    Rank arithmetic is pure integer (``div``), and value-at-rank is
    well-defined under ties (row_number among equal values is
    arbitrary, but the sorted multiset's k-th value is unique) — so
    both engines agree exactly, the repo's oracle discipline.

    Quantiles are of the NON-NULL multiset (PromQL's convention):
    NULLs are filtered before ranking. Without the filter the engines
    would diverge — Spark's ascending sort ranks NULLs first while
    DuckDB sorts them last, shifting every rank.

    Physical shape: ONE exchange — the rank window partitions by
    (keys, bucket) and the final groupBy reuses that partitioning, so
    the aggregate adds no second shuffle. Scales as the largest single
    (keys, bucket) group, which is bounded by design for metric series.

    Reference analog: the quantile summaries of the border/noise
    census (`/root/reference/s1tiling/libs/otbpipeline.py`, product
    statistics), generalized to arbitrary ranks.
    """
    bkt = F.date_trunc(bucket, F.col(ts_col))
    df = points.filter(F.col(value_col).isNotNull()).select(
        *keys, bkt.alias("bucket_start"), F.col(value_col).alias("_v")
    )
    grp = Window.partitionBy(*keys, "bucket_start")
    df = df.withColumn("_rn", F.row_number().over(grp.orderBy("_v"))).withColumn(
        "_n", F.count(F.lit(1)).over(grp)
    )
    aggs = [
        F.max(
            F.when(
                F.col("_rn") == F.expr(f"({q} * _n + 99) div 100"), F.col("_v")
            )
        ).alias(f"p{q}")
        for q in qs
    ]
    return df.groupBy(*keys, "bucket_start").agg(*aggs)
