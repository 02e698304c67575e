"""Gap-fill: bucket-grid densification + LOCF + linear interpolation.

The reference's closest analog is zero-filling missing margins
(`CutBorders`/`ResetMargin`, `/root/reference/s1tiling/libs/otbwrappers/
s1_to_s2.py:530-599`); true gap-fill over the time axis is new machinery
required by the north rule. All of it is built-in Spark: grid =
``sequence(min,max,interval)`` + ``explode`` + left join; LOCF =
``last(ignorenulls) OVER rowsBetween(unboundedPreceding, current)``;
linear = prev/next anchors via the same frames.

Scale note: gap-fill runs on TIER tables (O(#buckets × #sources) rows —
thousands per month even at 10^12 raw sequences), never on raw data, so
the per-source window sort is tiny. The per-source grid explode is
bounded by span/step. Window partitions = sources; if a deployment had
millions of sources the same code holds because each partition is only
span/step rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_STEP = {"1h": "INTERVAL 1 HOUR", "1d": "INTERVAL 1 DAY", "30d": "INTERVAL 30 DAY"}


def densify(tier: DataFrame, tier_name: str, key: str = "source") -> DataFrame:
    """Expand each key to its full [min,max] bucket grid; missing buckets
    appear as null-stat rows flagged ``gap_filled=true``."""
    step = _STEP[tier_name]
    grid = (
        tier.groupBy(key)
        .agg(F.min("bucket_start").alias("_lo"), F.max("bucket_start").alias("_hi"))
        .select(
            key,
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), F.expr(step))
            ).alias("bucket_start"),
        )
    )
    joined = grid.join(tier, [key, "bucket_start"], "left")
    probe = [c for c in tier.columns if c not in (key, "bucket_start")][0]
    return joined.withColumn("gap_filled", F.col(probe).isNull())


def locf(df: DataFrame, cols: list[str], key: str = "source",
         order: str = "bucket_start") -> DataFrame:
    """Last-observation-carried-forward over the bucket grid."""
    w = Window.partitionBy(key).orderBy(order).rowsBetween(Window.unboundedPreceding, 0)
    for c in cols:
        df = df.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return df


def linear_interpolate(df: DataFrame, col: str, key: str = "source",
                       order: str = "bucket_start") -> DataFrame:
    """Linear interpolation of ``col`` across null gaps; falls back to
    the single available anchor at series edges."""
    wp = Window.partitionBy(key).orderBy(order).rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.partitionBy(key).orderBy(order).rowsBetween(0, Window.unboundedFollowing)
    v = F.col(col)
    ts = F.unix_timestamp(F.col(order)).cast("double")
    anchored_ts = F.when(v.isNotNull(), ts)
    prev_v = F.last(v, ignorenulls=True).over(wp)
    prev_t = F.last(anchored_ts, ignorenulls=True).over(wp)
    next_v = F.first(v, ignorenulls=True).over(wn)
    next_t = F.first(anchored_ts, ignorenulls=True).over(wn)
    frac = (ts - prev_t) / (next_t - prev_t)
    interp = (
        F.when(v.isNotNull(), v.cast("double"))
        .when(prev_v.isNotNull() & next_v.isNotNull(),
              prev_v.cast("double") + (next_v.cast("double") - prev_v.cast("double")) * frac)
        .when(prev_v.isNotNull(), prev_v.cast("double"))
        .otherwise(next_v.cast("double"))
    )
    return df.withColumn(col, interp)
