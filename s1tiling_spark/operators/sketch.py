"""Count-min sketch per retention bucket — a merge-able frequency
sketch for token streams where the exact census is too wide.

The tier tables carry an exact 64-bin histogram (operators/rollup.py);
a CMS answers point queries ("how often did token T appear in this
source-day") with bounded overestimate using depth × width counters
regardless of vocabulary size. Long form ``(bucket_start, source,
depth, col, cnt)`` makes the merge a groupBy-sum — identical shape to
the histogram cascade, so 1d→30d rollup is the same merge-able-partial
pattern as the reference's coverage accumulation
(`/root/reference/s1tiling/libs/otbwrappers/lia.py:1658-1683`).

Hash discipline: row hashes are md5-derived (`conv(substr(md5,1,15))`),
so the sketch is bit-identical in Spark and DuckDB (oracle-gated) and
at any parallelism. Everything is JVM column algebra — the explode
produces DEPTH entries per token, collapsed by map-side partial
aggregation to ≤ groups × DEPTH × WIDTH rows per task before the
shuffle (the same bound that makes the histogram skew-neutral).

Estimate = min over depths of the (depth, h_depth(token)) counter —
classic CMS guarantee: never an underestimate; overestimate bounded by
collisions (tests/test_cms.py asserts both on the fixture).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from s1tiling_spark.operators.dedup import MD5_LONG_SQL, md5_long

CMS_DEPTH = 4
CMS_WIDTH = 256


def _cms_col(token: Column, depth: int, width: int) -> Column:
    """Column index of `token` in hash row `depth` — the repo-standard
    md5-derived integer (dedup.md5_long) folded to the row width."""
    h = md5_long(F.concat(F.lit(f"cms{depth}:"), token.cast("string")))
    return F.pmod(h, F.lit(width)).cast("int")


def cms_sql_col(token_expr: str, depth: int, width: int) -> str:
    """DuckDB mirror of :func:`_cms_col` (same MD5_LONG_SQL formula as
    every other oracle hash — one hash discipline, one place)."""
    h = MD5_LONG_SQL.format(expr=f"'cms{depth}:' || CAST({token_expr} AS VARCHAR)")
    return f"CAST({h} % {width} AS INT)"


def cms_long(
    seq: DataFrame,
    bucket: Column,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Token stream → long-form CMS per (bucket, source): one row per
    non-zero (depth, col) counter."""
    tok = seq.select(
        bucket.alias("bucket_start"), "source", F.explode("tokens").alias("token")
    )
    cells = tok.select(
        "bucket_start",
        "source",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        _cms_col(F.col("token"), d, width).alias("col"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("dc"),
    )
    return (
        cells.groupBy(
            "bucket_start", "source", F.col("dc.depth").alias("depth"), F.col("dc.col").alias("col")
        )
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(lower: DataFrame, bucket: Column) -> DataFrame:
    """Cascade a long-form CMS to a coarser tier: cell-wise sum (the
    CMS merge operation — counters are linear)."""
    return (
        lower.groupBy(
            bucket.alias("bucket_start"), "source", "depth", "col"
        ).agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame, tokens: DataFrame, width: int = CMS_WIDTH, depth: int = CMS_DEPTH
) -> DataFrame:
    """Point-query estimates: for each (bucket_start, source, token) in
    `tokens`, min over depths of the matching counter (absent counter =
    0 can't happen for a token that appeared; for never-seen tokens the
    min over found cells still upper-bounds the true count of 0)."""
    probes = tokens.select(
        "bucket_start",
        "source",
        "token",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        _cms_col(F.col("token"), d, width).alias("col"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("dc"),
    ).select(
        "bucket_start", "source", "token",
        F.col("dc.depth").alias("depth"), F.col("dc.col").alias("col"),
    )
    joined = probes.join(cms, ["bucket_start", "source", "depth", "col"], "left").na.fill(
        {"cnt": 0}
    )
    return joined.groupBy("bucket_start", "source", "token").agg(
        F.min("cnt").alias("est")
    )


# ---------------------------------------------------------------------
# Mergeable quantile sketch: fixed-width value-bucket counts — the
# deterministic core of the KLL/t-digest family, sized for the regime
# where exact per-group `percentile` sort state hurts (unbounded group
# cardinality). State is O(cap) counters per group, merge is bin-wise
# sum (same cascade shape as the token histogram), and the estimate is
# rank-seek over cumulative counts with error ≤ one bucket width.

QSKETCH_WIDTH = 8
QSKETCH_CAP = 127  # saturating top bucket


def quantile_sketch_long(
    seq: DataFrame,
    tier: str,
    value: str = "n_tok",
    width: int = QSKETCH_WIDTH,
    cap: int = QSKETCH_CAP,
) -> DataFrame:
    """Value stream → long-form quantile sketch per (bucket, source):
    one row per non-empty value bucket ``qbin = min(v // width, cap)``."""
    from s1tiling_spark.operators.rollup import bucket_col

    return (
        seq.groupBy(
            bucket_col(F.col("event_ts"), tier).alias("bucket_start"),
            "source",
            F.least(F.col(value) / F.lit(width), F.lit(cap))
            .cast("int")
            .alias("qbin"),
        ).agg(F.count("*").alias("cnt"))
    )


def quantile_sketch_merge(lower: DataFrame, bucket: Column) -> DataFrame:
    """Cascade a long-form quantile sketch to a coarser tier: bin-wise
    sum (counters are linear, like the CMS/histogram merges)."""
    return lower.groupBy(bucket.alias("bucket_start"), "source", "qbin").agg(
        F.sum("cnt").alias("cnt")
    )


def sketch_quantiles(
    sketch: DataFrame,
    percents: list[tuple[int, str]],
    width: int = QSKETCH_WIDTH,
) -> DataFrame:
    """Quantile estimates from a long-form sketch: for each (bucket,
    source) and each (p, out_col) in ``percents`` (p in integer percent),
    the smallest bucket upper edge whose cumulative count reaches the
    integer rank ceil(p·N/100) — computed with pure integer arithmetic
    ((p·N + 99) // 100), never p·N doubles, so both engines agree
    exactly."""
    from pyspark.sql import Window

    w_cum = (
        Window.partitionBy("bucket_start", "source")
        .orderBy("qbin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("bucket_start", "source")
    cum = sketch.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "total", F.sum("cnt").over(w_all)
    )
    aggs = []
    for p, out in percents:
        rank = (F.lit(p) * F.col("total") + F.lit(100 - 1)) / F.lit(100)
        rank = F.floor(rank)  # (p*N + 99) // 100 == ceil(p*N/100)
        aggs.append(
            F.min(
                F.when(F.col("cum") >= rank, (F.col("qbin") + 1) * width)
            )
            .cast("int")
            .alias(out)
        )
    return cum.groupBy("bucket_start", "source").agg(*aggs)
