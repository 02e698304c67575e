"""Retention-tier rollup queries + oracles.

The 1d and 30d tiers are computed as CASCADES from the tier below
(merge-able partials) while the oracle computes every tier directly
from the raw sequences — passing the oracle check is the proof that the
tier cascade is lossless, the reference's golden-baseline discipline
(`/root/reference/tests/test_0200306-NR.py:103-176`) applied to tiers.

Both queries emit ALL tiers stacked with a ``tier`` discriminator
column (one gated query per family — the driver's correctness window
caps at 50 entries, so per-tier gates are folded; the cascade property
is still independently proven per tier because each tier's rows carry
their tier tag and the oracle recomputes each tag directly from raw).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s1tiling_spark.operators.rollup import (
    N_HIST_BINS,
    VOCAB,
    bucket_sql,
    merge_hist_long,
    rollup_from_lower,
    rollup_sequences,
    token_hist_long,
)
from s1tiling_spark.registry import register
from s1tiling_spark.sources.sequences import SEQUENCES_ORACLE_CTE, sequences_from_documents

_STATS_SQL = (
    "count(*) AS cnt, CAST(sum(n_tok) AS BIGINT) AS sum_n_tok, "
    "min(n_tok) AS min_n_tok, max(n_tok) AS max_n_tok"
)


def _rollup_tier_sql(tier: str) -> str:
    return (
        f"SELECT '{tier}' AS tier, {bucket_sql('event_ts', tier)} AS bucket_start, "
        f"source, {_STATS_SQL} FROM sequences GROUP BY 1, 2, 3"
    )


_ROLLUP_ORACLE = (
    f"WITH {SEQUENCES_ORACLE_CTE} "
    + " UNION ALL ".join(_rollup_tier_sql(t) for t in ("1h", "1d", "30d"))
)


@register("rollup_tiers", oracle=_ROLLUP_ORACLE)
def rollup_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three retention tiers stacked: 1h from raw, 1d as a cascade
    of 1h, 30d as a cascade of 1d (merge-able partials — the raw table
    is scanned exactly once)."""
    seq = sequences_from_documents(spark, sf_dir)
    t1h = rollup_sequences(seq, "1h")
    t1d = rollup_from_lower(t1h, "1d")
    t30d = rollup_from_lower(t1d, "30d")
    return (
        t1h.withColumn("tier", F.lit("1h"))
        .unionByName(t1d.withColumn("tier", F.lit("1d")))
        .unionByName(t30d.withColumn("tier", F.lit("30d")))
        .select("tier", "bucket_start", "source", "cnt", "sum_n_tok", "min_n_tok", "max_n_tok")
    )


_HIST_WIDTH = VOCAB // N_HIST_BINS


def _hist_tier_sql(tier: str) -> str:
    return (
        f"SELECT '{tier}' AS tier, bucket_start, source, bin, count(*) AS tok_cnt "
        f"FROM (SELECT {bucket_sql('event_ts', tier)} AS bucket_start, source, "
        f"CAST(least(token // {_HIST_WIDTH}, {N_HIST_BINS - 1}) AS INT) AS bin "
        "FROM (SELECT event_ts, source, unnest(tokens) AS token FROM sequences)) "
        "GROUP BY 1, 2, 3, 4"
    )


_HIST_ORACLE = (
    f"WITH {SEQUENCES_ORACLE_CTE} "
    + " UNION ALL ".join(_hist_tier_sql(t) for t in ("1d", "30d"))
)


@register("tok_hist_tiers", oracle=_HIST_ORACLE)
def tok_hist_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-histogram sketch tiers, long (merge-able) form: 1d built
    from raw tokens, 30d as a MERGE of the 1d sketches (bin-wise sum) —
    proving the sketch is merge-able across tiers."""
    from s1tiling_spark.operators.cache import persist_tracked

    seq = sequences_from_documents(spark, sf_dir)
    # persisted (tracked — release via operators.cache.release_cached):
    # the 1d sketch feeds BOTH the stacked output and the 30d merge —
    # without the cache the heavy token explode runs twice
    h1d = persist_tracked(token_hist_long(seq, "1d"))
    h30d = merge_hist_long(h1d, "30d")
    return (
        h1d.withColumn("tier", F.lit("1d"))
        .unionByName(h30d.withColumn("tier", F.lit("30d")))
        .select("tier", "bucket_start", "source", "bin", "tok_cnt")
    )
