"""Retention-tier rollup queries + oracles.

The 1d and 30d entries are computed as CASCADES from the tier below
(merge-able partials) while their oracles compute directly from the raw
sequences — passing the oracle check is the proof that the tier cascade
is lossless, the reference's golden-baseline discipline
(`/root/reference/tests/test_0200306-NR.py:103-176`) applied to tiers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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


def _rollup_oracle(tier: str) -> str:
    return (
        f"WITH {SEQUENCES_ORACLE_CTE} "
        f"SELECT {bucket_sql('event_ts', tier)} AS bucket_start, source, {_STATS_SQL} "
        "FROM sequences GROUP BY 1, 2"
    )


@register("rollup_1h", oracle=_rollup_oracle("1h"))
def rollup_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rollup_sequences(sequences_from_documents(spark, sf_dir), "1h")


@register("rollup_1d", oracle=_rollup_oracle("1d"))
def rollup_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1d tier as a cascade of the 1h tier (never reads raw rows twice)."""
    t1h = rollup_sequences(sequences_from_documents(spark, sf_dir), "1h")
    return rollup_from_lower(t1h, "1d")


@register("rollup_30d", oracle=_rollup_oracle("30d"))
def rollup_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30d tier as a cascade 1h → 1d → 30d."""
    t1h = rollup_sequences(sequences_from_documents(spark, sf_dir), "1h")
    return rollup_from_lower(rollup_from_lower(t1h, "1d"), "30d")


_HIST_WIDTH = VOCAB // N_HIST_BINS


def _hist_oracle(tier: str) -> str:
    return (
        f"WITH {SEQUENCES_ORACLE_CTE}, ex AS ("
        f"  SELECT {bucket_sql('event_ts', tier)} AS bucket_start, source, "
        "          unnest(tokens) AS token FROM sequences) "
        f"SELECT bucket_start, source, "
        f"CAST(least(token // {_HIST_WIDTH}, {N_HIST_BINS - 1}) AS INT) AS bin, "
        "count(*) AS tok_cnt FROM ex GROUP BY 1, 2, 3"
    )


@register("tok_hist_1d", oracle=_hist_oracle("1d"))
def tok_hist_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-histogram sketch, 1d tier, long (merge-able) form."""
    return token_hist_long(sequences_from_documents(spark, sf_dir), "1d")


@register("tok_hist_30d", oracle=_hist_oracle("30d"))
def tok_hist_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30d histogram as a MERGE of the 1d sketches (map-sum), proving
    the sketch is merge-able across tiers."""
    h1d = token_hist_long(sequences_from_documents(spark, sf_dir), "1d")
    return merge_hist_long(h1d, "30d")
