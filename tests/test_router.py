"""Tier router: the 3-way (30d interior + 1d remainder + 1h edges)
decomposition over a 90-day series must equal a direct raw-range scan
exactly, and the plan must actually use all three tiers."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from s1tiling_spark.operators.rollup import rollup_from_lower, rollup_sequences
from s1tiling_spark.plans.router import plan_range, routed_range_totals

_START = datetime(2024, 1, 2, 5)
_END = datetime(2024, 3, 25, 13)


@pytest.fixture(scope="module")
def raw90(spark):
    """Deterministic 90-day sequence table (no tokens needed)."""
    return (
        spark.range(0, 20_000)
        .select(
            F.col("id").cast("string").alias("doc_id"),
            (F.pmod(F.col("id"), F.lit(100)) + 1).cast("int").alias("n_tok"),
            F.concat(F.lit("s"), F.pmod(F.col("id"), F.lit(3)).cast("string")).alias(
                "source"
            ),
            F.timestamp_seconds(
                F.unix_timestamp(F.lit("2024-01-01 00:00:00").cast("timestamp"))
                + F.pmod(F.col("id") * 9973, F.lit(90 * 24)) * 3600
            ).alias("event_ts"),
        )
        .cache()
    )


def test_plan_uses_all_three_tiers():
    plan = plan_range(_START, _END)
    assert plan.spans_30d, "expected a full 30d block in a 83-day range"
    assert plan.spans_1d and plan.spans_1h
    # spans are disjoint and cover [start, end) exactly
    spans = sorted(plan.spans_1h + plan.spans_1d + plan.spans_30d)
    for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
        assert a_hi == b_lo, "gap or overlap between tier spans"
    from s1tiling_spark.plans.router import _epoch

    assert spans[0][0] == _epoch(_START)
    assert spans[-1][1] == _epoch(_END)
    total = sum(hi - lo for lo, hi in spans)
    assert total == int((_END - _START).total_seconds())


def test_routed_equals_direct_scan(spark, raw90):
    t1h = rollup_sequences(raw90, "1h")
    t1d = rollup_from_lower(t1h, "1d")
    t30d = rollup_from_lower(t1d, "30d")
    routed = {
        r["source"]: (r["cnt"], r["sum_n_tok"])
        for r in routed_range_totals(t1h, t1d, t30d, _START, _END).collect()
    }
    direct = {
        r["source"]: (r["cnt"], r["sum_n_tok"])
        for r in raw90.filter(
            (F.col("event_ts") >= F.lit(_START)) & (F.col("event_ts") < F.lit(_END))
        )
        .groupBy("source")
        .agg(F.count("*").alias("cnt"), F.sum("n_tok").alias("sum_n_tok"))
        .collect()
    }
    assert routed == direct


def test_routed_as_of_serves_past_snapshot(spark, raw90, tmp_path):
    """Time travel through the SERVING path: after a second append
    changes the tiers, routing as-of the first commit horizon
    reproduces the answer the dashboard gave back then, and a fresh
    (no as_of) route reflects the new data."""
    from s1tiling_spark.plans.router import routed_range_totals_from_store
    from s1tiling_spark.plans.store import TierStore
    from s1tiling_spark.plans.tiers import TierPipeline, TierPipelineConfig

    early = raw90.filter(F.col("event_ts") < "2024-03-01")
    store = TierStore(spark, str(tmp_path / "asof_route"))
    pipe = TierPipeline(store, TierPipelineConfig(hist=False, compress=False))
    pipe.run(early)
    # store-GLOBAL horizon: each tier append consumes its own seq, so
    # the snapshot id for "the state after run 1" comes from the store
    horizon = store.last_commit_seq()
    want_old = {
        r["source"]: (r["cnt"], r["sum_n_tok"])
        for r in routed_range_totals_from_store(store, _START, _END).collect()
    }

    pipe.run(raw90)  # grow the table; tiers change under the same keys
    got_old = {
        r["source"]: (r["cnt"], r["sum_n_tok"])
        for r in routed_range_totals_from_store(
            store, _START, _END, as_of_seq=horizon
        ).collect()
    }
    assert got_old == want_old

    # fresh route == direct scan of the grown raw table
    got_new = {
        r["source"]: (r["cnt"], r["sum_n_tok"])
        for r in routed_range_totals_from_store(store, _START, _END).collect()
    }
    want_new = {
        r["source"]: (r["cnt"], r["sum_n_tok"])
        for r in raw90.filter(
            (F.col("event_ts") >= F.lit(_START)) & (F.col("event_ts") < F.lit(_END))
        )
        .groupBy("source")
        .agg(F.count("*").alias("cnt"), F.sum("n_tok").alias("sum_n_tok"))
        .collect()
    }
    assert got_new == want_new
    assert got_new != want_old
