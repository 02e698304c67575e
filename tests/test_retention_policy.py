"""Downsample-guarded retention policy.

The reference silently deletes all but the newest K products per tile
(`/root/reference/s1tiling/libs/S1FileManager.py:735-748`); here the
deletion is coordinated with the tier cascade: a fine tier's dates may
be dropped only once the coarser tier's per-source watermark proves it
absorbed them. These tests pin the three behaviors that make retention
safe to automate: rollups survive raw expiry, an open guard bucket
refuses the drop, and an uncascaded source refuses the drop.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from s1tiling_spark.operators.rollup import rollup_sequences
from s1tiling_spark.plans.retention import (
    RetentionGuardError,
    RetentionRule,
    apply_retention_policy,
)
from s1tiling_spark.plans.store import TierStore
from s1tiling_spark.plans.tiers import TierPipeline, TierPipelineConfig
from s1tiling_spark.sources.synth import synth_sequences
from tests.helpers import assert_frames_match

N = 3000
AS_OF = dt.date(2024, 2, 14)  # synth event_ts spans 2024-01-01 .. +45d


@pytest.fixture()
def seq(spark):
    return synth_sequences(spark, N).cache()


@pytest.fixture()
def store(spark, seq, tmp_path):
    st = TierStore(spark, str(tmp_path / "ret_store"))
    TierPipeline(st, TierPipelineConfig(hist=False, compress=False)).run(seq)
    return st


def _tier_pdf(store, tier):
    df = store.read(tier)
    assert df is not None
    drop = [c for c in ("commit_seq", "run_id", "p_date") if c in df.columns]
    return df.drop(*drop).toPandas()


def test_guarded_expiry_preserves_rollups(spark, seq, store):
    before_1d = _tier_pdf(store, "1d")
    reports = apply_retention_policy(
        store,
        [
            RetentionRule("1h", keep_days=10, guard_tier="1d"),
            RetentionRule("1d", keep_days=None),
        ],
        as_of=AS_OF,
    )
    assert reports[0]["dropped_partitions"] > 0
    assert reports[0]["checked_pairs"] > 0
    assert reports[0]["cutoff"] == "2024-02-04"
    # keep-forever rule is a no-op
    assert reports[1]["dropped_partitions"] == 0 and reports[1]["cutoff"] is None
    # the fine tier now starts at the cutoff
    dates = [p["p_date"] for p in store.partitions("1h")]
    assert dates and min(dates) >= "2024-02-04"
    # the coarse tier still answers over the expired range, equal to a
    # fresh rollup of the raw table (the continuous aggregate KEPT its
    # points for expired raw dates)
    assert_frames_match(_tier_pdf(store, "1d"), before_1d)
    assert_frames_match(
        _tier_pdf(store, "1d"), rollup_sequences(seq, "1d").toPandas()
    )


def test_guard_refuses_open_bucket(store):
    """cutoff past every date → the newest (watermark) day itself is a
    victim; its 1d bucket is still open, so the rule must refuse whole."""
    n_parts_before = len(store.partitions("1h"))
    with pytest.raises(RetentionGuardError) as ei:
        apply_retention_policy(
            store,
            [RetentionRule("1h", keep_days=0, guard_tier="1d")],
            as_of=dt.date(2024, 2, 16),
        )
    assert ei.value.uncovered
    # refusal happened BEFORE any drop
    assert len(store.partitions("1h")) == n_parts_before


def test_guard_refuses_uncascaded_source(spark, seq, store):
    """Rows appended to 1h for a source the 1d cascade never saw make
    every rule guarding on 1d refuse until the cascade runs."""
    extra = rollup_sequences(
        seq.filter(F.col("event_ts") < "2024-01-20").withColumn(
            "source", F.lit("src_new")
        ),
        "1h",
    )
    store.append("1h", extra, store.next_commit_seq(), "manual-backfill")
    with pytest.raises(RetentionGuardError) as ei:
        apply_retention_policy(
            store,
            [RetentionRule("1h", keep_days=10, guard_tier="1d")],
            as_of=AS_OF,
        )
    assert any(s == "src_new" for s, _ in ei.value.uncovered)
    # after the cascade absorbs the new source, the same rule passes
    TierPipeline(store, TierPipelineConfig(hist=False, compress=False)).run(
        seq.withColumn("source", F.lit("src_new"))
    )
    reports = apply_retention_policy(
        store,
        [RetentionRule("1h", keep_days=10, guard_tier="1d")],
        as_of=AS_OF,
    )
    assert reports[0]["dropped_partitions"] > 0


def test_unguarded_rule_drops_without_check(store):
    reports = apply_retention_policy(
        store, [RetentionRule("1h", keep_days=10)], as_of=AS_OF
    )
    assert reports[0]["dropped_partitions"] > 0
    assert reports[0]["checked_pairs"] == 0
