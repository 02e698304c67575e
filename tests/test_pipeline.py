"""Incremental tier pipeline: end-state equivalence under growth,
re-run, and crash-resume.

Models the reference's restart discipline — rerun after partial results
must produce exactly the full-run outputs
(`/root/reference/tests/test_0200306-NR.py:178-256`, masks-only restart)
— as dataframe-equality of the deduped tier tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s1tiling_spark.plans.store import TierStore
from s1tiling_spark.plans.tiers import TierPipeline, TierPipelineConfig
from s1tiling_spark.sources.synth import synth_sequences
from tests.helpers import assert_frames_match

N = 4000
SPLIT_TS = "2024-01-20 00:00:00"


@pytest.fixture()
def seq(spark):
    return synth_sequences(spark, N).cache()


def _tier_state(store, tier, keys=("bucket_start", "source")):
    df = store.read(tier, keys=keys)
    assert df is not None
    drop = [c for c in ("commit_seq", "run_id", "p_date") if c in df.columns]
    return df.drop(*drop).toPandas()


def _full_run_state(spark, seq, tmp_path, name):
    store = TierStore(spark, str(tmp_path / name))
    TierPipeline(store).run(seq)
    return store


def test_single_run_matches_direct(spark, seq, tmp_path):
    from s1tiling_spark.operators.rollup import rollup_sequences

    store = _full_run_state(spark, seq, tmp_path, "single")
    got = _tier_state(store, "1d")
    want = rollup_sequences(seq, "1d").toPandas()
    assert_frames_match(got, want)


def test_incremental_growth_equals_oneshot(spark, seq, tmp_path):
    """Run on the first 20 days, then on the grown table → identical
    deduped state to a single full run (late rows in the boundary bucket
    get MERGEd)."""
    early = seq.filter(F.col("event_ts") < SPLIT_TS)
    inc_store = TierStore(spark, str(tmp_path / "inc"))
    pipe = TierPipeline(inc_store)
    r1 = pipe.run(early)
    assert r1["rows_out_total"] > 0
    r2 = pipe.run(seq)  # table has grown; watermarks skip committed work
    assert r2["rows_out_total"] > 0

    full_store = _full_run_state(spark, seq, tmp_path, "full")
    for tier in ("1h", "1d", "30d"):
        assert_frames_match(
            _tier_state(inc_store, tier), _tier_state(full_store, tier)
        )
    hk = ("bucket_start", "source", "bin")
    for tier in ("hist_1d", "hist_30d"):
        assert_frames_match(
            _tier_state(inc_store, tier, hk), _tier_state(full_store, tier, hk)
        )


def test_incremental_skips_committed_buckets(spark, seq, tmp_path):
    """Second run over an unchanged table must re-process only the
    boundary bucket per source, not everything."""
    store = TierStore(spark, str(tmp_path / "skip"))
    pipe = TierPipeline(store, TierPipelineConfig(hist=False, compress=False))
    pipe.run(seq)
    r2 = pipe.run(seq)
    m1h = next(m for m in r2["metrics"] if m["tier"] == "1h")
    # boundary-bucket recompute only: a handful of rows per source
    assert 0 < m1h["rows_out"] < 50
    assert m1h["rows_in"] < seq.count() / 10


def test_rerun_idempotent(spark, seq, tmp_path):
    store = TierStore(spark, str(tmp_path / "idem"))
    pipe = TierPipeline(store, TierPipelineConfig(hist=False, compress=False))
    pipe.run(seq)
    before = _tier_state(store, "1h")
    pipe.run(seq)
    pipe.run(seq)
    assert_frames_match(_tier_state(store, "1h"), before)


def test_crash_between_append_and_checkpoint(spark, seq, tmp_path):
    """Simulate dying after the data append but before the checkpoint
    commit: resume must repair to the exact full state."""
    store = TierStore(spark, str(tmp_path / "crash"))
    pipe = TierPipeline(store, TierPipelineConfig(hist=False, compress=False))
    early = seq.filter(F.col("event_ts") < SPLIT_TS)
    pipe.run(early)

    # crash injection: append new tier data WITHOUT checkpointing
    from s1tiling_spark.operators.rollup import rollup_sequences

    crashed = rollup_sequences(seq.filter(F.col("event_ts") >= SPLIT_TS), "1h")
    store.append("1h", crashed, store.next_commit_seq(), "run-crashed")

    # resume: normal run over the full table
    pipe.run(seq)
    full_store = _full_run_state(spark, seq, tmp_path, "crash_full")
    assert_frames_match(_tier_state(store, "1h"), _tier_state(full_store, "1h"))


def test_metrics_and_lineage(spark, seq, tmp_path):
    store = TierStore(spark, str(tmp_path / "metrics"))
    pipe = TierPipeline(store)
    res = pipe.run(seq)
    m = store.read_metrics()
    assert m is not None
    tiers = {r["tier"] for r in m.collect()}
    assert {"1h", "1d", "30d", "hist_1d", "hist_30d", "blocks_1h"} <= tiers
    raw = store.read("1h", deduped=False)
    assert {"commit_seq", "run_id", "p_date"} <= set(raw.columns)
    assert raw.filter(F.col("run_id") == res["run_id"]).count() > 0


def test_blocks_roundtrip_from_store(spark, seq, tmp_path):
    from s1tiling_spark.operators.compress import decompress_blocks

    store = TierStore(spark, str(tmp_path / "blocks"))
    TierPipeline(store).run(seq)
    blocks = store.read("blocks_1h")
    pts = decompress_blocks(
        blocks.withColumnRenamed("bucket_start", "block_start")
    ).toPandas()
    tier = _tier_state(store, "1h")
    assert len(pts) == len(tier)


def test_retention_expire(spark, seq, tmp_path):
    store = TierStore(spark, str(tmp_path / "exp"))
    pipe = TierPipeline(store, TierPipelineConfig(hist=False, compress=False))
    pipe.run(seq)
    before = store.read("1h").count()
    dropped = store.expire("1h", "2024-01-15")
    assert dropped > 0
    after = store.read("1h").count()
    assert after < before
    assert store.read("1h").filter(F.col("bucket_start") < "2024-01-15").count() == 0


def test_retention_blocks_silent_truncated_time_travel(spark, seq, tmp_path):
    """expire() records a retention floor: as-of reads of states that
    predate the expiry RAISE (never silently reconstruct a state
    missing the dropped dates), unless the caller scopes the read to
    surviving dates via p_dates; states at/after the expiry stay exact.
    (ADVICE r4: expire() vs the never-silently-wrong as-of contract.)"""
    import pytest as _pytest

    store = TierStore(spark, str(tmp_path / "expfloor"))
    pipe = TierPipeline(store, TierPipelineConfig(hist=False, compress=False))
    pipe.run(seq)
    pre_seq = store.last_commit_seq()
    assert store.expire("1h", "2024-01-15") > 0
    floor_date, floor_seq = store.retention_floor("1h")
    # the expiry consumed its own commit seq — every pre-expiry state
    # is strictly below the floor seq
    assert floor_date == "2024-01-15" and floor_seq > pre_seq
    with _pytest.raises(ValueError, match="retention expiry"):
        store.read("1h", as_of_seq=pre_seq)
    # explicit acknowledgment: scoped to surviving dates, the read works
    ok = store.read("1h", as_of_seq=pre_seq, p_dates=["2024-01-20"])
    assert ok.filter(F.to_date("bucket_start") == "2024-01-20").count() > 0
    # but a p_dates list reaching below the floor still raises
    with _pytest.raises(ValueError, match="retention expiry"):
        store.read("1h", as_of_seq=pre_seq, p_dates=["2024-01-10"])
    # post-expiry states are exact — no raise
    store.append(
        "1h",
        store.read("1h").limit(1).drop("commit_seq", "run_id", "p_date"),
        store.next_commit_seq(),
        "post",
    )
    assert store.read("1h", as_of_seq=store.last_commit_seq()) is not None


def test_repair_gc_collects_old_append_staging(spark, seq, tmp_path):
    """A crashed append's staging dir is GC'd by the compact repair once
    it is old enough — fresh staging (a live concurrent writer) is left
    alone. (ADVICE r4: staging-dir disk leak.)"""
    import os
    import time as _time

    store = TierStore(spark, str(tmp_path / "stagegc"))
    pipe = TierPipeline(store, TierPipelineConfig(hist=False, compress=False))
    pipe.run(seq)
    stale = store.tier_path("1h") + "_tmp_deadbeef"
    fresh = store.tier_path("1h") + "_tmp_cafebabe"
    os.makedirs(stale)
    os.makedirs(fresh)
    old = _time.time() - 7 * 3600
    os.utime(stale, (old, old))
    store._repair_crashed_compact("1h")
    assert not os.path.isdir(stale)
    assert os.path.isdir(fresh)


def test_compaction_preserves_reads_and_shrinks_files(spark, seq, tmp_path):
    """compact() physically applies MERGE-on-read: identical read
    results, fewer files, original commit_seq kept so a LATER append
    still wins over compacted survivors."""
    from pyspark.sql import functions as F

    from s1tiling_spark.operators.rollup import rollup_sequences

    store = TierStore(spark, str(tmp_path / "compact"))
    tier = rollup_sequences(seq, "1d")
    # three overlapping appends → three versions of every key
    for i in range(3):
        store.append("1d", tier, store.next_commit_seq(), f"run-{i}")
    before = _tier_state(store, "1d")
    versions = store.read("1d", deduped=False).count()
    assert versions == 3 * len(before)

    stats = store.compact("1d")
    assert stats["files_after"] < stats["files_before"]
    assert stats["rows"] == len(before)  # one surviving version per key
    after = _tier_state(store, "1d")
    assert_frames_match(after, before)

    # a post-compaction append (higher commit_seq) must still win
    bumped = tier.withColumn("cnt", F.col("cnt") + 1000)
    store.append("1d", bumped, store.next_commit_seq(), "run-post")
    newest = store.read("1d")
    assert newest.filter(F.col("cnt") < 1000).count() == 0


def test_store_read_partition_pruning(spark, seq, tmp_path):
    """A date-filtered read of a tier table must prune p_date partitions
    AT THE SCAN (PartitionFilters in the FileScan) — the property that
    makes bucket-range queries O(partitions touched) at 100 TB."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from s1tiling_spark.operators.rollup import rollup_sequences

    store = TierStore(spark, str(tmp_path / "prune"))
    store.append("1d", rollup_sequences(seq, "1d"), store.next_commit_seq(), "r0")
    df = store.read("1d", deduped=False).filter(F.col("p_date") == "2024-01-05")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "p_date" in pf_line, pf_line
    # and the filter actually prunes: one partition's rows only
    assert 0 < df.count() < store.read("1d", deduped=False).count()


def test_store_read_dynamic_partition_pruning(spark, seq, tmp_path):
    """Joining a tier table against a FILTERED date dimension must
    prune p_date partitions at RUNTIME (dynamic partition pruning:
    the scan's PartitionFilters carries a dynamicpruning subquery fed
    by the broadcast dim). At 100 TB this is the difference between
    scanning the whole store and only the dim-selected days when the
    date predicate lives on a dimension, not the fact table.

    Two preconditions found while building this test (both documented
    because each silently disables DPP with no log line):
    - the dim must be STORAGE-BACKED: a createDataFrame LocalRelation
      has its filter constant-folded into the local rows before the
      PartitionPruning rule runs, leaving no selective predicate
      (same materialize-your-dims lesson as the AQE skew-join,
      PERF.md §14);
    - the dim predicate must be a comparison (EqualTo/In/...): a bare
      boolean column filter is not 'likely selective' to the rule."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from s1tiling_spark.operators.rollup import rollup_sequences

    store = TierStore(spark, str(tmp_path / "dpp"))
    store.append("1d", rollup_sequences(seq, "1d"), store.next_commit_seq(), "r0")
    fact = store.read("1d", deduped=False)
    dates = sorted(r["p_date"] for r in fact.select("p_date").distinct().collect())
    assert len(dates) > 3
    dimpath = str(tmp_path / "dpp_dim")
    spark.createDataFrame(
        [(d, i % 2) for i, d in enumerate(dates)], "p_date date, tag int"
    ).write.parquet(dimpath)
    dim = spark.read.parquet(dimpath)
    joined = fact.join(F.broadcast(dim.filter(F.col("tag") == 0)), "p_date")
    buf = io.StringIO()
    with redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "dynamicpruning" in pf_line.lower(), pf_line
    # and the join result is exactly the kept days' rows
    kept = {str(d) for i, d in enumerate(dates) if i % 2 == 0}
    got_days = {
        str(r["p_date"]) for r in joined.select("p_date").distinct().collect()
    }
    assert got_days == kept


def test_changes_and_matview_survive_retention(spark, seq, tmp_path):
    """Retention must not brick incremental consumers: changes() over a
    range that starts below the expiry seq still works (both as-of
    states read the same surviving files — no spurious retraction), and
    a matview whose cursor lagged the expiry refreshes fine, KEEPING its
    rolled-up points for the expired dates (TimescaleDB's
    retention-vs-continuous-aggregate semantics)."""
    from s1tiling_spark.operators.rollup import rollup_sequences
    from s1tiling_spark.plans.matview import AdditiveMatView

    store = TierStore(spark, str(tmp_path / "retmv"))
    mv = AdditiveMatView(
        store,
        name="daily",
        base_tier="1h",
        base_keys=("bucket_start", "source"),
        group_cols={
            "bucket_start": F.date_trunc("day", F.col("bucket_start")),
            "source": F.col("source"),
        },
        sum_cols=("cnt", "sum_n_tok"),
    )
    early = rollup_sequences(seq.filter(F.col("event_ts") < "2024-01-20"), "1h")
    store.append("1h", early, store.next_commit_seq(), "b1")
    mv.refresh("mv-1")
    view_before = mv.read().toPandas()
    lag_cursor = mv.last_refreshed_seq()

    late = rollup_sequences(seq.filter(F.col("event_ts") >= "2024-01-20"), "1h")
    store.append("1h", late, store.next_commit_seq(), "b2")
    assert store.expire("1h", "2024-01-15") > 0

    # changes() from below the expiry seq still serves the diff
    ch = store.changes("1h", from_seq=lag_cursor)
    assert ch.filter(F.col("op") == "insert").count() > 0

    # the lagged matview refresh absorbs the late batch; expired-date
    # aggregates are retained, not retracted
    mv.refresh("mv-2")
    after = mv.read().toPandas()
    assert len(after) > len(view_before)
    kept = after[after["bucket_start"] < "2024-01-15"]
    want = view_before[view_before["bucket_start"] < "2024-01-15"]
    assert len(kept) == len(want) and len(kept) > 0


def test_scoped_persists_survives_registry_prune(spark, monkeypatch):
    """scoped_persists must release by IDENTITY: a persist_tracked()
    inside the scope can trigger the registry's _prune() compaction,
    which shifts indices — an index-based mark would then release
    nothing (the exact unbounded-cache leak the scope guards)."""
    from s1tiling_spark.operators import cache

    monkeypatch.setattr(cache, "_PRUNE_AT", 2)
    cache.release_cached()
    a = cache.persist_tracked(spark.range(5))
    b = cache.persist_tracked(spark.range(6))
    b.unpersist()  # stale registry entry — _prune() will drop it
    with cache.scoped_persists():
        inner = cache.persist_tracked(spark.range(7))  # triggers _prune
        inner.count()
        assert inner.storageLevel.useMemory
    assert not inner.storageLevel.useMemory  # scope released it
    assert a.storageLevel.useMemory  # outer persist untouched
    cache.release_cached()
