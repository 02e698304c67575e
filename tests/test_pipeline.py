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
