"""Snapshot-as-of (time-travel) reads on the TierStore commit_seq
lineage, and compaction's interaction with them.

The reference's analog is restart-from-existing-products — the engine
can always reconstruct "the state a previous run saw"
(`/root/reference/s1tiling/libs/otbpipeline.py:814-819`). Here that
generalizes to Iceberg ``VERSION AS OF`` semantics: ``read(tier,
as_of_seq=N)`` reconstructs the table exactly as of commit N, and
``compact(expire_below=E)`` preserves every snapshot >= E while still
shrinking files. Also covers the crash-repair GC: a ``_stale_`` aside
whose live partition is missing must be RESTORED, never deleted.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from s1tiling_spark.operators.rollup import rollup_sequences
from s1tiling_spark.plans.store import TierStore
from s1tiling_spark.sources.synth import synth_sequences
from tests.helpers import assert_frames_match

SPLIT_TS = "2024-01-20 00:00:00"


@pytest.fixture()
def seq(spark):
    return synth_sequences(spark, 3000).cache()


def _state(store, tier, **kw):
    df = store.read(tier, **kw)
    assert df is not None
    drop = [c for c in ("commit_seq", "run_id", "p_date") if c in df.columns]
    return df.drop(*drop).toPandas()


def test_as_of_read_reconstructs_each_commit(spark, seq, tmp_path):
    """append(seq1) → append(seq2): read(as_of_seq=1) == post-first
    state byte-for-byte; read(as_of_seq=2) == latest; snapshots() lists
    both commits."""
    store = TierStore(spark, str(tmp_path / "asof"))
    early = rollup_sequences(seq.filter(F.col("event_ts") < SPLIT_TS), "1d")
    full = rollup_sequences(seq, "1d")
    s1 = store.next_commit_seq()
    store.append("1d", early, s1, "run-1")
    after_first = _state(store, "1d")
    s2 = store.next_commit_seq()
    store.append("1d", full, s2, "run-2")

    assert_frames_match(_state(store, "1d", as_of_seq=s1), after_first)
    assert_frames_match(_state(store, "1d", as_of_seq=s2), _state(store, "1d"))

    snaps = store.snapshots("1d").toPandas()
    assert snaps["commit_seq"].tolist() == [s1, s2]
    assert snaps["run_id"].tolist() == ["run-1", "run-2"]


def test_default_compact_preserves_surviving_seq_snapshots(spark, seq, tmp_path):
    """Disjoint incremental appends (the normal pattern) → default
    compact keeps every version, so as-of reads for all seqs survive.
    Split by source so both appends touch the same p_date partitions
    (files to merge) while keys stay disjoint (nothing superseded)."""
    store = TierStore(spark, str(tmp_path / "surv"))
    early = rollup_sequences(seq.filter(F.col("source") == "src_hot"), "1d")
    late = rollup_sequences(seq.filter(F.col("source") != "src_hot"), "1d")
    s1 = store.next_commit_seq()
    store.append("1d", early, s1, "run-1")
    pre_second = _state(store, "1d")
    s2 = store.next_commit_seq()
    store.append("1d", late, s2, "run-2")
    before = _state(store, "1d")

    stats = store.compact("1d")
    assert stats["files_after"] < stats["files_before"]
    # disjoint keys → nothing superseded → both seqs survive compact
    assert_frames_match(_state(store, "1d", as_of_seq=s1), pre_second)
    assert_frames_match(_state(store, "1d"), before)


def test_compact_expire_below_keeps_time_travel_on_overlap(spark, seq, tmp_path):
    """Overlapping appends (every key re-written) + compact with an
    explicit retention horizon: snapshots >= horizon stay exactly
    reconstructable, files shrink, latest read unchanged."""
    store = TierStore(spark, str(tmp_path / "ttl"))
    tier = rollup_sequences(seq, "1d")
    seqs = []
    for i in range(3):
        s = store.next_commit_seq()
        seqs.append(s)
        store.append(
            "1d", tier.withColumn("cnt", F.col("cnt") + i), s, f"run-{i}"
        )
    states = {s: _state(store, "1d", as_of_seq=s) for s in seqs}

    stats = store.compact("1d", expire_below=seqs[0])  # keep ALL snapshots
    assert stats["files_after"] < stats["files_before"]
    assert stats["rows"] == store.read("1d", deduped=False).count()
    for s in seqs:
        assert_frames_match(_state(store, "1d", as_of_seq=s), states[s])

    # tighten the horizon to the middle commit: seq[0] versions expire
    store.compact("1d", expire_below=seqs[1])
    assert store.min_as_of("1d") == seqs[1]
    assert_frames_match(_state(store, "1d", as_of_seq=seqs[1]), states[seqs[1]])
    assert_frames_match(_state(store, "1d", as_of_seq=seqs[2]), states[seqs[2]])
    with pytest.raises(ValueError, match="predates the compaction horizon"):
        store.read("1d", as_of_seq=seqs[0])


def test_full_compact_records_horizon_and_refuses_stale_as_of(spark, seq, tmp_path):
    """Default (full-expiry) compact on overlapping appends: latest read
    unchanged, but as-of below the recorded horizon RAISES instead of
    silently answering wrong."""
    store = TierStore(spark, str(tmp_path / "full"))
    tier = rollup_sequences(seq, "1d")
    s1 = store.next_commit_seq()
    store.append("1d", tier, s1, "run-1")
    s2 = store.next_commit_seq()
    store.append("1d", tier.withColumn("cnt", F.col("cnt") + 7), s2, "run-2")
    latest = _state(store, "1d")

    store.compact("1d")
    assert store.min_as_of("1d") >= s2
    assert_frames_match(_state(store, "1d"), latest)
    with pytest.raises(ValueError, match="predates the compaction horizon"):
        store.read("1d", as_of_seq=s1)


def test_compact_gc_restores_orphaned_aside(spark, seq, tmp_path):
    """Crash between rename-aside and rename-in leaves the partition's
    only copy in a _stale_ aside; the next compact must RESTORE it (and
    must NOT trust a leftover _compact_ tmp), never drop the partition
    (ADVICE r3, medium)."""
    store = TierStore(spark, str(tmp_path / "gc"))
    tier = rollup_sequences(seq, "1d")
    store.append("1d", tier, store.next_commit_seq(), "run-1")
    before = _state(store, "1d")
    path = store.tier_path("1d")
    parts = sorted(d for d in os.listdir(path) if d.startswith("p_date="))
    victim = parts[0]
    # simulate the crash window: aside exists, live partition missing,
    # and a half-written compact tmp dir is also lying around
    aside = f"_stale_{victim.replace('=', '~')}.deadbeef"
    os.rename(os.path.join(path, victim), os.path.join(path, aside))
    tmp = path + "_compact_deadcrash"
    os.makedirs(os.path.join(tmp, victim), exist_ok=True)

    store.compact("1d")
    assert os.path.isdir(os.path.join(path, victim))
    assert not os.path.isdir(tmp)
    assert not any(d.startswith("_stale_") for d in os.listdir(path))
    assert_frames_match(_state(store, "1d"), before)


def test_compact_gc_drops_aside_when_live_exists(spark, seq, tmp_path):
    """An aside whose live partition exists is dead old data → deleted."""
    store = TierStore(spark, str(tmp_path / "gc2"))
    tier = rollup_sequences(seq, "1d")
    store.append("1d", tier, store.next_commit_seq(), "run-1")
    path = store.tier_path("1d")
    victim = next(d for d in os.listdir(path) if d.startswith("p_date="))
    shutil.copytree(
        os.path.join(path, victim),
        os.path.join(path, f"_stale_{victim.replace('=', '~')}.feedface"),
    )
    before = _state(store, "1d")
    store.compact("1d")
    assert not any(d.startswith("_stale_") for d in os.listdir(path))
    assert_frames_match(_state(store, "1d"), before)
