"""Sort-order clustering on compaction + schema-evolution reads.

Two Iceberg semantics completing the TierStore story:

- ``compact(cluster_by=...)`` = ``rewrite_data_files`` with a sort
  strategy: each rewritten file is internally ordered on the cluster
  keys, so parquet row-group min/max stats become tight disjoint
  ranges and a routed read filtering on those keys skips row groups
  at the scan. The test proves the mechanism (file-level ordering via
  the parquet footer/page data itself) and that clustering changes
  nothing about MERGE-on-read results.
- ``read(merge_schema=True)`` = add-column schema evolution: later
  appends may carry new columns; old rows surface them as NULL.

Reference analog: the rewrite discipline mirrors the reference's
tmp→rename product re-write (`/root/reference/s1tiling/libs/
steps.py:123-145`); clustering generalizes its per-tile/per-date file
layout to intra-file ordering.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from s1tiling_spark.operators.rollup import rollup_sequences
from s1tiling_spark.plans.store import TierStore
from s1tiling_spark.sources.synth import synth_sequences
from tests.helpers import assert_frames_match


@pytest.fixture()
def seq(spark):
    return synth_sequences(spark, 3000).cache()


def _deduped_state(store, tier):
    df = store.read(tier)
    assert df is not None
    return (
        df.drop("commit_seq", "run_id", "p_date")
        .toPandas()
        .sort_values(["bucket_start", "source"])
        .reset_index(drop=True)
    )


def _tier_files(store, tier):
    path = store.tier_path(tier)
    for part in sorted(os.listdir(path)):
        if not part.startswith("p_date="):
            continue
        for fn in sorted(os.listdir(os.path.join(path, part))):
            if fn.endswith(".parquet"):
                yield os.path.join(path, part, fn)


def test_compact_cluster_by_orders_rows_inside_each_file(spark, seq, tmp_path):
    store = TierStore(spark, str(tmp_path / "clustered"))
    t1h = rollup_sequences(seq, "1h")
    s1 = store.next_commit_seq()
    # shuffle the write order so pre-compact files are NOT clustered
    store.append("1h", t1h.repartition(8), s1, "run-1")
    before = _deduped_state(store, "1h")

    stats = store.compact("1h", cluster_by=("source", "bucket_start"))
    assert stats["rows"] == len(before)

    checked_rows = 0
    for f in _tier_files(store, "1h"):
        t = pq.read_table(f, columns=["source", "bucket_start"])
        pairs = list(zip(t["source"].to_pylist(), t["bucket_start"].to_pylist()))
        assert pairs == sorted(pairs), f"{f} not clustered on (source, bucket_start)"
        checked_rows += len(pairs)
    assert checked_rows == len(before)

    # clustering is purely physical: MERGE-on-read result unchanged
    assert_frames_match(_deduped_state(store, "1h"), before)

    # the serving filter on the cluster key reaches the parquet scan
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        store.read("1h", deduped=False).filter(
            F.col("source") == "web"
        ).explain("formatted")
    text = buf.getvalue()
    assert "PushedFilters" in text and "source" in text


def test_compact_cluster_by_composes_with_expire_below(spark, seq, tmp_path):
    """cluster_by is orthogonal to snapshot expiry: a clustered
    history-preserving compaction keeps every as-of read exact."""
    store = TierStore(spark, str(tmp_path / "clustered_asof"))
    early = rollup_sequences(
        seq.filter(F.col("event_ts") < "2024-01-20 00:00:00"), "1d"
    )
    full = rollup_sequences(seq, "1d")
    s1 = store.next_commit_seq()
    store.append("1d", early.repartition(8), s1, "run-1")
    state_s1 = _deduped_state(store, "1d")
    s2 = store.next_commit_seq()
    store.append("1d", full.repartition(8), s2, "run-2")
    state_s2 = _deduped_state(store, "1d")

    store.compact("1d", expire_below=s1, cluster_by=("source", "bucket_start"))

    for f in _tier_files(store, "1d"):
        t = pq.read_table(f, columns=["source", "bucket_start"])
        pairs = list(zip(t["source"].to_pylist(), t["bucket_start"].to_pylist()))
        assert pairs == sorted(pairs)

    df_s1 = store.read("1d", as_of_seq=s1)
    assert_frames_match(
        df_s1.drop("commit_seq", "run_id", "p_date")
        .toPandas()
        .sort_values(["bucket_start", "source"])
        .reset_index(drop=True),
        state_s1,
    )
    assert_frames_match(_deduped_state(store, "1d"), state_s2)


def test_schema_evolution_merge_read(spark, seq, tmp_path):
    """A later append carrying a NEW column is readable: old rows
    back-fill NULL, the newest version per key still wins, and the
    evolved column survives compaction."""
    store = TierStore(spark, str(tmp_path / "evolve"))
    early = rollup_sequences(
        seq.filter(F.col("event_ts") < "2024-01-20 00:00:00"), "1d"
    )
    late = rollup_sequences(
        seq.filter(F.col("event_ts") >= "2024-01-20 00:00:00"), "1d"
    ).withColumn("quality_flag", F.lit("ok"))
    s1 = store.next_commit_seq()
    store.append("1d", early, s1, "run-1")
    s2 = store.next_commit_seq()
    store.append("1d", late, s2, "run-2")

    df = store.read("1d", merge_schema=True)
    assert "quality_flag" in df.columns
    pdf = df.toPandas()
    old = pdf[pdf["commit_seq"] == s1]
    new = pdf[pdf["commit_seq"] == s2]
    assert len(old) and len(new)
    assert old["quality_flag"].isna().all()
    assert (new["quality_flag"] == "ok").all()

    # disjoint date ranges: merge-read row count is the sum
    assert len(pdf) == early.count() + late.count()

    # evolution survives a clustered rewrite (compact reads WITH
    # merge_schema would drop nothing; default read picks one footer's
    # schema — exercise the documented path: merge-read after compact)
    store.compact(
        "1d", cluster_by=("source", "bucket_start"),
    )
    pdf2 = store.read("1d", merge_schema=True).toPandas()
    assert "quality_flag" in pdf2.columns
    assert len(pdf2) == len(pdf)


def test_maybe_compact_triggers_on_version_ratio(spark, seq, tmp_path):
    """The ratio-driven maintenance policy (PERF.md par.16): a single
    append (ratio ~1) must NOT rewrite; a second fully-overlapping
    append (ratio ~2) must; results are unchanged either way."""
    store = TierStore(spark, str(tmp_path / "auto"))
    t1d = rollup_sequences(seq, "1d")
    store.append("1d", t1d, store.next_commit_seq(), "run-1")

    r1 = store.maybe_compact("1d", max_version_ratio=1.9)
    assert r1["compacted"] is False and 0.9 < r1["version_ratio"] < 1.1

    store.append("1d", t1d.withColumn("cnt", F.col("cnt") + 1), store.next_commit_seq(), "run-2")
    before = _deduped_state(store, "1d")
    r2 = store.maybe_compact(
        "1d", max_version_ratio=1.9, cluster_by=("source", "bucket_start")
    )
    assert r2["compacted"] is True and r2["version_ratio"] > 1.8
    assert r2["files_after"] <= r2["files_before"]
    assert_frames_match(_deduped_state(store, "1d"), before)

    # convergence guard: no appends since the rewrite -> the next
    # scheduled run SKIPS without even probing (the retained-history
    # ratio would otherwise re-trigger a useless full rewrite forever
    # under expire_below retention)
    r3 = store.maybe_compact("1d", max_version_ratio=1.9)
    assert r3 == {"compacted": False, "version_ratio": None}
    # ...and a fresh append re-arms the policy
    store.append(
        "1d", t1d.withColumn("cnt", F.col("cnt") + 2), store.next_commit_seq(), "run-3"
    )
    r4 = store.maybe_compact("1d", max_version_ratio=1.9)
    assert r4["version_ratio"] is not None


# ---------- rename / drop (metadata schema evolution) ----------

_EVO_SCHEMA = "bucket_start timestamp, source string, v long"


def _evo_rows(spark, ts, src, val, col="v"):
    from datetime import datetime

    return spark.createDataFrame(
        [(datetime.fromisoformat(ts), src, val)],
        _EVO_SCHEMA.replace(" v ", f" {col} "),
    )


def test_rename_column_resolves_both_spellings(spark, tmp_path):
    """Metadata rename: current reads serve the new name coalescing
    files written under either spelling; as-of reads BELOW the rename
    still serve the old name; the rename survives a pure file
    compaction AND a full compaction (VERDICT r4 ask #8)."""
    store = TierStore(spark, str(tmp_path / "ren"))
    s1 = store.next_commit_seq()
    store.append("t", _evo_rows(spark, "2024-01-01 10:00:00", "a", 1), s1, "b1")
    rn_seq = store.rename_column("t", "v", "val")
    assert rn_seq > s1
    s3 = store.next_commit_seq()
    store.append(
        "t", _evo_rows(spark, "2024-01-02 10:00:00", "b", 2, col="val"), s3, "b2"
    )

    cur = store.read("t")
    assert "val" in cur.columns and "v" not in cur.columns
    assert {(r["source"], r["val"]) for r in cur.collect()} == {("a", 1), ("b", 2)}

    old = store.read("t", as_of_seq=s1)
    assert "v" in old.columns and "val" not in old.columns
    assert [(r["source"], r["v"]) for r in old.collect()] == [("a", 1)]

    # pure file compaction (full history kept): both horizons intact
    store.compact("t", expire_below=0)
    cur = store.read("t")
    assert {(r["source"], r["val"]) for r in cur.collect()} == {("a", 1), ("b", 2)}
    old = store.read("t", as_of_seq=s1)
    assert [(r["source"], r["v"]) for r in old.collect()] == [("a", 1)]

    # full compaction bakes the canonical name into every file; the
    # old-name as-of read still resolves as long as its snapshot
    # survives the horizon
    store.compact("t")
    cur = store.read("t")
    assert {(r["source"], r["val"]) for r in cur.collect()} == {("a", 1), ("b", 2)}
    if store.min_as_of("t") <= s1:
        old = store.read("t", as_of_seq=s1)
        assert [(r["source"], r["v"]) for r in old.collect()] == [("a", 1)]


def test_drop_column_hides_then_compaction_applies(spark, tmp_path):
    """Metadata drop: hidden from current reads immediately, visible to
    as-of reads below the drop; a history-preserving compaction keeps
    the column physically (its snapshots still show it), a full
    compaction removes it and extends the horizon so no read can
    resurrect it silently."""
    import pyarrow.parquet as _pq

    store = TierStore(spark, str(tmp_path / "drop"))
    df = spark.createDataFrame(
        [(__import__("datetime").datetime(2024, 1, 1, 10), "a", 1, 99)],
        "bucket_start timestamp, source string, v long, extra long",
    )
    s1 = store.next_commit_seq()
    store.append("t", df, s1, "b1")
    d_seq = store.drop_column("t", "extra")

    cur = store.read("t")
    assert "extra" not in cur.columns and cur.count() == 1
    old = store.read("t", as_of_seq=s1)
    assert old.select("extra").collect()[0][0] == 99

    # history-preserving compaction keeps the column in the files
    store.compact("t", expire_below=0)
    assert store.read("t", as_of_seq=s1).select("extra").collect()[0][0] == 99
    assert "extra" not in store.read("t").columns

    # full compaction: physically gone, horizon covers the drop
    store.compact("t")
    tier_dir = store.tier_path("t")
    for part in os.listdir(tier_dir):
        if part.startswith("p_date="):
            for fn in os.listdir(os.path.join(tier_dir, part)):
                if fn.endswith(".parquet"):
                    names = _pq.read_schema(os.path.join(tier_dir, part, fn)).names
                    assert "extra" not in names
    assert store.min_as_of("t") >= d_seq
    with pytest.raises(ValueError, match="predates"):
        store.read("t", as_of_seq=s1)


def test_schema_op_validation(spark, tmp_path):
    from datetime import datetime as _dt

    store = TierStore(spark, str(tmp_path / "val"))
    df = spark.createDataFrame(
        [(_dt(2024, 1, 1, 10), "a", 1, 2)],
        "bucket_start timestamp, source string, v long, w long",
    )
    store.append("t", df, store.next_commit_seq(), "b1")
    with pytest.raises(ValueError, match="structural"):
        store.rename_column("t", "source", "src")
    with pytest.raises(ValueError, match="structural"):
        store.drop_column("t", "bucket_start")
    with pytest.raises(ValueError, match="no column"):
        store.rename_column("t", "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        store.rename_column("t", "v", "w")


def test_rename_then_changes_serves_canonical_schema(spark, tmp_path):
    """A changelog range crossing a rename must not misalign columns:
    both as-of states are read under canonical (current) names."""
    store = TierStore(spark, str(tmp_path / "chren"))
    s1 = store.next_commit_seq()
    store.append("t", _evo_rows(spark, "2024-01-01 10:00:00", "a", 1), s1, "b1")
    store.rename_column("t", "v", "val")
    s3 = store.next_commit_seq()
    store.append(
        "t", _evo_rows(spark, "2024-01-01 10:00:00", "a", 5, col="val"), s3, "b2"
    )
    ch = store.changes("t", from_seq=s1, to_seq=s3)
    rows = [(r["op"], r["val"]) for r in ch.collect()]
    assert rows == [("update", 5)]


# ---------- widen (type promotion) ----------


def _typed_rows(spark, ts, src, val, vtype="int"):
    from datetime import datetime as _dt

    return spark.createDataFrame(
        [(_dt.fromisoformat(ts), src, val)],
        f"bucket_start timestamp, source string, v {vtype}",
    )


def test_widen_column_mixes_narrow_and_wide_files(spark, tmp_path):
    """Metadata widen (Iceberg type promotion int→long): narrow files
    written before the widen and wide files after it scan TOGETHER
    (mergeSchema refuses this — the explicit union schema is the
    mechanism); current reads serve bigint with a genuinely 64-bit
    value intact, as-of reads below the widen still serve int; compact
    bakes the wide type into every footer."""
    import pyarrow.parquet as _pq

    store = TierStore(spark, str(tmp_path / "widen"))
    s1 = store.next_commit_seq()
    store.append("t", _typed_rows(spark, "2024-01-01 10:00:00", "a", 7), s1, "b1")
    w_seq = store.widen_column("t", "v", "bigint")
    assert w_seq > s1
    big = 3_000_000_000  # > 2^31: only representable post-widen
    s3 = store.next_commit_seq()
    store.append(
        "t",
        _typed_rows(spark, "2024-01-02 10:00:00", "b", big, vtype="bigint"),
        s3,
        "b2",
    )

    cur = store.read("t")
    assert dict(cur.dtypes)["v"] == "bigint"
    assert {(r["source"], r["v"]) for r in cur.collect()} == {("a", 7), ("b", big)}

    old = store.read("t", as_of_seq=s1)
    assert dict(old.dtypes)["v"] == "int"
    assert [(r["source"], r["v"]) for r in old.collect()] == [("a", 7)]

    # changelog crossing the widen: canonical (wide) on both horizons
    ch = store.changes("t", from_seq=s1, to_seq=s3)
    assert [(r["op"], r["v"]) for r in ch.collect()] == [("insert", big)]

    # history-preserving compaction: files rewritten wide, horizons intact
    store.compact("t", expire_below=0)
    for part in os.listdir(store.tier_path("t")):
        if part.startswith("p_date="):
            pdir = os.path.join(store.tier_path("t"), part)
            for fn in os.listdir(pdir):
                if fn.endswith(".parquet"):
                    sch = _pq.read_schema(os.path.join(pdir, fn))
                    assert str(sch.field("v").type) == "int64"
    cur = store.read("t")
    assert dict(cur.dtypes)["v"] == "bigint"
    assert {(r["source"], r["v"]) for r in cur.collect()} == {("a", 7), ("b", big)}
    old = store.read("t", as_of_seq=s1)
    assert dict(old.dtypes)["v"] == "int"
    assert [(r["source"], r["v"]) for r in old.collect()] == [("a", 7)]

    # full compaction: op baked below the horizon, plain inferred reads
    store.compact("t")
    cur = store.read("t")
    assert dict(cur.dtypes)["v"] == "bigint"
    assert {(r["source"], r["v"]) for r in cur.collect()} == {("a", 7), ("b", big)}


def test_widen_validation(spark, tmp_path):
    from datetime import datetime as _dt

    store = TierStore(spark, str(tmp_path / "wval"))
    df = spark.createDataFrame(
        [(_dt(2024, 1, 1, 10), "a", 1, 1.5, "x")],
        "bucket_start timestamp, source string, v int, f float, lbl string",
    )
    store.append("t", df, store.next_commit_seq(), "b1")
    with pytest.raises(ValueError, match="structural"):
        store.widen_column("t", "commit_seq", "bigint")
    with pytest.raises(ValueError, match="no column"):
        store.widen_column("t", "nope", "bigint")
    with pytest.raises(ValueError, match="crosses type families"):
        store.widen_column("t", "v", "double")
    with pytest.raises(ValueError, match="crosses type families"):
        store.widen_column("t", "lbl", "bigint")
    with pytest.raises(ValueError, match="not wider"):
        store.widen_column("t", "v", "int")
    with pytest.raises(ValueError, match="not a widening target"):
        store.widen_column("t", "v", "string")
    # float→double is the fractional promotion
    store.widen_column("t", "f", "double")
    assert dict(store.read("t").dtypes)["f"] == "double"
    # and a second widen continues from the already-widened type
    with pytest.raises(ValueError, match="not wider"):
        store.widen_column("t", "f", "double")


def test_widen_then_rename_resolves_through_the_chain(spark, tmp_path):
    """A widen recorded before a later rename must keep applying to the
    column's NEW spelling (the forward-resolution chain), and the as-of
    read below both ops serves the original narrow name and type."""
    store = TierStore(spark, str(tmp_path / "wren"))
    s1 = store.next_commit_seq()
    store.append("t", _typed_rows(spark, "2024-01-01 10:00:00", "a", 7), s1, "b1")
    store.widen_column("t", "v", "bigint")
    store.rename_column("t", "v", "val")
    big = 4_000_000_000
    s4 = store.next_commit_seq()
    store.append(
        "t",
        spark.createDataFrame(
            [(__import__("datetime").datetime(2024, 1, 2, 10), "b", big)],
            "bucket_start timestamp, source string, val bigint",
        ),
        s4,
        "b2",
    )
    cur = store.read("t")
    assert dict(cur.dtypes)["val"] == "bigint" and "v" not in cur.columns
    assert {(r["source"], r["val"]) for r in cur.collect()} == {("a", 7), ("b", big)}
    old = store.read("t", as_of_seq=s1)
    assert dict(old.dtypes)["v"] == "int" and "val" not in old.columns
    assert [(r["source"], r["v"]) for r in old.collect()] == [("a", 7)]


# ---------- write-time schema alignment (the Iceberg write contract) ----------


def test_append_upcasts_narrow_batch_after_widen(spark, tmp_path):
    """After ``widen_column`` the tier's declared type gates every
    append: a batch still carrying the NARROW type is upcast at write
    time, so no post-widen footer is ever narrow — plain inferred
    scans (post-compact) never meet mixed widths, and the landmine
    cannot detonate at read time after the writer is gone."""
    store = TierStore(spark, str(tmp_path / "aw"))
    s1 = store.next_commit_seq()
    store.append("t", _typed_rows(spark, "2024-01-01 10:00:00", "a", 7), s1, "b1")
    store.widen_column("t", "v", "bigint")
    # narrow batch AFTER the widen — same store instance (memo must be
    # invalidated by the schema op, not just refreshed on conflict)
    s3 = store.next_commit_seq()
    store.append("t", _typed_rows(spark, "2024-01-02 10:00:00", "b", 9), s3, "b2")

    # every footer under the post-widen date is already int64
    for part in os.listdir(store.tier_path("t")):
        if part.startswith("p_date=2024-01-02"):
            pdir = os.path.join(store.tier_path("t"), part)
            for fn in os.listdir(pdir):
                if fn.endswith(".parquet"):
                    sch = pq.read_schema(os.path.join(pdir, fn))
                    assert str(sch.field("v").type) == "int64"
    cur = store.read("t")
    assert dict(cur.dtypes)["v"] == "bigint"
    assert {(r["source"], r["v"]) for r in cur.collect()} == {("a", 7), ("b", 9)}


def test_append_wide_without_declared_widen_raises(spark, tmp_path):
    """A wide value under a narrow declared type is out of contract
    (an as-of read below the widen would downcast it): the append
    fails fast, naming the widen_column call that legalizes it."""
    store = TierStore(spark, str(tmp_path / "awr"))
    store.append(
        "t",
        _typed_rows(spark, "2024-01-01 10:00:00", "a", 7),
        store.next_commit_seq(),
        "b1",
    )
    with pytest.raises(ValueError, match="widen_column"):
        store.append(
            "t",
            _typed_rows(spark, "2024-01-02 10:00:00", "b", 3_000_000_000, "bigint"),
            store.next_commit_seq(),
            "b2",
        )
    # cross-family conflict is a rewrite, not an evolution
    with pytest.raises(ValueError, match="type families"):
        store.append(
            "t",
            spark.createDataFrame(
                [(__import__("datetime").datetime(2024, 1, 2, 10), "b", "oops")],
                "bucket_start timestamp, source string, v string",
            ),
            store.next_commit_seq(),
            "b3",
        )


def test_append_honors_concurrent_writers_widen(spark, tmp_path):
    """The declared-type memo is per store instance; a widen declared
    by ANOTHER process must be honored, not spuriously rejected off
    the stale memo — the conflict path re-reads disk truth first."""
    a = TierStore(spark, str(tmp_path / "cw"), multi_writer=True)
    b = TierStore(spark, str(tmp_path / "cw"), multi_writer=True)
    a.append(
        "t",
        _typed_rows(spark, "2024-01-01 10:00:00", "a", 7),
        a.next_commit_seq(),
        "b1",
    )
    # warm a's memo with the narrow declared type
    a.append(
        "t",
        _typed_rows(spark, "2024-01-01 11:00:00", "a2", 8),
        a.next_commit_seq(),
        "b2",
    )
    b.widen_column("t", "v", "bigint")
    big = 5_000_000_000
    a.append(
        "t",
        _typed_rows(spark, "2024-01-02 10:00:00", "c", big, "bigint"),
        a.next_commit_seq(),
        "b3",
    )
    cur = a.read("t")
    assert dict(cur.dtypes)["v"] == "bigint"
    assert {(r["source"], r["v"]) for r in cur.collect()} == {
        ("a", 7),
        ("a2", 8),
        ("c", big),
    }


def test_append_aligns_add_column_evolutions_later_spelling(spark, tmp_path):
    """Add-column evolution passes through; a LATER batch spelling the
    new column narrower is aligned against the remembered declared
    type, not treated as a fresh column."""
    from datetime import datetime as _dt

    store = TierStore(spark, str(tmp_path / "ac"))
    store.append(
        "t",
        _typed_rows(spark, "2024-01-01 10:00:00", "a", 7),
        store.next_commit_seq(),
        "b1",
    )
    store.append(
        "t",
        spark.createDataFrame(
            [(_dt(2024, 1, 2, 10), "b", 8, 6_000_000_000)],
            "bucket_start timestamp, source string, v int, extra bigint",
        ),
        store.next_commit_seq(),
        "b2",
    )
    store.append(
        "t",
        spark.createDataFrame(
            [(_dt(2024, 1, 3, 10), "c", 9, 11)],
            "bucket_start timestamp, source string, v int, extra int",
        ),
        store.next_commit_seq(),
        "b3",
    )
    for part in os.listdir(store.tier_path("t")):
        if part.startswith("p_date=2024-01-03"):
            pdir = os.path.join(store.tier_path("t"), part)
            for fn in os.listdir(pdir):
                if fn.endswith(".parquet"):
                    sch = pq.read_schema(os.path.join(pdir, fn))
                    assert str(sch.field("extra").type) == "int64"
    cur = store.read("t", merge_schema=True)
    assert dict(cur.dtypes)["extra"] == "bigint"
    got = {(r["source"], r["v"], r["extra"]) for r in cur.collect()}
    assert got == {("a", 7, None), ("b", 8, 6_000_000_000), ("c", 9, 11)}
