"""MergeMatView: incrementally-maintained min/max/count/sum/HLL-distinct
aggregates (VERDICT r4 ask #3).

The invariant under test everywhere: after ANY lifecycle of base
appends/updates/deletes, the incrementally-refreshed view equals a
from-scratch full load of a fresh view over the SAME final base state —
min/max retraction handled by recompute-of-touched-groups, HLL registers
by element-wise max merge, vanished groups by equality delete.
"""

from __future__ import annotations

import os
from datetime import datetime

import pandas as pd
from pyspark.sql import functions as F

from s1tiling_spark.plans.matview import MergeMatView
from s1tiling_spark.plans.store import TierStore

SCHEMA = "bucket_start timestamp, source string, n_tok long, doc_id string"


def _rows(spark, rows):
    return spark.createDataFrame(
        [(datetime.fromisoformat(ts), s, n, d) for ts, s, n, d in rows], SCHEMA
    )


def _mk_view(store, name="stats"):
    return MergeMatView(
        store,
        name=name,
        base_tier="1h",
        base_keys=("bucket_start", "source"),
        group_cols={
            "bucket_start": F.date_trunc("day", F.col("bucket_start")),
            "source": F.col("source"),
        },
        sum_cols=("n_tok",),
        min_cols=("n_tok",),
        max_cols=("n_tok",),
        hll_cols={"docs": "doc_id"},
        group_date_span_days=1,
    )


def _state(view):
    df = view.read()
    if df is None:
        return pd.DataFrame()
    drop = [c for c in ("commit_seq", "run_id", "p_date") if c in df.columns]
    pdf = df.drop(*drop).toPandas()
    pdf["docs_regs"] = pdf["docs_regs"].map(tuple)
    return pdf.sort_values(["bucket_start", "source"]).reset_index(drop=True)


def _full_rebuild_state(spark, store, tmp_path, tag):
    """Fresh view over the same base store: the ground truth."""
    fresh = MergeMatView(
        store,
        name=f"rebuild_{tag}",
        base_tier="1h",
        base_keys=("bucket_start", "source"),
        group_cols={
            "bucket_start": F.date_trunc("day", F.col("bucket_start")),
            "source": F.col("source"),
        },
        sum_cols=("n_tok",),
        min_cols=("n_tok",),
        max_cols=("n_tok",),
        hll_cols={"docs": "doc_id"},
    )
    fresh.refresh(f"full-{tag}")
    return _state(fresh)


def test_lifecycle_incremental_equals_full_rebuild(spark, tmp_path):
    store = TierStore(spark, str(tmp_path / "mm"))
    view = _mk_view(store)

    # batch 1: two days, two sources
    b1 = _rows(
        spark,
        [
            ("2024-01-01 10:00:00", "a", 5, "d1"),
            ("2024-01-01 11:00:00", "a", 9, "d2"),
            ("2024-01-01 10:00:00", "b", 3, "d3"),
            ("2024-01-02 10:00:00", "a", 7, "d4"),
        ],
    )
    store.append("1h", b1, store.next_commit_seq(), "b1")
    r1 = view.refresh("mv-1")
    assert r1["rows"] == 3  # (d1,a) (d1,b) (d2,a)
    s1 = _state(view)
    assert s1[(s1.source == "a") & (s1.bucket_start == datetime(2024, 1, 1))][
        "n_tok_min"
    ].iloc[0] == 5
    pd.testing.assert_frame_equal(s1, _full_rebuild_state(spark, store, tmp_path, "t1"))

    # batch 2: insert-only growth into an existing group and a new group
    # (exercises the MERGE path: min/max fold, register max, sum add)
    b2 = _rows(
        spark,
        [
            ("2024-01-01 12:00:00", "a", 2, "d5"),
            ("2024-01-01 13:00:00", "a", 11, "d1"),  # repeat doc: distinct unchanged
            ("2024-01-03 10:00:00", "c", 1, "d6"),
        ],
    )
    store.append("1h", b2, store.next_commit_seq(), "b2")
    view.refresh("mv-2")
    s2 = _state(view)
    g = s2[(s2.source == "a") & (s2.bucket_start == datetime(2024, 1, 1))].iloc[0]
    assert (g["n_tok_min"], g["n_tok_max"], g["n_tok"], g["n_rows"]) == (2, 11, 27, 4)
    pd.testing.assert_frame_equal(s2, _full_rebuild_state(spark, store, tmp_path, "t2"))

    # batch 3: delete the row holding the (d1, a) MIN — recompute must
    # raise the min back to 5 (a retractable algebra would be wrong here)
    key_df = spark.createDataFrame(
        [(datetime.fromisoformat("2024-01-01 12:00:00"), "a")],
        "bucket_start timestamp, source string",
    )
    store.delete("1h", key_df, store.next_commit_seq(), "del-min")
    view.refresh("mv-3")
    s3 = _state(view)
    g = s3[(s3.source == "a") & (s3.bucket_start == datetime(2024, 1, 1))].iloc[0]
    assert (g["n_tok_min"], g["n_tok_max"], g["n_rows"]) == (5, 11, 3)
    pd.testing.assert_frame_equal(s3, _full_rebuild_state(spark, store, tmp_path, "t3"))

    # batch 4: delete EVERY row of a group — the view row must disappear
    gone = spark.createDataFrame(
        [(datetime.fromisoformat("2024-01-01 10:00:00"), "b")],
        "bucket_start timestamp, source string",
    )
    store.delete("1h", gone, store.next_commit_seq(), "del-group")
    view.refresh("mv-4")
    s4 = _state(view)
    assert not ((s4.source == "b").any())
    pd.testing.assert_frame_equal(s4, _full_rebuild_state(spark, store, tmp_path, "t4"))

    # batch 5: superseding append (newest-wins UPDATE of an existing key)
    b5 = _rows(spark, [("2024-01-02 10:00:00", "a", 100, "d9")])
    store.append("1h", b5, store.next_commit_seq(), "b5")
    view.refresh("mv-5")
    s5 = _state(view)
    g = s5[(s5.source == "a") & (s5.bucket_start == datetime(2024, 1, 2))].iloc[0]
    assert (g["n_tok_min"], g["n_tok_max"], g["n_tok"]) == (100, 100, 100)
    pd.testing.assert_frame_equal(s5, _full_rebuild_state(spark, store, tmp_path, "t5"))

    # no-op refresh: must not burn a commit seq
    before = store.last_commit_seq()
    assert view.refresh("mv-6")["rows"] == 0
    assert store.last_commit_seq() == before


def test_hll_registers_match_sketch_module(spark, tmp_path):
    """The view's dense register arrays are bit-identical to the sketch
    module's long-form registers over the same rows (same hash, same
    split) — the property the gated oracle relies on. Base rows are
    hourly-unique (the tier's newest-wins key discipline); the view
    groups by MONTH so each group sees hundreds of distinct keys."""
    from datetime import timedelta

    from s1tiling_spark.operators.sketch import distinct_registers_long

    store = TierStore(spark, str(tmp_path / "hll"))
    view = MergeMatView(
        store,
        name="monthly",
        base_tier="1h",
        base_keys=("bucket_start", "source"),
        group_cols={
            "bucket_start": F.date_trunc("month", F.col("bucket_start")),
            "source": F.col("source"),
        },
        hll_cols={"docs": "doc_id"},
    )
    t0 = datetime.fromisoformat("2024-01-01 00:00:00")
    rows = [
        ((t0 + timedelta(hours=i)).isoformat(sep=" "), "a", 1, f"doc{i % 137}")
        for i in range(400)
    ] + [
        ((t0 + timedelta(hours=i)).isoformat(sep=" "), "b", 1, f"doc{i % 23}")
        for i in range(100)
    ]
    store.append("1h", _rows(spark, rows), store.next_commit_seq(), "b1")
    view.refresh("mv-1")

    dense = (
        view.read()
        .select(
            "bucket_start",
            "source",
            F.posexplode("docs_regs").alias("reg", "rho"),
        )
        .filter(F.col("rho") > 0)
    )
    base = store.read("1h", keys=("bucket_start", "source"))
    long_form = distinct_registers_long(
        base.select(
            F.date_trunc("month", "bucket_start").alias("bucket_start"),
            "source",
            F.col("doc_id").alias("key"),
        ),
        F.col("bucket_start"),
        F.col("key"),
    )
    a = {tuple(r) for r in dense.collect()}
    b = {tuple(r) for r in long_form.collect()}
    assert a == b and len(a) > 30

    est = view.read_with_estimates().filter(F.col("source") == "a")
    jan = est.filter(F.month("bucket_start") == 1).collect()[0]
    assert 90 <= jan["docs_est"] <= 210  # 137 planted, ~13% rel. error at m=64


def test_refresh_crash_repair(spark, tmp_path):
    """Crash between the upsert append and the cursor write: the next
    refresh advances the cursor from the committed marker WITHOUT
    re-applying (a re-run would double-sum the merge path)."""
    store = TierStore(spark, str(tmp_path / "crash"))
    view = _mk_view(store)
    b1 = _rows(spark, [("2024-01-01 10:00:00", "a", 5, "d1")])
    store.append("1h", b1, store.next_commit_seq(), "b1")
    view.refresh("mv-1")
    b2 = _rows(spark, [("2024-01-01 11:00:00", "a", 9, "d2")])
    store.append("1h", b2, store.next_commit_seq(), "b2")
    view.refresh("mv-2")
    # simulate the crash: rewind the cursor to before refresh mv-2
    cursor_after_1 = None
    runs_dir = os.path.join(store.base_dir, "_committed_runs", view.view_tier)
    markers = sorted(os.listdir(runs_dir))
    assert len(markers) == 2
    cursor_after_1 = int(markers[-1].split("~")[1])
    view._advance_cursor(cursor_after_1)
    st_before = _state(view)
    res = view.refresh("mv-2-replay")
    assert res["rows"] == 0  # repaired, nothing recomputed
    pd.testing.assert_frame_equal(_state(view), st_before)


def test_refresh_repairs_torn_pending_delta(spark, tmp_path):
    """Crash DURING the delta append's file moves (pending marker, some
    files live): the next refresh must repair — remove the torn
    commit's files, recompute the range — never advance the cursor from
    a pending marker (the r5 two-phase protocol regression caught by
    review: the retry's range end differs, so append()'s own same-key
    repair can never fire for it)."""
    import json

    from s1tiling_spark.plans.store import atomic_json_write

    store = TierStore(spark, str(tmp_path / "torn"))
    view = _mk_view(store)
    store.append(
        "1h",
        _rows(spark, [("2024-01-01 10:00:00", "a", 5, "d1")]),
        store.next_commit_seq(),
        "b1",
    )
    view.refresh("mv-1")
    store.append(
        "1h",
        _rows(spark, [("2024-01-01 11:00:00", "a", 9, "d2")]),
        store.next_commit_seq(),
        "b2",
    )
    view.refresh("mv-2")
    good = _state(view)

    # rewind to the pre-mv-2 cursor and forge the torn state: the mv-2
    # marker back to pending while its data files are (partially) live
    runs_dir = os.path.join(store.base_dir, "_committed_runs", view.view_tier)
    marker = sorted(os.listdir(runs_dir))[-1]
    path = os.path.join(runs_dir, marker)
    with open(path) as f:
        rec = json.load(f)
    atomic_json_write(path, dict(rec, state="pending"))
    view._advance_cursor(int(marker.split("~")[1]))

    res = view.refresh("mv-2-retry")
    assert res["rows"] > 0  # recomputed, not skipped
    pd.testing.assert_frame_equal(_state(view), good)
    # no row of the torn commit survives
    raw = store.read(view.view_tier, deduped=False)
    assert raw.filter(f"commit_seq = {rec['commit_seq']}").count() == 0
