"""MERGE INTO semantics over the append-only commit model.

Matched-update + unmatched-insert is one newest-wins append (no
target scan); ``delete_unmatched=True`` adds the NOT-MATCHED-BY-SOURCE
delete clause, syncing the tier to the source snapshot. Crash
discipline is append-first (plans/backfill.py): the torn state is
stale-but-present, and re-running the merge heals it.

Reference analog: obsolete-product removal on re-run
(`s1tiling/libs/S1FileManager.py:735-748`) as a table-level sync.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from s1tiling_spark.plans.store import TierStore


def _rows(spark, vals):
    """vals: [(day, source, v)]"""
    return spark.createDataFrame(
        [(datetime(2024, 1, d, 10), s, v) for d, s, v in vals],
        "bucket_start timestamp, source string, v int",
    )


def _state(df):
    return {(str(r["p_date"]), r["source"], r["v"]) for r in df.collect()}


@pytest.fixture()
def store(spark, tmp_path):
    st = TierStore(spark, str(tmp_path / "mrg"))
    st.append(
        "t",
        _rows(spark, [(1, "a", 10), (2, "b", 20), (3, "c", 30)]),
        st.next_commit_seq(),
        "base",
    )
    return st


def test_merge_updates_inserts_and_syncs(store, spark):
    # source: updates a, inserts d, omits b and c
    src = _rows(spark, [(1, "a", 11), (4, "d", 40)])
    res = store.merge_into("t", src, "m1", delete_unmatched=True)
    assert res["appended_rows"] == 2 and res["deleted_keys"] == 2
    assert _state(store.read("t")) == {
        ("2024-01-01", "a", 11),
        ("2024-01-04", "d", 40),
    }
    # time travel below the merge still sees the pre-merge state
    pre = store.read("t", as_of_seq=res["append_seq"] - 1)
    assert _state(pre) == {
        ("2024-01-01", "a", 10),
        ("2024-01-02", "b", 20),
        ("2024-01-03", "c", 30),
    }


def test_merge_without_delete_keeps_unmatched(store, spark):
    src = _rows(spark, [(1, "a", 11)])
    res = store.merge_into("t", src, "m1")
    assert res["deleted_keys"] is None and res["delete_seq"] is None
    assert _state(store.read("t")) == {
        ("2024-01-01", "a", 11),
        ("2024-01-02", "b", 20),
        ("2024-01-03", "c", 30),
    }


def test_merge_rerun_heals_torn_sync(store, spark):
    """Crash between append and delete = unmatched keys stale-but-
    present. Re-running the same merge completes the sync and the
    duplicate append is absorbed by newest-wins."""
    src = _rows(spark, [(1, "a", 11)])
    # simulate the torn state: append landed, delete never ran
    store.append("t", src, store.next_commit_seq(), "m1-crashed")
    assert ("2024-01-02", "b", 20) in _state(store.read("t"))  # stale, present
    res = store.merge_into("t", src, "m1-retry", delete_unmatched=True)
    assert res["deleted_keys"] == 2
    assert _state(store.read("t")) == {("2024-01-01", "a", 11)}
    # a later append re-inserts a deleted key (delete masks only older)
    store.append("t", _rows(spark, [(2, "b", 21)]), store.next_commit_seq(), "re")
    assert _state(store.read("t")) == {
        ("2024-01-01", "a", 11),
        ("2024-01-02", "b", 21),
    }


def test_merge_into_empty_tier_inserts_all(spark, tmp_path):
    st = TierStore(spark, str(tmp_path / "mrg2"))
    res = st.merge_into(
        "t", _rows(spark, [(1, "a", 1)]), "m0", delete_unmatched=True
    )
    assert res["appended_rows"] == 1 and res["deleted_keys"] is None
    assert _state(st.read("t")) == {("2024-01-01", "a", 1)}
