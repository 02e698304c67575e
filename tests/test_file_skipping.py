"""Data-file skipping by per-file source bounds — the Iceberg manifest
``lower_bounds``/``upper_bounds`` pruning analog.

The tier is partitioned by date only; a second physical partition
dimension on ``source`` would explode partition counts at 10^12 rows.
Instead the writer records each committed file's ``source`` min/max in
the table meta (one local footer read per file it just wrote), and
``read(sources=[...])`` skips whole files whose range admits none of
the requested sources. Pruning is advisory — the row filter is always
applied, files without bounds are always scanned — so every test here
asserts BOTH parity (pruned read == row-filtered plain read) and the
scan-shape win (``df.inputFiles()`` shrinks).

Reference analog: per-polarization product selection
(`/root/reference/s1tiling/libs/S1FileManager.py:1006-1039`) — the
reference walks the filesystem per polarization; here layout metadata
answers without opening non-matching files.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from s1tiling_spark.plans.store import TierStore


def _rows(spark, src, days=(1, 2), v0=10):
    data = [
        (datetime(2024, 1, d, 10), src, v0 + d)
        for d in days
    ]
    return spark.createDataFrame(
        data, "bucket_start timestamp, source string, v int"
    )


@pytest.fixture()
def store3(spark, tmp_path):
    """Three single-source appends × two dates = six files, each file
    covering exactly one source."""
    store = TierStore(spark, str(tmp_path / "fs"))
    for i, src in enumerate(["src_a", "src_b", "src_c"]):
        store.append("t", _rows(spark, src, v0=10 * i), store.next_commit_seq(), f"b{i}")
    return store


def _vals(df):
    return {(r["source"], str(r["p_date"]), r["v"]) for r in df.collect()}


def test_source_read_parity_and_file_skipping(store3):
    plain = store3.read("t").filter(F.col("source") == "src_a")
    pruned = store3.read("t", sources=["src_a"])
    assert _vals(pruned) == _vals(plain)
    # scan shape: only src_a's two files are planned, not all six
    assert len(store3.read("t").inputFiles()) == 6
    assert len(pruned.inputFiles()) == 2

    two = store3.read("t", sources=["src_a", "src_c"])
    assert len(two.inputFiles()) == 4
    assert _vals(two) == _vals(
        store3.read("t").filter(F.col("source").isin("src_a", "src_c"))
    )


def test_unknown_source_reads_empty_without_full_scan(store3):
    out = store3.read("t", sources=["nope"])
    assert out.count() == 0
    # every file was prunable; the planner keeps a single token file
    # so the scan relation has a path — not the full table
    assert len(out.inputFiles()) == 1


def test_missing_bounds_entry_is_conservatively_scanned(store3):
    # simulate a crash between the file move and the bounds record:
    # drop src_b's entries from the append sidecar — its files must be
    # scanned again (bounds are advisory, absence is conservative)
    bounds = store3._file_bounds("t")
    b_files = {rel for rel, b in bounds.items() if b[0] == "src_b"}
    assert b_files
    sidecar = store3._bounds_sidecar_path("t")
    import json

    with open(sidecar) as f:
        keep = [
            line
            for line in f
            if line.strip() and json.loads(line)["rel"] not in b_files
        ]
    with open(sidecar, "w") as f:
        f.writelines(keep)
    pruned = store3.read("t", sources=["src_b"])
    assert _vals(pruned) == _vals(
        store3.read("t").filter(F.col("source") == "src_b")
    )
    # src_b's own files have no bounds → scanned; a+c still pruned
    assert len(pruned.inputFiles()) == 2
    # and an src_a read now scans its 2 files PLUS the 2 unknown ones
    assert len(store3.read("t", sources=["src_a"]).inputFiles()) == 4


def test_range_bounds_admit_middle_source(spark, tmp_path):
    """A mixed file spanning [src_a, src_c] cannot be skipped for
    src_b (bounds are a RANGE, not a set) — parity stays exact."""
    store = TierStore(spark, str(tmp_path / "rng"))
    mixed = _rows(spark, "src_a", days=(1,)).unionByName(
        _rows(spark, "src_c", days=(1,))
    )
    store.append("t", mixed, store.next_commit_seq(), "b0")
    store.append("t", _rows(spark, "src_b", days=(2,)), store.next_commit_seq(), "b1")
    out = store.read("t", sources=["src_b"])
    assert _vals(out) == _vals(
        store.read("t").filter(F.col("source") == "src_b")
    )
    # the mixed [a,c] file is NOT prunable for b — both files scanned
    assert len(out.inputFiles()) == 2


def test_compact_rebuilds_bounds_and_prunes_dead_entries(store3):
    meta_before = store3._file_bounds("t")
    assert len(meta_before) == 6
    # pre-compact, appends land in the O(1) sidecar, not the meta JSON
    assert not store3._read_compact_meta().get("_filebounds_t")
    store3.compact("t")
    # compact folds the sidecar into the meta baseline and truncates it
    meta_after = store3._read_compact_meta()["_filebounds_t"]
    assert meta_after == store3._file_bounds("t")
    import os as _os

    assert not _os.path.exists(store3._bounds_sidecar_path("t"))
    # compact folded each date's three files into one wide-range file;
    # every entry points at a live file (dead ones pruned)
    import os

    root = store3.tier_path("t")
    assert meta_after and all(
        os.path.exists(os.path.join(root, rel)) for rel in meta_after
    )
    assert not (set(meta_before) & set(meta_after))
    # post-compact files span [src_a, src_c]: no pruning for src_b,
    # but parity must hold through the rebuilt manifest
    out = store3.read("t", sources=["src_b"])
    assert _vals(out) == _vals(
        store3.read("t").filter(F.col("source") == "src_b")
    )


def test_sources_composes_with_deletes_and_time_travel(store3):
    # delete src_a's day-1 row, then read src_a via pruning: the delete
    # mask applies inside the pruned scan exactly as in the plain read
    dels = store3.spark.createDataFrame(
        [(datetime(2024, 1, 1, 10), "src_a")],
        "bucket_start timestamp, source string",
    )
    del_seq = store3.next_commit_seq()
    store3.delete("t", dels, del_seq, "d1", keys=("bucket_start", "source"))
    pruned = store3.read("t", sources=["src_a"])
    assert _vals(pruned) == _vals(
        store3.read("t").filter(F.col("source") == "src_a")
    )
    assert {r["v"] for r in pruned.collect()} == {2}
    # as-of below the delete still serves both rows, still pruned
    old = store3.read("t", sources=["src_a"], as_of_seq=del_seq - 1)
    assert {r["v"] for r in old.collect()} == {1, 2}
    # count data files only (inputFiles also lists the _deletes mask)
    assert len([f for f in old.inputFiles() if "/p_date=" in f]) == 2
