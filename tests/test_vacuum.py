"""Orphan-file vacuum (Iceberg ``remove_orphan_files`` analog).

The commit protocol makes file names the manifest, so anything a
reader would not admit is sweepable — but only once provably dead
(age guard), because a fresh unknown file may be a concurrent writer
mid-protocol. These tests pin: junk goes, fresh junk stays, committed
data and reads are untouched, and crashed-compact asides are HEALED
(restored), never swept.
"""

from __future__ import annotations

import os

import pytest

from s1tiling_spark.operators.rollup import rollup_sequences
from s1tiling_spark.plans.store import TierStore
from s1tiling_spark.sources.synth import synth_sequences

N = 800
OLD = -1.0  # negative age guard → every candidate counts as dead


@pytest.fixture()
def store(spark, tmp_path):
    st = TierStore(spark, str(tmp_path / "vac_store"))
    t1h = rollup_sequences(synth_sequences(spark, N), "1h")
    st.append("1h", t1h, st.next_commit_seq(), "seed")
    return st


def _plant(path: str, content: bytes = b"junk") -> str:
    with open(path, "wb") as f:
        f.write(content)
    return path


def test_vacuum_sweeps_junk_and_tombstones(store):
    before = store.read("1h").count()
    tier_dir = store.tier_path("1h")
    part = next(p for p in os.listdir(tier_dir) if p.startswith("p_date="))
    # a stray non-commit file doesn't just waste space — Spark's
    # directory listing feeds it to the parquet reader and every read
    # of its date fails; vacuum is the repair
    junk1 = _plant(os.path.join(tier_dir, part, "leftover.parquet"))
    junk2 = _plant(os.path.join(tier_dir, part, "editor.swp"))
    tomb = _plant(os.path.join(store.base_dir, "_meta_mutex.tomb.123.abcd"))

    rep = store.vacuum("1h", older_than_s=OLD)

    assert rep["junk_files"] == 2 and rep["tombstones"] == 1
    for p in (junk1, junk2, tomb):
        assert not os.path.exists(p)
    # committed data and reads untouched
    assert store.read("1h").count() == before
    assert all(
        f["file"].startswith(("c", "m")) for f in store.files("1h")
    )


def test_vacuum_age_guard_spares_fresh_files(store):
    tier_dir = store.tier_path("1h")
    part = next(p for p in os.listdir(tier_dir) if p.startswith("p_date="))
    fresh = _plant(os.path.join(tier_dir, part, "inflight.bin"))
    rep = store.vacuum("1h", older_than_s=3600.0)
    assert rep["junk_files"] == 0
    assert os.path.exists(fresh)


def test_vacuum_heals_crashed_compact_aside(store, spark):
    """An aside dir whose live partition is missing is the partition's
    ONLY copy — vacuum must restore it (rename back), not delete it."""
    tier_dir = store.tier_path("1h")
    part = next(p for p in os.listdir(tier_dir) if p.startswith("p_date="))
    live = os.path.join(tier_dir, part)
    aside = os.path.join(tier_dir, "_stale_" + part.replace("=", "~") + ".x1")
    before = store.read("1h").count()
    os.rename(live, aside)  # simulate crash between rename-aside and rename-in

    store.vacuum("1h", older_than_s=OLD)

    assert os.path.isdir(live) and not os.path.isdir(aside)
    assert store.read("1h").count() == before
