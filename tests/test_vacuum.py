"""Orphan-file vacuum (Iceberg ``remove_orphan_files`` analog).

Anything a reader COULD serve is sacred: ``*.parquet`` is never swept,
prefixed or legacy-unprefixed, because the reader's directory scan and
``_plan_files_above_seq``'s legacy admission both treat it as data.
Sweepable is only what no code path serves — non-parquet strays (which
actively BREAK reads of their date), stale lock tombstones, crashed
scratch — and only once provably dead: junk ages against the caller's
guard, tombstones against the FIXED staleness horizon so an aggressive
guard cannot race ``_break_stale_lock``'s link-back of a
live-after-all lock. Crashed-compact asides are HEALED (restored),
never swept.
"""

from __future__ import annotations

import os

import pytest

from s1tiling_spark.operators.rollup import rollup_sequences
from s1tiling_spark.plans.store import TierStore
from s1tiling_spark.sources.synth import synth_sequences

N = 800
OLD = -1.0  # negative junk guard → every junk candidate counts as dead


@pytest.fixture()
def store(spark, tmp_path):
    st = TierStore(spark, str(tmp_path / "vac_store"))
    t1h = rollup_sequences(synth_sequences(spark, N), "1h")
    st.append("1h", t1h, st.next_commit_seq(), "seed")
    return st


def _plant(path: str, content: bytes = b"junk", mtime: float | None = None) -> str:
    with open(path, "wb") as f:
        f.write(content)
    if mtime is not None:
        os.utime(path, (mtime, mtime))
    return path


def test_vacuum_sweeps_junk_and_tombstones_spares_parquet(store):
    before = store.read("1h").count()
    tier_dir = store.tier_path("1h")
    part = next(p for p in os.listdir(tier_dir) if p.startswith("p_date="))
    # non-parquet strays don't just waste space — Spark's directory
    # listing feeds them to the parquet reader and every read of their
    # date fails; vacuum is the repair
    junk1 = _plant(os.path.join(tier_dir, part, "editor.swp"))
    junk2 = _plant(os.path.join(tier_dir, part, "core.12345"))
    # an UNPREFIXED parquet is legacy/bulk-imported DATA the reader
    # serves — vacuum must never touch it
    legacy = _plant(os.path.join(tier_dir, part, "leftover.parquet"))
    # tombstones age against the fixed staleness horizon, so make it old
    tomb = _plant(
        os.path.join(store.base_dir, "_meta_mutex.tomb.123.abcd"), mtime=1.0
    )

    rep = store.vacuum("1h", older_than_s=OLD)

    assert rep["junk_files"] == 2 and rep["tombstones"] == 1
    for p in (junk1, junk2, tomb):
        assert not os.path.exists(p)
    assert os.path.exists(legacy)
    # committed data and reads untouched (drop the garbage-bytes legacy
    # plant first — a real legacy file would be valid parquet)
    os.remove(legacy)
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


def test_vacuum_spares_fresh_tombstone_despite_aggressive_guard(store):
    """A young tombstone may be mid-_break_stale_lock (the breaker can
    still need it to reinstate a live lock) — the caller's junk guard
    must not be able to sweep it."""
    tomb = _plant(os.path.join(store.base_dir, "_maint_lock_1h.tomb.9.zz"))
    rep = store.vacuum("1h", older_than_s=OLD)
    assert rep["tombstones"] == 0
    assert os.path.exists(tomb)


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
