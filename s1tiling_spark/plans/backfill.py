"""Backfill: bucket-aligned recompute of a time window through the
tier store.

The production operation every pipeline eventually needs: a window of
raw data was wrong (late correction, upstream re-delivery, bad batch)
and every derived tier must be re-derived for exactly that window —
without touching the rest of the table and without breaking downstream
incremental consumers.

Reference analog: the forced re-run path
(`/root/reference/s1tiling/libs/S1FileManager.py:735-748` evicts an
existing product so the planner recomputes it) — generalized from
file-granular to bucket-granular with exact snapshot semantics.

Mechanics per tier:

1. EXPAND the window to tier-bucket boundaries (a 30d bucket straddling
   the corrected window must be recomputed whole, from raw rows inside
   AND outside the window — so the caller passes the full corrected raw
   table and each tier filters its own expansion).
2. GROUP-DELETE every existing key in the expanded window, keyed on
   ``bucket_start`` alone — the equality-delete key-prefix rule masks
   every source of the bucket, including sources the correction
   removed entirely (the case a delete keyed on the corrected rows'
   own keys would miss).
3. APPEND the recomputed rollup of the expanded window.

Both steps ride the normal commit lineage, so time travel shows the
pre-backfill state, `changes()` emits the exact per-key diff, and an
incremental matview refresh absorbs the backfill with no special
casing. Cost shape: O(window) recompute + O(keys in window) delete —
never a full-table rewrite; at 10^12 rows a one-day correction touches
one day.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from s1tiling_spark.operators.rollup import rollup_sequences
from .store import TierStore

_SPAN_S = {"1h": 3_600, "1d": 86_400, "30d": 30 * 86_400}
_EPOCH = datetime(1970, 1, 1)


def _floor(tier: str, dt: datetime) -> datetime:
    """Python-side analog of operators.rollup.bucket_col (same epoch
    alignment for 30d, same truncation for calendar tiers)."""
    span = _SPAN_S[tier]
    secs = int((dt - _EPOCH).total_seconds())
    return _EPOCH + timedelta(seconds=(secs // span) * span)


def expanded_window(
    tier: str, from_ts: datetime, to_ts: datetime
) -> tuple[datetime, datetime]:
    """[from, to) expanded outward to tier-bucket boundaries."""
    lo = _floor(tier, from_ts)
    hi = _floor(tier, to_ts - timedelta(microseconds=1)) + timedelta(
        seconds=_SPAN_S[tier]
    )
    return lo, hi


def backfill_stat_tiers(
    store: TierStore,
    corrected_raw: DataFrame,
    from_ts: datetime,
    to_ts: datetime,
    tiers: tuple[str, ...] = ("1h", "1d", "30d"),
    run_id: str = "backfill",
) -> list[dict]:
    """Recompute ``[from_ts, to_ts)`` of every stat tier from the
    corrected raw table. ``corrected_raw`` must cover at least the
    widest tier expansion of the window (pass the full corrected table;
    only the expansions are scanned — Catalyst pushes the bucket-range
    filter into the scan).

    Returns one dict per tier: window, deleted key count, appended
    rows.
    """
    out = []
    for tier in tiers:
        lo, hi = expanded_window(tier, from_ts, to_ts)
        stats = {"tier": tier, "window": [str(lo), str(hi)]}
        existing = store.read(tier)
        if existing is not None:
            victims = (
                existing.filter(
                    (F.col("bucket_start") >= F.lit(lo))
                    & (F.col("bucket_start") < F.lit(hi))
                )
                .select("bucket_start")
                .distinct()
            )
            # key prefix (bucket_start,) masks EVERY source of the
            # bucket — required: the correction may have removed a
            # source entirely, so deleting only the corrected rows'
            # own keys would resurrect it at read time
            stats["deleted_buckets"] = store.delete(
                tier,
                victims,
                store.next_commit_seq(),
                run_id,
                keys=("bucket_start",),
            )
        else:
            stats["deleted_buckets"] = 0
        window_raw = corrected_raw.filter(
            (F.col("event_ts") >= F.lit(lo)) & (F.col("event_ts") < F.lit(hi))
        )
        recomputed = rollup_sequences(window_raw, tier)
        stats["appended_rows"] = store.append(
            tier, recomputed, store.next_commit_seq(), run_id
        )
        out.append(stats)
    return out
