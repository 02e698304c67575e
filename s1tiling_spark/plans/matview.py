"""Incremental materialized-view maintenance over the tier store's
CDC changelog.

The reference re-runs a product only when its inputs changed
(`/root/reference/s1tiling/libs/otbpipeline.py:749-756` prunes tasks
whose outputs exist; `meta.py:95-103` is the freshness test). This
module generalizes that to ANALYTICAL products: a downstream aggregate
tier (the "view") is kept in sync with its base tier by applying only
the delta since the last refresh — never a full recompute.

The math is classic incremental view maintenance for distributive
aggregates: ``changes(base, split_updates=True)`` emits
insert/update_after rows (post-images) and delete/update_before rows
(pre-images); summing post-images with sign +1 and pre-images with
sign -1, re-grouped to the view's grain, IS the view delta. The view
itself is stored as an ADDITIVE tier (:meth:`TierStore.read_summed`
folds the partials; ``compact(mode="sum")`` folds them physically), so
"applying" the delta is a plain append.

Cost shape at 10^12 rows: ``changes`` prunes both as-of states to the
touched key set, so a refresh costs O(keys touched since last refresh)
plus one append — the continuous-aggregate model (TimescaleDB's
refresh policy, Materialize's delta dataflow), not a view rebuild.

Crash safety: the delta append carries an idempotency key
``mv~<from>~<to>`` and the refresh cursor is advanced only after the
append. A crash in between is repaired on the next refresh by reading
the committed marker (its name carries the range) and advancing the
cursor WITHOUT recomputing — the delta is applied exactly once. The
residual window is append's own marker-after-data-move window,
documented there (Iceberg closes it by committing the marker inside
the snapshot transaction).
"""

from __future__ import annotations

import os
from functools import reduce
from operator import or_

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .store import TierStore, atomic_json_write


class AdditiveMatView:
    """An incrementally-maintained additive aggregate over a base tier.

    The view definition lives in code (like any Spark logical plan):
    ``group_cols`` maps each view key column to the expression that
    derives it from a base row (e.g. re-truncating ``bucket_start`` to
    the coarser grain), ``sum_cols`` are the additive measures summed
    from the base's columns. Measures must be non-null — the same
    contract :meth:`TierStore.read_summed` already imposes on additive
    tiers (``F.sum`` would silently skip NULLs and the delta algebra
    would not cancel).

    ``group_cols`` must include ``bucket_start`` — the store partitions
    every tier by its calendar date, which is also what makes refresh
    appends prune on read.

    The BASE tier must follow the newest-wins merge discipline
    (:meth:`TierStore.read`): the changelog diffs newest-wins states.
    An ADDITIVE base tier (``read_summed`` partials) has no changelog
    — its partials already ARE deltas; aggregate them directly instead
    of stacking a matview on top.
    """

    def __init__(
        self,
        store: TierStore,
        name: str,
        base_tier: str,
        base_keys: tuple[str, ...],
        group_cols: dict[str, Column],
        sum_cols: tuple[str, ...],
    ) -> None:
        if "bucket_start" not in group_cols:
            raise ValueError(
                "group_cols must include 'bucket_start' (tier tables are "
                "partitioned by its calendar date)"
            )
        self.store = store
        self.name = name
        self.base_tier = base_tier
        self.base_keys = tuple(base_keys)
        self.group_cols = dict(group_cols)
        self.sum_cols = tuple(sum_cols)
        self.view_tier = f"mv_{name}"
        self.view_keys = tuple(group_cols)

    # ---------- cursor ----------
    def _meta_path(self) -> str:
        return os.path.join(self.store.base_dir, f"_matview_{self.name}.json")

    def last_refreshed_seq(self) -> int:
        """Base commit_seq the view is current as of (0 = never)."""
        path = self._meta_path()
        if not os.path.exists(path):
            return 0
        import json

        with open(path) as f:
            return int(json.load(f)["base_seq"])

    def _advance_cursor(self, base_seq: int) -> None:
        atomic_json_write(self._meta_path(), {"base_seq": int(base_seq)})

    def _repair_crashed_refresh(self, base_seq: int) -> int:
        """A crash between the delta append and the cursor write leaves
        a committed ``mv~<from>~<to>`` marker with ``from == cursor``:
        that delta IS applied, so complete the refresh by advancing the
        cursor to the marker's ``to`` — recomputing it would
        double-count the range (append's idempotency key blocks the
        exact replay, but a RETRY computes a wider range ``(from,
        to']`` that overlaps the applied one)."""
        runs_dir = os.path.join(
            self.store.base_dir, "_committed_runs", self.view_tier
        )
        if not os.path.isdir(runs_dir):
            return base_seq
        applied_to = base_seq
        prefix = f"mv~{base_seq}~"
        for fn in os.listdir(runs_dir):
            if fn.startswith(prefix):
                applied_to = max(applied_to, int(fn.split("~")[2]))
        if applied_to != base_seq:
            self._advance_cursor(applied_to)
        return applied_to

    # ---------- delta algebra ----------
    def _signed_aggregate(self, rows: DataFrame, sign: Column) -> DataFrame:
        """Re-group ``rows`` (base-shaped) to the view grain, summing
        each measure multiplied by ``sign``. One shuffle on the view
        keys; map-side partial aggregation applies (plain sum).

        ``_mv_n`` is the classic IVM group-cardinality counter: each
        live base row contributes +1, its retraction -1 (an update's
        before/after pair cancels). Without it a group whose base rows
        were ALL deleted would cancel to a zero-valued row instead of
        disappearing — ``read`` serves only groups with ``_mv_n > 0``."""
        projected = rows.select(
            *[expr.alias(k) for k, expr in self.group_cols.items()],
            *[(sign * F.col(c)).alias(c) for c in self.sum_cols],
            sign.alias("_mv_n"),
        )
        return projected.groupBy(*self.view_keys).agg(
            *[F.sum(c).alias(c) for c in self.sum_cols],
            F.sum("_mv_n").alias("_mv_n"),
        )

    def _rebuild_reset(self) -> None:
        """Drop the view's accumulated deltas, markers and cursor so the
        next refresh runs the cursor==0 full load. Crash-safe: any
        partial reset leaves cursor 0 (or a missing tier), both of
        which the full-load path handles; a crash between the data
        rmtree and the meta removal re-enters here on the next refresh
        because the stale cursor still predates the base horizon."""
        import shutil

        shutil.rmtree(self.store.tier_path(self.view_tier), ignore_errors=True)
        shutil.rmtree(
            os.path.join(self.store.base_dir, "_committed_runs", self.view_tier),
            ignore_errors=True,
        )
        if os.path.exists(self._meta_path()):
            os.remove(self._meta_path())

    def refresh(self, run_id: str) -> dict:
        """Bring the view up to the base tier's current state; returns
        ``{"from_seq", "to_seq", "rows"}`` (rows = delta rows appended,
        0 for a no-op refresh).

        If a base-tier compaction expired history below the refresh
        cursor (the changelog from the cursor is gone), the view is
        REBUILT: deltas are dropped and the full aggregate re-runs —
        the lagging-view recovery Iceberg-backed MV engines perform
        when the incremental log is unavailable. Routine maintenance
        must never brick the view."""
        cursor = self._repair_crashed_refresh(self.last_refreshed_seq())
        if cursor > 0 and cursor < self.store.min_as_of(self.base_tier):
            self._rebuild_reset()
            cursor = 0
        to_seq = self.store.last_commit_seq()
        if to_seq == cursor:
            return {"from_seq": cursor, "to_seq": to_seq, "rows": 0}
        if cursor == 0:
            base = self.store.read(
                self.base_tier, as_of_seq=to_seq, keys=self.base_keys
            )
            delta = None if base is None else self._signed_aggregate(base, F.lit(1))
        else:
            ch = self.store.changes(
                self.base_tier,
                from_seq=cursor,
                to_seq=to_seq,
                keys=self.base_keys,
                split_updates=True,
                # scan I/O scales with touched DAYS, not table size:
                # the changelog opens only the partitions the touched
                # keys live in (measured in tools/matview_bench.py)
                prune_partitions="bucket_start" in self.base_keys,
            )
            if ch is None:
                delta = None
            else:
                sign = F.when(
                    F.col("op").isin("insert", "update_after"), F.lit(1)
                ).otherwise(F.lit(-1))
                delta = self._signed_aggregate(ch, sign)
                # all-zero delta groups (e.g. a rewrite of identical
                # values) add nothing — don't append them (_mv_n included:
                # values summing to zero with a cardinality change must
                # still be applied)
                delta = delta.filter(
                    reduce(
                        or_,
                        [F.col(c) != 0 for c in (*self.sum_cols, "_mv_n")],
                    )
                )
        rows = 0
        cursor_target = to_seq
        if delta is not None:
            # Count before committing: an empty delta (a commit range
            # touching only OTHER tiers, or pure rewrites) must not
            # consume a commit_seq — otherwise every refresh would bump
            # the store-global seq and the next refresh could never
            # no-op. The count is O(touched keys) and the persist means
            # the append below reuses it, not a second changelog scan.
            delta = delta.persist()
            try:
                if delta.count() > 0:
                    seq = self.store.next_commit_seq()
                    rows = self.store.append(
                        self.view_tier,
                        delta,
                        seq,
                        run_id,
                        idempotency_key=f"mv~{cursor}~{seq}",
                    )
                    # Advance the cursor OVER our own delta append: the
                    # store is single-writer, so (to_seq, seq] contains
                    # exactly that append (a different tier — invisible
                    # to the base changelog). Leaving the cursor at
                    # to_seq would make every next refresh re-scan a
                    # range that can only ever be empty.
                    cursor_target = seq
            finally:
                delta.unpersist()
        self._advance_cursor(cursor_target)
        return {"from_seq": cursor, "to_seq": cursor_target, "rows": rows}

    # ---------- serving ----------
    def read(self, as_of_seq: int | None = None) -> DataFrame | None:
        """The view's current (or as-of) state: additive fold of the
        accumulated deltas, restricted to groups with live base rows
        (``_mv_n > 0`` — see :meth:`_signed_aggregate`)."""
        df = self.store.read_summed(
            self.view_tier,
            keys=self.view_keys,
            sum_cols=(*self.sum_cols, "_mv_n"),
            as_of_seq=as_of_seq,
        )
        if df is None:
            return None
        return df.filter(F.col("_mv_n") > 0).drop("_mv_n")
