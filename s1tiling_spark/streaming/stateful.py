"""Custom stateful streaming operator: per-source gap detector via
``applyInPandasWithState``.

Watches the stream of 1h tier rows and, per source, remembers the last
hour seen; whenever a new bucket arrives it emits one row per SKIPPED
hour in between — the streaming counterpart of the batch gap-fill's
grid densification (operators/gapfill.py), and the engine's example of
a custom stateful operator the built-in windowed aggregates can't
express (state = last bucket per key, output = derived gap events).

State is one timestamp per source — bounded regardless of throughput.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("gap_hour", TimestampType()),
        StructField("gap_len_hours", LongType()),
    ]
)

STATE_SCHEMA = StructType([StructField("last_hour_epoch", LongType())])

HOUR = 3600


def _detect_gaps(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (source,) = key
    hours: set[int] = set()
    for pdf in pdfs:
        hours.update(
            int(v) // HOUR * HOUR
            for v in pdf["bucket_start"].astype("int64") // 1_000_000_000
        )
    if not hours:
        return
    last = state.get[0] if state.exists else None
    new_last = max(hours) if last is None else max(max(hours), last)
    seen = sorted(h for h in hours if last is None or h > last)
    gaps: list[tuple[str, int, int]] = []
    prev = last if last is not None else (seen[0] if seen else None)
    for h in seen:
        if prev is not None and h > prev + HOUR:
            run_start = prev + HOUR
            gaps.append((source, run_start, (h - run_start) // HOUR))
        prev = h
    state.update((new_last,))
    if gaps:
        out = pd.DataFrame(gaps, columns=["source", "gap_hour", "gap_len_hours"])
        out["gap_hour"] = pd.to_datetime(out["gap_hour"], unit="s")
        yield out


def gap_detector_stream(tier_stream: DataFrame) -> DataFrame:
    """tier_stream: streaming (bucket_start, source, ...) rows →
    streaming (source, gap_hour, gap_len_hours) gap events."""
    return (
        tier_stream.groupBy("source")
        .applyInPandasWithState(
            _detect_gaps,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------
# Streaming counter increase: the stateful counterpart of
# operators/rollup.counter_increase. State per series is the last
# observed counter value, so a delta spanning a micro-batch boundary
# — including a RESET between batches — is computed exactly.
# Output rows are MERGEABLE PARTIALS per (series, 1h bucket): the same
# bucket may appear once per micro-batch; downstream folds them with a
# grouped sum (the tier-store MERGE discipline). Counter semantics are
# inherently order-dependent: per-series in-order delivery is assumed
# (true of metric scrapes); out-of-order late samples would need
# retraction, which append-mode streaming cannot express.

COUNTER_OUTPUT_SCHEMA = StructType(
    [
        StructField("series", StringType()),
        StructField("bucket_start", TimestampType()),
        StructField("increase", LongType()),
        StructField("n_samples", LongType()),
    ]
)

COUNTER_STATE_SCHEMA = StructType([StructField("last_counter", LongType())])


def _counter_increase(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (series,) = key
    batch = pd.concat(list(pdfs), ignore_index=True)
    if len(batch) == 0:
        return
    # sort on the datetime column itself — unit-agnostic (Arrow may
    # hand ns- or µs-resolution frames depending on version/config)
    batch = batch.sort_values(["ts", "order_id"], kind="mergesort")
    counters = [int(c) for c in batch["counter"]]
    prev_counter = int(state.get[0]) if state.exists else None
    deltas: list[int | None] = []
    for cur in counters:
        if prev_counter is None:
            deltas.append(None)
        elif cur >= prev_counter:
            deltas.append(cur - prev_counter)
        else:
            deltas.append(cur)  # reset: post-restart value
        prev_counter = cur
    batch["_delta"] = pd.array(deltas, dtype="Int64")
    batch["bucket_start"] = batch["ts"].dt.floor("h")
    grouped = batch.groupby("bucket_start", sort=True)["_delta"].agg(
        increase="sum", n_samples="count"
    )
    out = grouped.reset_index()
    # pandas sums an all-NA Int64 slice to 0; the batch operator keeps
    # NULL for a bucket with no usable delta — match it
    out.loc[out["n_samples"] == 0, "increase"] = pd.NA
    out["increase"] = pd.array(out["increase"], dtype="Int64")
    out["n_samples"] = out["n_samples"].astype("int64")
    out.insert(0, "series", series)
    state.update((int(counters[-1]),))
    yield out[["series", "bucket_start", "increase", "n_samples"]]


def counter_increase_stream(counter_stream: DataFrame) -> DataFrame:
    """counter_stream: streaming (series, ts, order_id, counter) rows →
    streaming per-bucket increase PARTIALS (fold with a grouped sum)."""
    return (
        counter_stream.groupBy("series")
        .applyInPandasWithState(
            _counter_increase,
            COUNTER_OUTPUT_SCHEMA,
            COUNTER_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )



# ---------------------------------------------------------------------
# Streaming rolling z-score: the stateful counterpart of
# operators/analytics.rolling_zscore. State per series is the trailing
# window of the last `window_n` integer cents values — bounded O(W)
# regardless of throughput — so a score spanning a micro-batch
# boundary is EXACT: the same integer sums the batch operator's window
# frame sees, then the same double division/sqrt (IEEE-identical), so
# stream output equals the batch operator row-for-row on in-order
# delivery (same caveat as the counter stream: late out-of-order rows
# would need retraction, which append mode cannot express).

ZSCORE_OUTPUT_SCHEMA = StructType(
    [
        StructField("series", StringType()),
        StructField("ts", TimestampType()),
        StructField("order_id", LongType()),
        StructField("y", LongType()),
        StructField("z", DoubleType()),
    ]
)

ZSCORE_STATE_SCHEMA = StructType(
    [StructField("window_vals", ArrayType(LongType()))]
)


def rolling_zscore_stream(
    points: DataFrame, window_n: int = 32, min_periods: int = 12
) -> DataFrame:
    """points: streaming (series, ts, order_id, y) rows → streaming
    per-row z-scores (NULL until ``min_periods`` priors exist or when
    the window variance is zero — exactly the batch operator's
    contract)."""

    def _roll(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import math

        (series,) = key
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) == 0:
            return
        batch = batch.sort_values(["ts", "order_id"], kind="mergesort")
        win = [int(v) for v in state.get[0]] if state.exists else []
        zs: list[float | None] = []
        for y in (int(v) for v in batch["y"]):
            n = len(win)
            if n >= min_periods:
                s1 = sum(win)
                s2 = sum(v * v for v in win)
                rad = n * s2 - s1 * s1
                # exact ints -> the identical IEEE divide/sqrt the
                # batch operator performs JVM-side
                zs.append((y * n - s1) / math.sqrt(rad) if rad > 0 else None)
            else:
                zs.append(None)
            win.append(y)
            if len(win) > window_n:
                win.pop(0)
        out = batch[["ts", "order_id", "y"]].copy()
        # nullable Float64 so None stays NULL (a float64 NaN would
        # diverge from the batch operator's NULL)
        out["z"] = pd.array(zs, dtype="Float64")
        out.insert(0, "series", series)
        state.update((win,))
        yield out

    return points.groupBy("series").applyInPandasWithState(
        _roll,
        ZSCORE_OUTPUT_SCHEMA,
        ZSCORE_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


# ship by value for foreign sessions
import sys as _sys  # noqa: E402

from pyspark import cloudpickle as _cloudpickle  # noqa: E402

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])
