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


# ship by value for foreign sessions
import sys as _sys  # noqa: E402

from pyspark import cloudpickle as _cloudpickle  # noqa: E402

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])
