"""Property-based check of counter_increase against a pure-Python
reference: for ANY per-series sequence of (minute-offset, counter)
samples — wraps, plateaus, repeated resets, single samples — the Spark
lag-window operator must produce exactly the reference's per-bucket
increase/n_samples (the 1h→1d cascade losslessness is covered in
test_rollup.py::test_counter_increase_cascades)."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

BASE = datetime(2024, 1, 1)


def _reference(rows):
    """rows: list of (series, minute_offset, counter) — in-order per
    series by (minute, idx). Returns {(series, bucket_dt): (inc, n)}."""
    by_series: dict[str, list[tuple[int, int, int]]] = {}
    for idx, (s, m, c) in enumerate(rows):
        by_series.setdefault(s, []).append((m, idx, c))
    out: dict[tuple[str, datetime], list] = {}
    for s, samples in by_series.items():
        samples.sort()
        prev = None
        for m, _idx, c in samples:
            bucket = BASE + timedelta(hours=(m // 60))
            slot = out.setdefault((s, bucket), [None, 0])
            if prev is not None:
                delta = c - prev if c >= prev else c
                slot[0] = (slot[0] or 0) + delta
                slot[1] += 1
            prev = c
    return {k: (v[0], v[1]) for k, v in out.items()}


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=60 * 72),  # 3 days
            st.integers(min_value=0, max_value=1000),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_counter_increase_matches_reference(spark, rows):
    from s1tiling_spark.operators.rollup import counter_increase

    df = spark.createDataFrame(
        [
            (s, BASE + timedelta(minutes=m), idx, c)
            for idx, (s, m, c) in enumerate(rows)
        ],
        "k string, ts timestamp, event_id long, counter long",
    )
    got = {
        (r["k"], r["bucket_start"]): (r["increase"], r["n_samples"])
        for r in counter_increase(
            df, keys=["k"], ts_col="ts", counter_col="counter", tier="1h",
            order_cols=("event_id",),
        ).collect()
    }
    want = _reference(rows)
    assert got == want
