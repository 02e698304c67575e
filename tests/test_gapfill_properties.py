"""Property-based gap-fill invariants (hypothesis): for arbitrary
sparse hourly series the grid is complete, LOCF is idempotent and
anchor-preserving, and linear interpolation stays inside the anchor
envelope and touches every anchor exactly.

These are the invariants the oracle queries can't isolate (they test
one fixed dataset); hypothesis walks the edge space: single-point
series, leading/trailing gaps, adjacent anchors, long gaps.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from s1tiling_spark.operators.gapfill import densify, linear_interpolate, locf

BASE = datetime(2024, 1, 1)


@st.composite
def sparse_series(draw):
    """1-2 sources, each with 1..8 present hours out of a 0..23 grid."""
    sources = draw(st.lists(st.sampled_from(["A", "B"]), min_size=1, max_size=2, unique=True))
    rows = []
    for s in sources:
        hours = draw(st.lists(st.integers(0, 23), min_size=1, max_size=8, unique=True))
        for h in sorted(hours):
            rows.append((s, BASE + timedelta(hours=h), draw(st.integers(1, 1000))))
    return rows


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=sparse_series())
def test_gapfill_invariants(spark, rows):
    tier = spark.createDataFrame(rows, "source string, bucket_start timestamp, cnt long")
    dense = densify(tier, "1h")

    pdf = dense.toPandas()
    by_src = {s: g.sort_values("bucket_start") for s, g in pdf.groupby("source")}
    anchors = {(s, t): c for s, t, c in rows}

    for s, g in by_src.items():
        # grid completeness: contiguous hours from min to max anchor
        ts = list(g["bucket_start"])
        assert all(
            (b - a) == timedelta(hours=1) for a, b in zip(ts, ts[1:])
        ), "densify grid has holes"
        src_anchor_ts = {t for (s2, t) in anchors if s2 == s}
        assert min(ts) == min(src_anchor_ts) and max(ts) == max(src_anchor_ts)

    # LOCF: anchors preserved, no nulls after the first anchor, idempotent
    import pandas as pd

    filled = locf(dense, ["cnt"])
    f1 = filled.toPandas()
    for _, r in f1.iterrows():
        key = (r["source"], r["bucket_start"].to_pydatetime())
        if key in anchors:
            assert r["cnt"] == anchors[key]
        else:
            assert pd.notna(r["cnt"])
    f2 = locf(filled, ["cnt"]).toPandas()
    assert sorted(map(tuple, f1[["source", "bucket_start", "cnt"]].values.tolist())) == sorted(
        map(tuple, f2[["source", "bucket_start", "cnt"]].values.tolist())
    )

    # linear: anchors exact; gap values inside [min,max] of the two
    # nearest anchors (monotone segments)
    dd = dense.selectExpr("source", "bucket_start", "CAST(cnt AS DOUBLE) AS v", "gap_filled")
    li = linear_interpolate(dd, "v").toPandas()
    for s, g in li.groupby("source"):
        g = g.sort_values("bucket_start")
        src_anchors = sorted(
            (t, c) for (s2, t), c in anchors.items() if s2 == s
        )
        for _, r in g.iterrows():
            t = r["bucket_start"].to_pydatetime()
            if (s, t) in anchors:
                assert r["v"] == pytest.approx(anchors[(s, t)], abs=1e-9)
            else:
                prev = max((a for a in src_anchors if a[0] < t), default=None)
                nxt = min((a for a in src_anchors if a[0] > t), default=None)
                assert prev is not None and nxt is not None
                lo, hi = sorted((prev[1], nxt[1]))
                assert lo - 1e-9 <= r["v"] <= hi + 1e-9
