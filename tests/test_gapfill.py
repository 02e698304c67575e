"""Gap-fill unit semantics on a hand-built series (edge cases the
oracle queries don't isolate: leading/trailing gaps, all-null keys)."""

from __future__ import annotations

import pandas as pd
import pytest

from s1tiling_spark.operators.gapfill import densify, linear_interpolate, locf


@pytest.fixture()
def tier(spark):
    rows = [
        # source A: hours 0,1,4,5 present (gap 2-3), value = cnt
        ("A", "2024-01-01 00:00:00", 10),
        ("A", "2024-01-01 01:00:00", 20),
        ("A", "2024-01-01 04:00:00", 50),
        ("A", "2024-01-01 05:00:00", 60),
        # source B: single bucket
        ("B", "2024-01-01 03:00:00", 7),
    ]
    df = spark.createDataFrame(rows, "source string, bucket_start string, cnt long")
    return df.selectExpr("source", "CAST(bucket_start AS TIMESTAMP) bucket_start", "cnt")


def test_densify_grid(spark, tier):
    dense = densify(tier, "1h").toPandas()
    a = dense[dense.source == "A"].sort_values("bucket_start")
    assert len(a) == 6  # hours 0..5
    assert a["gap_filled"].tolist() == [False, False, True, True, False, False]
    b = dense[dense.source == "B"]
    assert len(b) == 1 and not b["gap_filled"].iloc[0]


def test_locf_values(spark, tier):
    out = locf(densify(tier, "1h"), ["cnt"]).toPandas()
    a = out[out.source == "A"].sort_values("bucket_start")
    assert a["cnt"].tolist() == [10, 20, 20, 20, 50, 60]


def test_linear_values(spark, tier):
    dense = densify(tier, "1h").selectExpr(
        "source", "bucket_start", "CAST(cnt AS DOUBLE) AS v", "gap_filled"
    )
    out = linear_interpolate(dense, "v").toPandas()
    a = out[out.source == "A"].sort_values("bucket_start")
    # gap hours 2,3 between anchors (1h,20) and (4h,50): slope 10/h
    assert a["v"].tolist() == [10.0, 20.0, 30.0, 40.0, 50.0, 60.0]


def test_linear_single_anchor(spark, tier):
    dense = densify(tier, "1h").selectExpr(
        "source", "bucket_start", "CAST(cnt AS DOUBLE) AS v", "gap_filled"
    )
    out = linear_interpolate(dense, "v").toPandas()
    b = out[out.source == "B"]
    assert b["v"].tolist() == [7.0]
