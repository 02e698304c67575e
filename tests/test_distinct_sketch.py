"""Mergeable distinct-count sketch (HLL-style max-rank registers):
merge == direct, idempotent re-merge, and estimate error bound vs
exact countDistinct — the same proof shape as test_cms.py /
test_quantile_sketch.py for the other members of the sketch family.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s1tiling_spark.operators.rollup import bucket_col
from s1tiling_spark.operators.sketch import (
    HLL_M,
    distinct_estimate,
    distinct_registers_long,
    distinct_registers_merge,
)
from s1tiling_spark.sources.synth import synth_sequences
from tests.helpers import assert_frames_match


@pytest.fixture(scope="module")
def seq(spark):
    return synth_sequences(spark, 4000).cache()


def test_merge_equals_direct(spark, seq):
    """Registers built at 1h then merged to 1d == registers built
    directly at 1d (max is associative — the mergeable property)."""
    day = F.date_trunc("day", F.col("bucket_start"))
    merged = distinct_registers_merge(
        distinct_registers_long(seq, bucket_col(F.col("event_ts"), "1h"), F.col("doc_id")),
        day,
    )
    direct = distinct_registers_long(
        seq, bucket_col(F.col("event_ts"), "1d"), F.col("doc_id")
    )
    assert_frames_match(merged.toPandas(), direct.toPandas())


def test_remerge_idempotent(spark, seq):
    """Merging a tier into itself changes nothing (max is idempotent) —
    the property that makes late-data re-MERGE safe, which exact
    countDistinct lacks."""
    day = F.date_trunc("day", F.col("bucket_start"))
    d1 = distinct_registers_long(
        seq, bucket_col(F.col("event_ts"), "1d"), F.col("doc_id")
    )
    again = distinct_registers_merge(d1.unionByName(d1), day)
    assert_frames_match(again.toPandas(), d1.toPandas())


def test_estimate_error_bound_vs_exact(spark, seq):
    """Per-(day, source) estimate within the HLL error regime of the
    exact distinct count: every group within 3·(1.04/√m), the
    row-weighted mean relative error within 1.5·(1.04/√m)."""
    day_bucket = bucket_col(F.col("event_ts"), "1d")
    regs = distinct_registers_long(seq, day_bucket, F.col("doc_id"))
    est = distinct_estimate(regs).toPandas()
    exact = (
        seq.groupBy(day_bucket.alias("bucket_start"), "source")
        .agg(F.countDistinct("doc_id").alias("exact"))
        .toPandas()
    )
    j = est.merge(exact, on=["bucket_start", "source"])
    assert len(j) == len(exact)
    rel = ((j["est_distinct"] - j["exact"]).abs() / j["exact"]).to_numpy()
    sigma = 1.04 / (HLL_M ** 0.5)
    assert (rel <= 3 * sigma).all(), rel.max()
    weighted = (rel * j["exact"]).sum() / j["exact"].sum()
    assert weighted <= 1.5 * sigma, weighted


def test_estimate_large_cardinality(spark):
    """Planted 10^5-distinct single group: the raw-regime estimate
    (no linear-counting path) lands within 2σ of truth."""
    n = 100_000
    df = (
        spark.range(n)
        .select(
            F.lit("2024-01-01 00:00:00").cast("timestamp").alias("bucket_start"),
            F.lit("s").alias("source"),
            F.concat(F.lit("user-"), F.col("id")).alias("uid"),
        )
    )
    regs = distinct_registers_long(df, F.col("bucket_start"), F.col("uid"))
    est = distinct_estimate(regs).collect()[0]["est_distinct"]
    assert abs(est - n) / n <= 2 * 1.04 / (HLL_M ** 0.5), est


def _py_reg_rho(h: int, m: int = HLL_M) -> tuple[int, int]:
    """Pure-Python reference for the register split (exact integers)."""
    log2m = m.bit_length() - 1
    qbits = 60 - log2m
    q = h >> log2m
    rho = (qbits + 1) if q == 0 else (qbits + 1 - q.bit_length())
    return h % m, rho


def test_hash_split_exact_at_rounding_boundaries(spark, duck):
    """The register split must be exact bit arithmetic in BOTH engines:
    adversarial hashes at double-rounding boundaries (h >= 2^53, where
    floor(double(h)/m) disagrees with h >> log2m — the defect a review
    caught) must match the pure-Python integer reference."""
    cases = [
        0, 1, 63, 64, 65,
        (1 << 53) - 1, 1 << 53, (1 << 53) + 1,
        (1 << 54) - 1, 1 << 54, (1 << 54) + 1,
        (1 << 59) + 127, (1 << 60) - 1, (1 << 60) - 64, (1 << 60) - 65,
    ]
    want = [_py_reg_rho(h) for h in cases]

    from s1tiling_spark.operators.sketch import hll_split_hash

    df = spark.createDataFrame([(h,) for h in cases], "h long")
    reg, rho = hll_split_hash(F.col("h"))
    got = [
        (r["reg"], r["rho"])
        for r in df.select(reg.alias("reg"), rho.alias("rho")).collect()
    ]
    assert got == want, list(zip(cases, got, want))

    # DuckDB mirror of hll_sql_parts' split on the same literals
    rows = duck.sql(
        "SELECT CAST(h % 64 AS INT) AS reg, "
        "CAST(CASE WHEN (h >> 6) = 0 THEN 55 "
        "ELSE 55 - length(bin(h >> 6)) END AS INT) AS rho "
        "FROM (SELECT unnest(["
        + ",".join(f"{h}::BIGINT" for h in cases)
        + "]) AS h)"
    ).fetchall()
    assert [tuple(r) for r in rows] == want
