"""Count-min sketch properties on the fixture: never underestimates,
overestimate bounded by collisions, and the 1d→30d merge equals a
direct 30d build (counter linearity — the merge-able-partial property
the tier cascade relies on)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s1tiling_spark.operators.rollup import bucket_col
from s1tiling_spark.operators.sketch import cms_estimate, cms_long, cms_merge
from s1tiling_spark.sources.sequences import sequences_from_documents


@pytest.fixture(scope="module")
def seq(spark, sf_dir):
    return sequences_from_documents(spark, sf_dir).cache()


def test_cms_never_underestimates(spark, seq):
    cms = cms_long(seq, F.date_trunc("day", F.col("event_ts")))
    truth = (
        seq.select(
            F.date_trunc("day", "event_ts").alias("bucket_start"),
            "source",
            F.explode("tokens").alias("token"),
        )
        .groupBy("bucket_start", "source", "token")
        .agg(F.count("*").alias("true_cnt"))
    )
    est = cms_estimate(cms, truth.select("bucket_start", "source", "token"))
    j = truth.join(est, ["bucket_start", "source", "token"]).cache()
    n = j.count()
    assert n == truth.count()
    under = j.filter(F.col("est") < F.col("true_cnt")).count()
    assert under == 0  # the CMS guarantee
    # overestimate stays sane on the fixture (collision-bounded)
    avg_ratio = j.agg(F.avg(F.col("est") / F.col("true_cnt"))).collect()[0][0]
    assert avg_ratio < 5.0
    j.unpersist()


def test_cms_merge_equals_direct(spark, seq):
    """1d cells summed into 30d == sketch built directly at 30d."""
    from tests.helpers import assert_frames_match

    cms_1d = cms_long(seq, F.date_trunc("day", F.col("event_ts")))
    merged = cms_merge(cms_1d, bucket_col(F.col("bucket_start"), "30d")).toPandas()
    direct = cms_long(seq, bucket_col(F.col("event_ts"), "30d")).toPandas()
    assert_frames_match(merged, direct)
