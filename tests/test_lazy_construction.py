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


def test_library_default_ann_derives_from_footers_no_jobs(spark, sf_dir):
    """The LIBRARY defaults (r=None / n_cells=None) must also be
    plan-only when the input is file-backed: scale parameters come from
    footer_rows_upper_bound(df.inputFiles()) — previously only the
    GATED queries got the footer path (VERDICT r4 'minor' watch item:
    ann_lsh_topk(r=None) ran one count() job at plan time)."""
    from s1tiling_spark.operators.similarity import ann_lsh_topk, ivf_topk
    from s1tiling_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    sc = spark.sparkContext
    group = "construct-library-default-ann"
    sc.setJobGroup(group, "plan-only construction, default params")
    try:
        ann_lsh_topk(emb).schema
        ivf_topk(emb).schema
    finally:
        sc.setJobGroup("default", "")
    assert sc.statusTracker().getJobIdsForGroup(group) == [], (
        "default-parameter ANN construction launched Spark jobs"
    )


def test_footer_bound_equals_count_on_plain_scan_and_none_off_files(spark, sf_dir):
    from s1tiling_spark.sources.tables import footer_rows_upper_bound, load_table

    emb = load_table(spark, "embeddings", sf_dir)
    assert footer_rows_upper_bound(emb) == emb.count()
    # filters only shrink the true count: still a valid upper bound
    filtered = emb.limit(3)
    assert footer_rows_upper_bound(filtered) >= filtered.count()
    # non-file-backed plans report None (callers fall back to count())
    local = spark.range(5)
    assert footer_rows_upper_bound(local) is None


def test_default_r_matches_explicit_footer_r(spark, sf_dir):
    """Result parity: the default path must plan the SAME r the gated
    footer path pins, so both produce identical top-k."""
    from s1tiling_spark.operators.cache import release_cached
    from s1tiling_spark.operators.similarity import ann_lsh_topk, derive_r
    from s1tiling_spark.sources.tables import load_table, parquet_row_count

    emb = load_table(spark, "embeddings", sf_dir)
    r = derive_r(parquet_row_count("embeddings", sf_dir))
    a = sorted(map(tuple, ann_lsh_topk(emb, k=3).collect()))
    release_cached()
    b = sorted(map(tuple, ann_lsh_topk(emb, k=3, r=r).collect()))
    release_cached()
    assert a == b
