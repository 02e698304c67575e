"""LSH near-dup quality vs the exact all-pairs baseline, and the
stop-shingle guard's no-op property at a sane threshold.

Precision of the LSH path is 1.0 BY CONSTRUCTION (exact verify step) —
asserted anyway; recall is the engineered trade and is measured here
against the O(N²) baseline on the oracle-scale fixture (sf0.01, where
the candidate geometry is identical to production: same planes, same
quantization).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR_ORACLE


def _pairs(df):
    return set(map(tuple, df.select("id_a", "id_b").collect()))


def test_lsh_near_dup_recall_precision(spark):
    from s1tiling_spark.operators.similarity import near_dup_pairs, near_dup_pairs_lsh
    from s1tiling_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", SF_DIR_ORACLE)
    exact = _pairs(near_dup_pairs(emb, tau=0.45))
    lsh = _pairs(near_dup_pairs_lsh(emb, tau=0.45, bands=16, r=2))
    assert exact, "fixture should contain qualifying pairs"
    assert lsh <= exact, "exact verify step must give precision 1.0"
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.9, f"recall {recall:.2f} below floor"


def test_planted_duplicates_full_recall(spark):
    """Identical vectors project identically on every plane, so the
    high-threshold LSH finds every planted duplicate — recall 1.0."""
    from pyspark.sql import functions as F

    from s1tiling_spark.operators.similarity import near_dup_pairs_lsh
    from s1tiling_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", SF_DIR_ORACLE).select("vec_id", "embedding")
    copies = emb.filter(F.pmod("vec_id", F.lit(50)) == 0).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    n_planted = copies.count()
    got = _pairs(near_dup_pairs_lsh(emb.unionByName(copies), tau=0.97, bands=2, r=8))
    assert len(got) == n_planted
    assert all(b - a == 10_000_000 for a, b in got)


def test_blocked_equals_join_formulation(spark):
    """The broadcast-matrix block kernel must reproduce the DataFrame
    theta-join's exact pairs AND cosines bit-for-bit (same quantized
    integers, same int64-product-then-convert float discipline)."""
    from s1tiling_spark.operators.similarity import (
        near_dup_pairs,
        near_dup_pairs_blocked,
    )
    from s1tiling_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", SF_DIR_ORACLE)
    join_rows = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in near_dup_pairs(emb, tau=0.45).collect()
    }
    blocked_rows = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in near_dup_pairs_blocked(emb, tau=0.45).collect()
    }
    assert blocked_rows == join_rows  # keys AND float values exact


def test_jaccard_stop_shingle_guard_noop(spark, sf_dir):
    """At a sane max_df the guard drops nothing on the fixture — pair
    results identical with and without it (VERDICT r1 item 5)."""
    from s1tiling_spark.operators.dedup import jaccard_pairs
    from s1tiling_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    unguarded = set(
        map(tuple, jaccard_pairs(docs, k=3, tau=0.8).select("doc_a", "doc_b").collect())
    )
    guarded = set(
        map(
            tuple,
            jaccard_pairs(docs, k=3, tau=0.8, max_df=100)
            .select("doc_a", "doc_b")
            .collect(),
        )
    )
    assert guarded == unguarded


def test_jaccard_stop_shingle_guard_drops_hot(spark):
    """A shingle shared by every doc is dropped by the guard: the
    boilerplate-only pair disappears, the genuine near-dup stays."""
    from s1tiling_spark.operators.dedup import jaccard_pairs

    boiler = "the quick brown fox jumps"
    rows = [
        (1, f"{boiler} alpha beta gamma delta epsilon"),
        (2, f"{boiler} alpha beta gamma delta zeta"),  # near-dup of 1
        (3, f"{boiler} one two three four five"),
        (4, f"{boiler} six seven eight nine ten"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # without guard: (1,2) plus boilerplate-inflated pairs like (3,4)
    unguarded = set(
        map(tuple, jaccard_pairs(docs, k=3, tau=0.2).select("doc_a", "doc_b").collect())
    )
    guarded = set(
        map(
            tuple,
            jaccard_pairs(docs, k=3, tau=0.2, max_df=3)
            .select("doc_a", "doc_b")
            .collect(),
        )
    )
    assert (3, 4) in unguarded  # boilerplate-only overlap passes tau
    assert guarded == {(1, 2)}  # guard prunes it; genuine near-dup stays
