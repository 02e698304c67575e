"""Scale-parameterized ANN quality: candidate-fraction and recall of
the derived-r multiprobe LSH on a planted 10^5-vector corpus, and
IVF codebook quality (hash-stratified √N sampling, optional k-means
refinement) vs the degenerate first-N codebook on planted clusters.

These are the measurements VERDICT r2 asked for: the old fixed 4×4-bit
banding kept ≈23% of the corpus as candidates per query; the derived
keys must keep a few percent at 10^5 while holding recall ≥ 0.9.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from s1tiling_spark.operators.similarity import (
    _prepared,
    ann_lsh_candidates,
    ann_lsh_topk,
    cosine_topk,
    derive_r,
    ivf_codebook,
    ivf_topk,
    kmeans_refine,
    release_cached,
)


def _hash01(col, salt: str):
    """Deterministic pseudo-uniform in [-1, 1] from (id, salt)."""
    h = F.conv(
        F.substring(F.md5(F.concat(col.cast("string"), F.lit(salt))), 1, 15), 16, 10
    ).cast("long")
    return (F.pmod(h, F.lit(2001)) - 1000) / 1000.0


def _synth_emb(spark, n: int, dim: int = 16):
    df = spark.range(n)
    comps = [_hash01(F.col("id"), f":d{i}") for i in range(dim)]
    return df.select(
        F.col("id").alias("vec_id"),
        F.array(*comps).cast("array<float>").alias("embedding"),
    )


def test_derive_r_values():
    assert derive_r(500) == 5
    assert derive_r(100_000) == 13
    assert derive_r(10**9) == 24  # capped
    assert derive_r(10) == 4  # floored
    # key space tracks N: expected bucket occupancy ≈ target
    for n in (10_000, 1_000_000):
        r = derive_r(n)
        assert n / (1 << r) <= 16 * 1.01


@pytest.fixture(scope="module")
def planted_corpus(spark):
    """100k base vectors + 5 high-cosine planted neighbors for each of
    the 10 query ids (vec_id % 10000 == 0)."""
    dim = 16
    base = _synth_emb(spark, 100_000, dim)
    queries = base.filter(F.pmod("vec_id", F.lit(10_000)) == 0)
    planted = None
    for j in range(1, 6):
        copy = queries.select(
            (F.col("vec_id") + 1_000_000 + j).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: (x + F.when(i == 0, F.lit(0.002 * j)).otherwise(0.0)).cast(
                    "float"
                ),
            ).alias("embedding"),
        )
        planted = copy if planted is None else planted.unionByName(copy)
    return base.unionByName(planted).persist()


def test_lsh_candidate_fraction_and_recall_at_1e5(spark, planted_corpus):
    emb = planted_corpus
    n = emb.count()
    n_queries = 10
    r = derive_r(n)
    assert r == 13

    prep = _prepared(emb).persist()
    cand = ann_lsh_candidates(prep, query_mod=10_000, bands=4, r=r, multiprobe=1)
    frac = cand.count() / (n_queries * n)
    # the old fixed 4x4 banding kept ~23% — derived keys must prune to
    # a few percent of the corpus per query
    assert frac < 0.05, f"candidate fraction {frac:.3%} too high"

    ann = ann_lsh_topk(emb, k=5, query_mod=10_000, bands=4, r=None, multiprobe=1)
    brute = cosine_topk(emb, k=5, query_mod=10_000)
    got = set(map(tuple, ann.select("q_id", "vec_id").collect()))
    want = set(map(tuple, brute.select("q_id", "vec_id").collect()))
    assert len(want) == n_queries * 5
    recall = len(got & want) / len(want)
    assert recall >= 0.9, f"recall {recall:.2f} below floor (candidates {frac:.3%})"
    prep.unpersist()
    release_cached()


@pytest.fixture(scope="module")
def clustered_corpus(spark):
    """20 planted clusters × 100 members (dim 16): member = cluster
    center + ±5% per-component noise; ids are CLUSTER-SORTED so the
    degenerate first-N codebook lands entirely inside cluster 0. One
    NOISY PROBE per cluster (±20% noise, ids 10000+100c ≡ 0 mod 100)
    joins the query set: with a representative codebook the probe still
    lands on its own cluster's centroid (O(1) similarity gap); with the
    degenerate all-in-cluster-0 codebook every cell decision rides
    ε-scale gaps, so noisy probes scatter away from their cluster-mates
    — the codebook-quality failure the test must expose."""
    dim = 16

    def _members():
        df = spark.range(2000)
        cluster = (F.col("id") / 100).cast("long")
        comps = [
            (
                _hash01(cluster, f":c{i}") + 0.05 * _hash01(F.col("id"), f":n{i}")
            ).cast("float")
            for i in range(dim)
        ]
        return df.select(
            F.col("id").alias("vec_id"), F.array(*comps).alias("embedding")
        )

    def _probes():
        df = spark.range(20)
        cluster = F.col("id")
        comps = [
            (
                _hash01(cluster, f":c{i}") + 0.2 * _hash01(F.col("id"), f":p{i}")
            ).cast("float")
            for i in range(dim)
        ]
        return df.select(
            (F.col("id") * 100 + 10_000).alias("vec_id"),
            F.array(*comps).alias("embedding"),
        )

    return _members().unionByName(_probes()).persist()


def _recall(ann_df, brute_df) -> float:
    got = set(map(tuple, ann_df.select("q_id", "vec_id").collect()))
    want = set(map(tuple, brute_df.select("q_id", "vec_id").collect()))
    assert want
    return len(got & want) / len(want)


def test_ivf_codebook_beats_first_n_on_clusters(spark, clustered_corpus):
    emb = clustered_corpus
    brute = cosine_topk(emb, k=5, query_mod=100)

    # production codebook: hash-stratified rank sample, n_cells=isqrt(N)
    good = ivf_topk(emb, k=5, query_mod=100, n_cells=None, nprobe=2)
    recall_good = _recall(good, brute)

    # degenerate round-2-style codebook: the first n_cells ids — all
    # inside cluster 0 on this fixture
    prep = _prepared(emb)
    w = Window.orderBy("vec_id")
    first_n = (
        prep.orderBy("vec_id")
        .limit(44)
        .withColumn("cid", F.row_number().over(w))
        .select("cid", F.col("qv").alias("cqv"), F.col("nrm").alias("cnrm"))
    )
    degen = ivf_topk(emb, k=5, query_mod=100, nprobe=2, cents=first_n)
    recall_degen = _recall(degen, brute)

    assert recall_good >= 0.9, f"stratified-codebook recall {recall_good:.2f}"
    assert recall_good > recall_degen, (
        f"stratified {recall_good:.2f} must beat first-N {recall_degen:.2f}"
    )
    release_cached()


def test_ivf_kmeans_refined_codebook(spark, clustered_corpus):
    """Deterministic Lloyd refinement keeps recall ≥ 0.9 on planted
    clusters and is reproducible (two runs → identical top-k)."""
    emb = clustered_corpus
    brute = cosine_topk(emb, k=5, query_mod=100)
    a = ivf_topk(emb, k=5, query_mod=100, n_cells=None, nprobe=2, refine_iters=2)
    recall = _recall(a, brute)
    assert recall >= 0.9, f"k-means-refined recall {recall:.2f}"
    b = ivf_topk(emb, k=5, query_mod=100, n_cells=None, nprobe=2, refine_iters=2)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    release_cached()


def test_kmeans_refine_deterministic_centroids(spark, clustered_corpus):
    prep = _prepared(clustered_corpus)
    cents0 = ivf_codebook(prep, 10)
    r1 = kmeans_refine(prep, cents0, iters=2).orderBy("cid").collect()
    r2 = kmeans_refine(prep.repartition(7), cents0, iters=2).orderBy("cid").collect()
    assert [(r["cid"], r["cqv"]) for r in r1] == [(r["cid"], r["cqv"]) for r in r2]
    release_cached()


def test_arrow_banding_matches_column_fold(spark):
    """The numpy-matmul banding kernel must produce bit-identical
    (vec_id, band, key) rows to the column-fold formulation (same
    integer weights, exact int64 dots) — the invariant that keeps the
    DuckDB oracle's mirrored banding valid."""
    from pyspark.sql import functions as F

    from s1tiling_spark.operators.similarity import (
        srp_band_keys,
        srp_banded_arrow,
    )

    emb = _synth_emb(spark, 500, 16)
    prep = _prepared(emb)
    fold = (
        prep.select("vec_id", F.explode(srp_band_keys(F.col("qv"), 4, 7)).alias("bk"))
        .select("vec_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    )
    arrow = srp_banded_arrow(prep, 4, 7)
    a = sorted(map(tuple, fold.collect()))
    b = sorted(map(tuple, arrow.collect()))
    assert a == b


def test_connected_components_chain_and_cliques(spark):
    """Hash-min propagation must close transitive chains (a-b, b-c, c-d
    → one component) and keep disjoint cliques apart; keeper = min id."""
    from s1tiling_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 10), (20, 21)],
        "doc_a long, doc_b long",
    )
    got = {
        r["doc_id"]: (r["component"], r["keep"])
        for r in connected_components(pairs).collect()
    }
    assert got == {
        1: (1, True), 2: (1, False), 3: (1, False), 4: (1, False),
        10: (10, True), 11: (10, False),
        20: (20, True), 21: (20, False),
    }
