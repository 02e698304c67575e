"""Similarity search over the embedding column: brute-force cosine
top-k (baseline) + SRP-LSH bucketed ANN (the scale path).

Determinism discipline: embeddings are float32; naive float dot
products fold in engine-specific order. Instead vectors are quantized
to integers (``round(x*10000)``) and similarity uses EXACT integer dot
products; cosine ordering is derived as ``dot / sqrt(na*nb)`` from
those exact integers, so Spark and the DuckDB oracle agree bit-for-bit
and results are reproducible at any parallelism (SURVEY §7 "What's
hard" #1 applied to ANN).

Scale shape:
- brute force: queries × corpus — fine when queries are few (the
  broadcast side) even over a huge corpus; O(Q·N) work distributed by
  corpus partitions, no shuffle beyond the final per-query top-k
  (partial top-k per partition via window on shuffled (q_id) keys).
- SRP-LSH: 16 deterministic hyperplane signs → one bucket id per
  vector; candidates = bucket collisions. At 10^12 rows the bucket
  join replaces the Q×N product entirely; recall tunes with plane
  count/band structure like MinHash bands.

Everything is JVM column algebra (transform/zip_with/aggregate) — no
Python UDF in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

QUANT = 10_000
N_PLANES = 16


def quantized(vec: Column) -> Column:
    # cast float32 → double BEFORE multiplying so both engines round the
    # identical double (float32 arithmetic would be engine-dependent)
    return F.transform(vec, lambda x: F.round(x.cast("double") * QUANT).cast("long"))


def int_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _prepared(emb: DataFrame) -> DataFrame:
    q = quantized(F.col("embedding"))
    return emb.select(
        "vec_id",
        q.alias("qv"),
    ).withColumn("nrm", int_dot(F.col("qv"), F.col("qv")))


def cosine_topk(
    emb: DataFrame, k: int = 5, query_mod: int = 50
) -> DataFrame:
    """Brute-force top-k: for each query vector (vec_id % query_mod == 0)
    the k nearest others by cosine (tie → smaller vec_id)."""
    prep = _prepared(emb)
    qs = prep.filter(F.pmod(F.col("vec_id"), F.lit(query_mod)) == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("qv").alias("q_qv"),
        F.col("nrm").alias("q_nrm"),
    )
    pairs = prep.crossJoin(F.broadcast(qs)).filter(F.col("vec_id") != F.col("q_id"))
    scored = pairs.select(
        "q_id",
        "vec_id",
        (
            int_dot(F.col("q_qv"), F.col("qv"))
            / F.sqrt((F.col("q_nrm") * F.col("nrm")).cast("double"))
        ).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "vec_id", "cos", "rk")
    )


def near_dup_pairs(emb: DataFrame, tau: float = 0.97) -> DataFrame:
    """All vector pairs with cosine >= tau. Threshold test done as
    dot >= 0 AND dot^2 >= tau^2 * na * nb on exact integers (cast to
    double only for the final compare — same IEEE values both engines)."""
    prep = _prepared(emb)
    a = prep.alias("a")
    b = prep.alias("b")
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("id_a"),
        F.col("b.vec_id").alias("id_b"),
        int_dot(F.col("a.qv"), F.col("b.qv")).alias("dot"),
        F.col("a.nrm").alias("na"),
        F.col("b.nrm").alias("nb"),
    )
    t2 = tau * tau
    return (
        pairs.filter(
            (F.col("dot") > 0)
            & (
                F.col("dot").cast("double") * F.col("dot").cast("double")
                >= F.lit(t2) * (F.col("na") * F.col("nb")).cast("double")
            )
        ).select(
            "id_a",
            "id_b",
            (
                F.col("dot") / F.sqrt((F.col("na") * F.col("nb")).cast("double"))
            ).alias("cos"),
        )
    )


def srp_weight(d: Column, j: int) -> Column:
    """Deterministic pseudo-random hyperplane weight in [-3, 3]:
    w(d, j) = ((d*31 + j*17) % 7) - 3, with d the 0-based dimension."""
    return (d * 31 + F.lit(j * 17)) % 7 - 3


def srp_bucket(qv: Column) -> Column:
    """16-bit signed-random-projection bucket id."""
    bucket = F.lit(0)
    for j in range(N_PLANES):
        proj = F.aggregate(
            F.transform(qv, lambda x, i: x * srp_weight(i, j)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket.cast("int")


def ann_lsh_topk(emb: DataFrame, k: int = 5, query_mod: int = 50) -> DataFrame:
    """ANN: candidates share the SRP bucket; exact re-rank within the
    bucket (same integer-cosine ordering as brute force)."""
    prep = _prepared(emb).withColumn("bucket", srp_bucket(F.col("qv")))
    qs = prep.filter(F.pmod(F.col("vec_id"), F.lit(query_mod)) == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("qv").alias("q_qv"),
        F.col("nrm").alias("q_nrm"),
        F.col("bucket").alias("q_bucket"),
    )
    cand = prep.join(
        F.broadcast(qs),
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("q_id")),
    )
    scored = cand.select(
        "q_id",
        "vec_id",
        (
            int_dot(F.col("q_qv"), F.col("qv"))
            / F.sqrt((F.col("q_nrm") * F.col("nrm")).cast("double"))
        ).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "vec_id", "cos", "rk")
    )
