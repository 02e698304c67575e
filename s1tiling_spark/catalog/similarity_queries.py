"""Similarity-search queries + DuckDB oracles (brute-force cosine
top-k, SRP-LSH ANN, embedding near-dup pairs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from s1tiling_spark.operators.similarity import (
    N_PLANES,
    QUANT,
    ann_lsh_topk,
    cosine_topk,
    near_dup_pairs,
)
from s1tiling_spark.registry import register
from s1tiling_spark.sources.tables import load_table

_K = 5
_QUERY_MOD = 50
_TAU_NEAR = 0.45

_PREP = (
    "prep AS (SELECT vec_id, "
    f"list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT)) AS qv "
    "FROM embeddings), "
    "prepn AS (SELECT vec_id, qv, "
    "CAST(list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*qv[i])) AS BIGINT) AS nrm "
    "FROM prep)"
)

_DOT_AB = (
    "CAST(list_sum(list_transform(range(1, len(a.qv)+1), i -> a.qv[i]*b.qv[i])) AS BIGINT)"
)

_BRUTE_ORACLE = f"""
WITH {_PREP},
qs AS (SELECT vec_id AS q_id, qv, nrm FROM prepn WHERE vec_id % {_QUERY_MOD} = 0),
scored AS (
  SELECT a.q_id, b.vec_id,
         {_DOT_AB} / sqrt(CAST(a.nrm * b.nrm AS DOUBLE)) AS cos
  FROM qs a JOIN prepn b ON b.vec_id <> a.q_id
)
SELECT q_id, vec_id, cos, CAST(rk AS INT) AS rk FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rk
  FROM scored) WHERE rk <= {_K}
"""


@register("ann_brute_topk", oracle=_BRUTE_ORACLE)
def ann_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_topk(load_table(spark, "embeddings", sf_dir), k=_K, query_mod=_QUERY_MOD)


def _bucket_sql(alias: str) -> str:
    parts = []
    for j in range(N_PLANES):
        proj = (
            f"list_sum(list_transform({alias}, (x, i) -> x * (((i-1)*31 + {j*17}) % 7 - 3)))"
        )
        parts.append(f"(CASE WHEN {proj} > 0 THEN {1 << j} ELSE 0 END)")
    return "CAST(" + " + ".join(parts) + " AS INT)"


_LSH_ORACLE = f"""
WITH {_PREP},
bucketed AS (SELECT vec_id, qv, nrm, {_bucket_sql('qv')} AS bucket FROM prepn),
qs AS (SELECT vec_id AS q_id, qv, nrm, bucket FROM bucketed
       WHERE vec_id % {_QUERY_MOD} = 0),
scored AS (
  SELECT a.q_id, b.vec_id,
         {_DOT_AB} / sqrt(CAST(a.nrm * b.nrm AS DOUBLE)) AS cos
  FROM qs a JOIN bucketed b ON b.bucket = a.bucket AND b.vec_id <> a.q_id
)
SELECT q_id, vec_id, cos, CAST(rk AS INT) AS rk FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rk
  FROM scored) WHERE rk <= {_K}
"""


@register("ann_lsh_topk", oracle=_LSH_ORACLE)
def ann_lsh_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann_lsh_topk(load_table(spark, "embeddings", sf_dir), k=_K, query_mod=_QUERY_MOD)


_NEAR_ORACLE = f"""
WITH {_PREP},
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_DOT_AB} AS dot,
         a.nrm AS na, b.nrm AS nb
  FROM prepn a JOIN prepn b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, dot / sqrt(CAST(na * nb AS DOUBLE)) AS cos
FROM pairs
WHERE dot > 0 AND CAST(dot AS DOUBLE) * CAST(dot AS DOUBLE)
      >= {_TAU_NEAR * _TAU_NEAR} * CAST(na * nb AS DOUBLE)
"""


@register("embedding_near_dup", oracle=_NEAR_ORACLE)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return near_dup_pairs(load_table(spark, "embeddings", sf_dir), tau=_TAU_NEAR)
