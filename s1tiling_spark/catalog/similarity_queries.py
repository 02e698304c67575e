"""Similarity-search queries + DuckDB oracles (brute-force cosine
top-k, SRP-LSH ANN, embedding near-dup pairs).

Near-dup is registered three ways, matching the scale story:

- ``embedding_near_dup`` — the PRODUCTION shape: banded-SRP candidate
  generation (every join an equi-join) + exact integer-cosine verify.
  The oracle mirrors the banding exactly (same deterministic planes in
  SQL), so the gate is hash-exact; candidate recall vs the exact
  baseline is measured separately in tests/test_similarity_lsh.py.
  Note the fixture-constrained threshold (0.45): the driver embeddings
  top out at cos≈0.49, so production thresholds (≥0.9) would return
  zero rows here. At tau=0.45 the per-plane agreement probability
  (0.65) is close to a random pair's (0.5), so LOGICAL pruning is weak
  by geometry — the physical win is still real (hash join instead of
  a broadcast nested loop; measured 4x at 2k vectors).
- ``near_dup_planted_lsh`` — the HIGH-threshold regime where SRP-LSH
  actually prunes: exact duplicate rows are planted (union of scaled
  copies, mirrored in SQL), tau=0.97, r=8 planes per band → 256
  buckets per band. Exact-copy pairs project identically on every
  plane, so candidate recall is provably 1.0 and the oracle is the
  EXACT all-pairs formulation — an independent check, not a mirror.
- ``embedding_near_dup_exact`` — the O(N²) all-pairs theta join, kept
  ONLY as the small-scale baseline/oracle shape (sanctioned nested
  loop; see tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s1tiling_spark.operators.similarity import (
    QUANT,
    ann_lsh_topk,
    cosine_topk,
    ivf_topk,
    near_dup_pairs,
    near_dup_pairs_blocked,
    near_dup_pairs_lsh,
)
from s1tiling_spark.registry import register
from s1tiling_spark.sources.tables import load_table

_K = 5
_QUERY_MOD = 50
_TAU_NEAR = 0.45
_ND_BANDS = 16
_ND_R = 2

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


def _proj_sql(alias: str, plane: int) -> str:
    """DuckDB mirror of srp_weight/_proj: Σ qv[i] * ((((i0*31 +
    plane*17) % 101) % 7) - 3), i0 the 0-based dimension (DuckDB
    lambdas are 1-based). The inner mod 101 keeps all planes distinct
    (see operators/similarity.srp_weight)."""
    return (
        f"list_sum(list_transform({alias}, (x, i) -> x * (((i-1)*31 + {plane * 17}) % 101 % 7 - 3)))"
    )


_ANN_BANDS = 4


# --- IVF ANN: hash-stratified rank-based codebook with n_cells ≈ √N
# (both derived IN-ENGINE: Spark computes them from the corpus count at
# plan time, the oracle computes the identical values in SQL — nothing
# is hardcoded to the fixture), nprobe probing, exact re-rank.
_IVF_NPROBE = 2

_IVF_ORACLE = f"""
WITH {_PREP},
params AS (SELECT greatest(4, CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS INT))
           AS n_cells FROM embeddings),
hashed AS (
  SELECT vec_id, qv, nrm,
    CAST(('0x' || substr(md5('ivf:' || CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT)
      AS h
  FROM prepn),
rankedh AS (
  SELECT vec_id, qv, nrm,
    row_number() OVER (ORDER BY h, vec_id) AS rnk
  FROM hashed),
cents AS (
  SELECT rnk AS cid, qv AS cqv, nrm AS cnrm
  FROM rankedh, params p WHERE rnk <= p.n_cells),
assign AS (
  SELECT p.vec_id, c.cid,
    CAST(list_sum(list_transform(range(1, len(p.qv)+1),
         i -> p.qv[i]*c.cqv[i])) AS BIGINT)
      / sqrt(CAST(p.nrm * c.cnrm AS DOUBLE)) AS ccos
  FROM prepn p CROSS JOIN cents c
),
ranked AS (
  SELECT vec_id, cid,
    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS crk
  FROM assign
),
cell AS (SELECT vec_id, cid FROM ranked WHERE crk = 1),
qprobe AS (SELECT vec_id AS q_id, cid FROM ranked
           WHERE crk <= {_IVF_NPROBE} AND vec_id % {_QUERY_MOD} = 0),
cand AS (
  SELECT q.q_id, x.vec_id FROM qprobe q JOIN cell x USING (cid)
  WHERE x.vec_id <> q.q_id
),
scored AS (
  SELECT c.q_id, c.vec_id,
    CAST(list_sum(list_transform(range(1, len(a.qv)+1),
         i -> a.qv[i]*b.qv[i])) AS BIGINT)
      / sqrt(CAST(a.nrm * b.nrm AS DOUBLE)) AS cos
  FROM cand c
  JOIN prepn a ON a.vec_id = c.q_id
  JOIN prepn b ON b.vec_id = c.vec_id
)
SELECT q_id, vec_id, cos, CAST(rk AS INT) AS rk FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rk
  FROM scored) WHERE rk <= {_K}
"""


@register("ann_ivf_topk", oracle=_IVF_ORACLE)
def ann_ivf_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from s1tiling_spark.sources.tables import parquet_row_count

    # n_cells = max(4, isqrt(N)) with N from parquet FOOTER metadata —
    # no count() scan at plan time (the operator's n_cells=None path
    # remains the fallback for non-table DataFrames)
    n = parquet_row_count("embeddings", sf_dir)
    return ivf_topk(
        load_table(spark, "embeddings", sf_dir),
        k=_K,
        query_mod=_QUERY_MOD,
        n_cells=max(4, math.isqrt(n)),
        nprobe=_IVF_NPROBE,
    )


def _band_key_sql(alias: str, band: int, r: int) -> str:
    parts = []
    for j in range(r):
        parts.append(
            f"(CASE WHEN {_proj_sql(alias, band * r + j)} > 0 THEN {1 << j} ELSE 0 END)"
        )
    return "(" + " + ".join(parts) + ")"


def _banded_sql(source_rel: str, bands: int, r: int) -> str:
    """banded AS: one row per (vec_id, band, key) over `source_rel`
    (which must expose vec_id, qv)."""
    rows = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band, {_band_key_sql('qv', b, r)} AS key "
        f"FROM {source_rel}"
        for b in range(bands)
    )
    return f"banded AS ({rows})"


# --- banded-SRP ANN top-k: the band-key width r is DERIVED FROM THE
# CORPUS SIZE in BOTH engines (Spark: derive_r(count) at plan time;
# SQL: the identical integer bit-length formula over count(*)) and the
# query side multiprobes every band key at Hamming distance 1 — the
# scale-parameterized candidate generation, mirrored dynamically so
# nothing is hardcoded to the sf0.01 fixture.
from s1tiling_spark.operators.similarity import (  # noqa: E402
    ANN_R_MAX,
    ANN_R_MIN,
    ANN_TARGET_BUCKET,
)

_ANN_LSH_ORACLE = f"""
WITH {_PREP},
params AS (SELECT greatest({ANN_R_MIN}, least({ANN_R_MAX},
           length(bin((count(*) - 1) // {ANN_TARGET_BUCKET})))) AS r
           FROM embeddings),
bandix AS (SELECT unnest(range(0, {_ANN_BANDS})) AS band),
banded AS (
  SELECT vec_id, band,
    CAST(list_sum(list_transform(range(0, p.r), j ->
      CASE WHEN list_sum(list_transform(qv, (x, i) ->
           x * (((i-1)*31 + (band * p.r + j) * 17) % 101 % 7 - 3))) > 0
           THEN (1 << j) ELSE 0 END)) AS BIGINT) AS key
  FROM prepn, params p, bandix
),
qprobe AS (
  SELECT q_id, band, unnest(probes) AS key FROM (
    SELECT vec_id AS q_id, band,
      list_prepend(key, list_transform(range(0, p.r),
        j -> xor(key, CAST(1 << j AS BIGINT)))) AS probes
    FROM banded, params p WHERE vec_id % {_QUERY_MOD} = 0)
),
cand AS (
  SELECT DISTINCT q.q_id, b.vec_id
  FROM banded b JOIN qprobe q ON b.band = q.band AND b.key = q.key
  WHERE b.vec_id <> q.q_id
),
scored AS (
  SELECT c.q_id, c.vec_id,
    CAST(list_sum(list_transform(range(1, len(a.qv)+1),
         i -> a.qv[i]*b.qv[i])) AS BIGINT)
      / sqrt(CAST(a.nrm * b.nrm AS DOUBLE)) AS cos
  FROM cand c
  JOIN prepn a ON a.vec_id = c.q_id
  JOIN prepn b ON b.vec_id = c.vec_id
)
SELECT q_id, vec_id, cos, CAST(rk AS INT) AS rk FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rk
  FROM scored) WHERE rk <= {_K}
"""


@register("ann_lsh_topk", oracle=_ANN_LSH_ORACLE)
def ann_lsh_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from s1tiling_spark.operators.similarity import derive_r
    from s1tiling_spark.sources.tables import parquet_row_count

    # r = derive_r(N) with N from parquet FOOTER metadata — no count()
    # scan at plan time (the operator's r=None path remains the
    # fallback for non-table DataFrames)
    n = parquet_row_count("embeddings", sf_dir)
    return ann_lsh_topk(
        load_table(spark, "embeddings", sf_dir),
        k=_K,
        query_mod=_QUERY_MOD,
        bands=_ANN_BANDS,
        r=derive_r(n),
        multiprobe=1,
    )


def _cos_select(tau: float) -> str:
    return f"""
SELECT id_a, id_b, dot / sqrt(CAST(na * nb AS DOUBLE)) AS cos
FROM pairs
WHERE dot > 0 AND CAST(dot AS DOUBLE) * CAST(dot AS DOUBLE)
      >= {tau * tau} * CAST(na * nb AS DOUBLE)
"""


# exact all-pairs formulation — the DuckDB-side pair generator reused
# by both the exact query's oracle and the planted-LSH oracle
def _allpairs_sql(rel: str) -> str:
    return f"""
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_DOT_AB} AS dot,
         a.nrm AS na, b.nrm AS nb
  FROM {rel} a JOIN {rel} b ON a.vec_id < b.vec_id
)"""


# --- production shape: banded-SRP candidates, oracle mirrors the bands
_ND_LSH_ORACLE = f"""
WITH {_PREP},
{_banded_sql('prepn', _ND_BANDS, _ND_R)},
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
),
pairs AS (
  SELECT c.id_a, c.id_b,
         CAST(list_sum(list_transform(range(1, len(pa.qv)+1),
              i -> pa.qv[i]*pb.qv[i])) AS BIGINT) AS dot,
         pa.nrm AS na, pb.nrm AS nb
  FROM cand c
  JOIN prepn pa ON pa.vec_id = c.id_a
  JOIN prepn pb ON pb.vec_id = c.id_b
)
{_cos_select(_TAU_NEAR)}
"""


@register("embedding_near_dup", oracle=_ND_LSH_ORACLE)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return near_dup_pairs_lsh(
        load_table(spark, "embeddings", sf_dir),
        tau=_TAU_NEAR,
        bands=_ND_BANDS,
        r=_ND_R,
    )


# --- exact baseline: O(N²) semantics via the broadcast-matrix block
# kernel (identical results to the theta-join formulation, 20-40x
# faster; tests/test_similarity_lsh.py asserts blocked == join).
_ND_EXACT_ORACLE = f"WITH {_PREP}, {_allpairs_sql('prepn')} {_cos_select(_TAU_NEAR)}"


@register("embedding_near_dup_exact", oracle=_ND_EXACT_ORACLE)
def embedding_near_dup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return near_dup_pairs_blocked(
        load_table(spark, "embeddings", sf_dir), tau=_TAU_NEAR
    )


# --- high-threshold regime: planted exact duplicates, r=8 → 256
# buckets/band, recall provably 1.0 for identical vectors → EXACT
# all-pairs oracle (independent, not a mirror).
_TAU_PLANT = 0.97
_PLANT_MOD = 50
_PLANT_OFFSET = 10_000_000


def _planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    copies = emb.filter(F.pmod(F.col("vec_id"), F.lit(_PLANT_MOD)) == 0).select(
        (F.col("vec_id") + _PLANT_OFFSET).alias("vec_id"), "embedding"
    )
    return emb.unionByName(copies)


_PLANTED_CTE = (
    "aug AS (SELECT vec_id, embedding FROM embeddings "
    f"UNION ALL SELECT vec_id + {_PLANT_OFFSET}, embedding "
    f"FROM embeddings WHERE vec_id % {_PLANT_MOD} = 0), "
    "prep AS (SELECT vec_id, "
    f"list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT)) AS qv "
    "FROM aug), "
    "prepn AS (SELECT vec_id, qv, "
    "CAST(list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*qv[i])) AS BIGINT) AS nrm "
    "FROM prep)"
)

_PLANTED_ORACLE = f"WITH {_PLANTED_CTE}, {_allpairs_sql('prepn')} {_cos_select(_TAU_PLANT)}"


@register("near_dup_planted_lsh", oracle=_PLANTED_ORACLE)
def near_dup_planted_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return near_dup_pairs_lsh(
        _planted(spark, sf_dir), tau=_TAU_PLANT, bands=2, r=8
    )
