"""Dedup queries + DuckDB oracles (exact, Jaccard, MinHash-LSH,
SimHash). Oracle SQL is generated from the same constants as the Spark
side so thresholds/hash parameters can never drift apart."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s1tiling_spark.operators.dedup import (
    MINHASH_P,
    MINHASH_REDUCE,
    connected_components,
    exact_dedup_groups,
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash_fingerprints,
)
from s1tiling_spark.registry import register
from s1tiling_spark.sources.tables import load_table

# shared SQL fragments ------------------------------------------------
_WORDS = "string_split(text, ' ')"
_SHINGLES = (
    "list_distinct(list_transform("
    "range(1, greatest(len({w}) - 2, 1) + 1), "
    "i -> array_to_string(({w})[i:i+2], ' ')))"
).format(w=_WORDS)
_MD5L = "CAST(('0x' || substr(md5({e}), 1, 15)) AS BIGINT)"


# ------------------------------------------------------------- exact
@register(
    "dedup_exact",
    oracle=(
        "SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, "
        "count(*) AS n_dups FROM documents GROUP BY 1"
    ),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup_groups(load_table(spark, "documents", sf_dir))


# ----------------------------------------------------------- jaccard
_MAX_DF = 100  # stop-shingle guard (mirrored in the oracle below)

_JACCARD_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, unnest({_SHINGLES}) AS sh FROM documents
),
shf AS (
  SELECT s.* FROM sh s
  JOIN (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= {_MAX_DF}) ok
    USING (sh)
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shf GROUP BY 1),
inter AS (
  SELECT x1.doc_id AS doc_a, x2.doc_id AS doc_b, count(*) AS inter
  FROM shf x1 JOIN shf x2 ON x1.sh = x2.sh AND x1.doc_id < x2.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, inter, sa.n_sh AS n_a, sb.n_sh AS n_b
FROM inter JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE inter * 100 >= 80 * (sa.n_sh + sb.n_sh - inter)
"""


@register("dedup_jaccard_pairs", oracle=_JACCARD_ORACLE)
def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jaccard_pairs(
        load_table(spark, "documents", sf_dir), k=3, tau=0.8, max_df=_MAX_DF
    )


# ----------------------------------------------------------- minhash
_NUM_HASHES = 16
_BANDS = 4
_R = _NUM_HASHES // _BANDS
_TAU_AGREE = int(round(0.7 * _NUM_HASHES))


def _sig_sql() -> str:
    shh = f"list_transform({_SHINGLES}, s -> {_MD5L.format(e='s')})"
    sig_elems = ", ".join(
        f"list_min(list_transform(shh, h -> "
        f"({2*i+1} * (h % {MINHASH_REDUCE}) + {101*i+17}) % {MINHASH_P}))"
        for i in range(_NUM_HASHES)
    )
    return (
        f"sigs AS (SELECT doc_id, [{sig_elems}] AS sig "
        f"FROM (SELECT doc_id, {shh} AS shh FROM documents))"
    )


# MinHash signature + SimHash fingerprint folded into ONE per-doc gated
# query (driver correctness window caps at 50 entries; §2 rows map to
# columns: ``sig_key`` = MinHash, ``simhash`` = SimHash). The driver's
# canonicalizer can't sort raw array columns, so the gate compares the
# '_'-joined signature string — content-exact per row.
_SIMHASH_BITS = 16
_SIMHASH_VOTES = ", ".join(
    f"sum(((h >> {j}) & 1) * 2 - 1) AS v{j}" for j in range(_SIMHASH_BITS)
)
_SIMHASH_FP = " + ".join(
    f"(CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(_SIMHASH_BITS)
)

_FINGERPRINTS_ORACLE = f"""
WITH {{sig_cte}},
w AS (
  SELECT doc_id, {_MD5L.format(e='u.w')} AS h
  FROM (SELECT doc_id, unnest({_WORDS}) AS w FROM documents) u
),
votes AS (SELECT doc_id, {_SIMHASH_VOTES} FROM w GROUP BY doc_id),
sh AS (SELECT doc_id, CAST({_SIMHASH_FP} AS INT) AS simhash FROM votes)
SELECT s.doc_id, array_to_string(s.sig, '_') AS sig_key, sh.simhash
FROM sigs s JOIN sh USING (doc_id)
"""


@register(
    "fingerprint_signatures",
    oracle=_FINGERPRINTS_ORACLE.format(sig_cte=_sig_sql()),
)
def fingerprint_signatures_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    sig = minhash_signatures(docs, k=3, num_hashes=_NUM_HASHES).select(
        "doc_id",
        F.concat_ws("_", F.col("sig").cast("array<string>")).alias("sig_key"),
    )
    sh = simhash_fingerprints(docs, bits=_SIMHASH_BITS)
    return sig.join(sh, "doc_id").select("doc_id", "sig_key", "simhash")


def _bands_sql() -> str:
    # band key = '_'-joined r signature values (1-based in DuckDB)
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, sig, {bi} AS band, "
        "concat_ws('_', {parts}) AS key FROM sigs".format(
            bi=bi,
            parts=", ".join(f"sig[{bi*_R + j + 1}]" for j in range(_R)),
        )
        for bi in range(_BANDS)
    )
    return f"banded AS ({band_rows})"


_MAX_BUCKET = 100  # hot-bucket guard (mirrored both engines)

_MINHASH_LSH_ORACLE = f"""
WITH {_sig_sql()}, {_bands_sql()},
bandf AS (
  SELECT x.* FROM banded x
  JOIN (SELECT band, key FROM banded GROUP BY band, key
        HAVING count(*) <= {_MAX_BUCKET}) ok USING (band, key)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.sig AS sig_a, b.sig AS sig_b
  FROM bandf a JOIN bandf b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
  len(list_filter(range(1, {_NUM_HASHES} + 1),
      i -> sig_a[i] = sig_b[i])) AS n_agree
FROM cand
WHERE len(list_filter(range(1, {_NUM_HASHES} + 1),
      i -> sig_a[i] = sig_b[i])) >= {_TAU_AGREE}
"""


@register("minhash_lsh_pairs", oracle=_MINHASH_LSH_ORACLE)
def minhash_lsh_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(
        load_table(spark, "documents", sf_dir),
        k=3,
        num_hashes=_NUM_HASHES,
        bands=_BANDS,
        tau=0.7,
        max_bucket=_MAX_BUCKET,
    )


# ------------------------------------------------- connected components
# Duplicate-cluster grouping: the transitive closure of the LSH pair
# graph, one canonical keeper per component — the ITERATIVE-algorithm
# family (hash-min label propagation in Spark; the unique min-reachable
# fixpoint lets a recursive-CTE oracle verify it exactly).
_COMPONENTS_ORACLE = f"""
WITH RECURSIVE lshp AS ({_MINHASH_LSH_ORACLE}),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM lshp
  UNION SELECT doc_b, doc_a FROM lshp
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
)
SELECT u AS doc_id, least(u, min(v)) AS component,
       u = least(u, min(v)) AS keep
FROM reach GROUP BY u
"""


@register("dedup_components", oracle=_COMPONENTS_ORACLE)
def dedup_components_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = minhash_lsh_pairs(
        load_table(spark, "documents", sf_dir),
        k=3,
        num_hashes=_NUM_HASHES,
        bands=_BANDS,
        tau=0.7,
        max_bucket=_MAX_BUCKET,
    )
    return connected_components(pairs)


