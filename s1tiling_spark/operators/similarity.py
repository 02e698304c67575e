"""Similarity search over the embedding column: brute-force cosine
top-k (baseline) + SRP-LSH bucketed ANN + IVF ANN (the scale paths).

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
  corpus partitions, no shuffle beyond the final per-query top-k.
- SRP-LSH: banded sign-random-projection keys; candidates = band-key
  equi-join collisions. The key width ``r`` is DERIVED FROM CORPUS
  SIZE at plan time (``derive_r``: key space ≈ N / target bucket), so
  expected bucket occupancy stays ~constant as N grows — at 10^9
  vectors, r≈26 bits keeps candidate work per query at
  bands·(1+r)·target_bucket ≈ thousands of exact re-ranks, not a
  corpus fraction. Recall lost to narrow buckets is recovered with
  MULTIPROBE: each query also probes every band key at Hamming
  distance 1 (the r single-bit flips — the classic multi-probe LSH
  move), which multiplies probes by (1+r) but leaves corpus-side state
  untouched.
- IVF: hash-stratified rank-based codebook (n_cells ≈ √N), nprobe
  cell probing, exact in-cell re-rank.

Everything in the hot path is JVM column algebra or Arrow-batched
numpy — no per-row Python.

Cache hygiene: every ``persist()`` this module takes is tracked;
callers running many queries in one session can release them all with
:func:`release_cached` (bench.py's ``clearCache()`` also works).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

QUANT = 10_000
N_PLANES = 16
MAX_BLOCKED_ROWS = 100_000  # driver-collect ceiling for the exact baseline

# LSH scale parameters: key space per band ≈ N / ANN_TARGET_BUCKET
ANN_TARGET_BUCKET = 16
ANN_R_MIN = 4
ANN_R_MAX = 24

# --------------------------------------------------------------- cache
# delegated to the shared tracker (operators/cache.py); release_cached
# below additionally destroys corpus broadcasts
from s1tiling_spark.operators.cache import persist_tracked as _persist  # noqa: E402
from s1tiling_spark.operators.cache import release_cached as _release_tracked  # noqa: E402


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


def _corpus_rows(emb: DataFrame, prep: DataFrame) -> int:
    """Corpus size for scale-parameter derivation (ANN key width, IVF
    cell count): parquet footers when the input is file-backed (driver
    metadata, zero Spark jobs — the footer sum upper-bounds the true
    count, which only rounds the derived parameter conservatively), a
    count() job on the persisted prep otherwise. The count() fallback
    intentionally runs on PREP (warming the relation every later stage
    reads), not on emb."""
    from s1tiling_spark.sources.tables import footer_rows_upper_bound

    n = footer_rows_upper_bound(emb)
    return n if n is not None else prep.count()


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


def _cos_filter(pairs: DataFrame, tau: float) -> DataFrame:
    """Exact integer-cosine threshold over (id_a, id_b, dot, na, nb):
    dot > 0 AND dot^2 >= tau^2 * na * nb (cast to double only for the
    final compare — same IEEE values both engines)."""
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


def near_dup_pairs(emb: DataFrame, tau: float = 0.97) -> DataFrame:
    """All vector pairs with cosine >= tau — the exact small-scale
    formulation (O(N²) theta join): correct as an oracle/baseline, NOT
    the scale path. Use :func:`near_dup_pairs_lsh` beyond ~10^5 rows."""
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
    return _cos_filter(pairs, tau)


def srp_weight(d: Column, j: int) -> Column:
    """Deterministic pseudo-random hyperplane weight in [-3, 3]:
    w(d, j) = (((d*31 + j*17) % 101) % 7) - 3, d the 0-based dimension.

    The inner mod by the prime 101 is load-bearing: a single mod-7
    formula makes every plane a function of (linear combo mod 7), which
    collapses the whole family to at most 7 distinct hyperplanes —
    planes j and j+7 were IDENTICAL (review finding, round 2). Reducing
    mod 101 first gives the j-term period 101, so all planes used by
    the banded schemes (up to bands·r ≈ 100) are distinct."""
    return (d * 31 + F.lit(j * 17)) % 101 % 7 - 3


def srp_band_keys(qv: Column, bands: int, r: int) -> Column:
    """Array of `bands` structs (band, key): key packs the sign bits of
    ``r`` consecutive SRP hyperplanes. Two vectors are LSH candidates
    iff they share some band's full key — the MinHash banding scheme
    applied to signed random projections."""
    def _proj(j: int) -> Column:
        return F.aggregate(
            F.transform(qv, lambda x, i: x * srp_weight(i, j)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    signs = [
        F.when(_proj(j) > 0, F.lit(1)).otherwise(F.lit(0))
        for j in range(bands * r)
    ]
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                sum(
                    (signs[b * r + j] * F.lit(1 << j) for j in range(1, r)),
                    signs[b * r],
                ).cast("long").alias("key"),
            )
            for b in range(bands)
        ]
    )


def srp_banded_arrow(
    prep: DataFrame, bands: int, r: int, with_vectors: bool = False
) -> DataFrame:
    """(vec_id, qv, …) → long-form (vec_id, band, key) band keys,
    computed as ONE numpy int64 matmul per Arrow batch instead of
    bands·r interpreted column folds.

    Exactness: the weight matrix W[d, j] = ((d·31 + j·17) % 101 % 7) − 3
    is the same integer formula as :func:`srp_weight`; signs of exact
    int64 dot products are engine-independent, so the keys are
    bit-identical to :func:`srp_band_keys` (asserted by
    tests/test_ann_scale.py::test_arrow_banding_matches_column_fold).

    Scale shape: O(N·dim·bands·r) MACs as BLAS instead of interpreted
    per-element lambdas — at bands·r ≳ 20 planes this is the dominant
    banding cost (PERF.md §3's Arrow break-even, now on the projection
    side). Output carries only (vec_id, band, key): the vectors never
    leave the kernel — unless ``with_vectors`` asks for (qv, nrm) too,
    the input to the per-bucket verify kernel
    (:func:`_bucket_pairs_matmul`), which trades bands× vector copies
    through ONE shuffle against per-candidate-pair vector attachment."""
    import numpy as np
    import pandas as pd

    n_planes = bands * r

    def kernel(batches):
        W = None
        pow2 = (1 << np.arange(r, dtype=np.int64))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q = np.array(list(pdf["qv"]), dtype=np.int64)
            if W is None:
                d = np.arange(Q.shape[1], dtype=np.int64)[:, None]
                j = np.arange(n_planes, dtype=np.int64)[None, :]
                W = ((d * 31 + j * 17) % 101 % 7) - 3
            signs = (Q @ W) > 0  # (rows, planes) exact int64 dots
            keys = (
                signs.reshape(len(pdf), bands, r) * pow2[None, None, :]
            ).sum(axis=2)
            rows = np.repeat(pdf["vec_id"].to_numpy(dtype=np.int64), bands)
            out = {
                "vec_id": rows,
                "band": np.tile(np.arange(bands, dtype=np.int32), len(pdf)),
                "key": keys.reshape(-1),
            }
            if with_vectors:
                out["qv"] = np.repeat(pdf["qv"].to_numpy(), bands)
                out["nrm"] = np.repeat(pdf["nrm"].to_numpy(dtype=np.int64), bands)
            yield pd.DataFrame(out)

    if with_vectors:
        return prep.select("vec_id", "qv", "nrm").mapInPandas(
            kernel,
            "vec_id long, band int, key long, qv array<long>, nrm long",
        )
    return prep.select("vec_id", "qv").mapInPandas(
        kernel, "vec_id long, band int, key long"
    )


def derive_r(
    n: int,
    target_bucket: int = ANN_TARGET_BUCKET,
    r_min: int = ANN_R_MIN,
    r_max: int = ANN_R_MAX,
) -> int:
    """Band-key width from corpus size: the smallest r with
    2^r >= N / target_bucket (integer bit-length — no floats), clamped
    to [r_min, r_max]. Keeps expected bucket occupancy ≈ target_bucket
    at any N: N=500 → r=5; N=10^5 → r=13; N=10^9 → r=24 (capped)."""
    return min(r_max, max(r_min, ((max(n, 1) - 1) // target_bucket).bit_length()))


def near_dup_pairs_lsh(
    emb: DataFrame, tau: float = 0.97, bands: int = 8, r: int = 2
) -> DataFrame:
    """Near-duplicate pairs at scale: banded-SRP candidate generation +
    exact integer-cosine verification.

    Scale shape (vs the all-pairs theta join): every join here is an
    equi-join — candidates come from `bands` equality buckets per
    vector, so work is O(Σ bucket-collisions), not O(N²). Recall is
    1-(1-p^r)^bands with p = 1 - θ/π the per-plane agreement
    probability; at tau=0.45 (θ≈63°), 8 bands × 2 planes gives ~0.99
    per-pair — tune (bands, r) up for recall, down for pruning. The
    verification step is exact, so precision is always 1.0; candidates
    the planes miss are the only loss (measured in
    tests/test_similarity_lsh.py against the all-pairs baseline).

    Shuffle discipline (guide §8 — move the heavy bytes ONCE): every
    candidate pair shares a band bucket, so the exact verification is
    a per-bucket integer matmul over that bucket's vectors. One
    groupBy((band, key)) shuffle moves ``bands`` copies of each vector;
    the kernel emits only the SURVIVING (id_a, id_b, cos) rows, and a
    final dropDuplicates runs over survivors. The previous shape
    (ids-only candidate self-join, then re-attaching both qv arrays to
    every deduped pair) shuffled 2 vector copies PER CANDIDATE PAIR —
    ~870 copies of each vector at the gate's density (1.7 M candidates
    over 2 k vectors) vs 16 here; measured 4.8 s -> 1.3 s warm at
    sf0.1. Bucket occupancy is bounded by the banding parameters
    (``derive_r`` targets a fixed expected bucket size), and the
    kernel chunks its matmul so per-task memory stays O(chunk ×
    bucket) even on a degenerate hot bucket."""
    bandedv = srp_banded_arrow(_prepared(emb), bands, r, with_vectors=True)
    return _bucket_pairs_matmul(bandedv, tau).dropDuplicates(["id_a", "id_b"])


def _bucket_pairs_matmul(bandedv: DataFrame, tau: float) -> DataFrame:
    """(vec_id, band, key, qv, nrm) → surviving (id_a, id_b, cos) per
    band bucket: exact int64 dot products via one chunked numpy matmul
    per bucket, thresholded EXACTLY like :func:`_cos_filter`
    (dot > 0 AND double(dot)·double(dot) >= tau²·double(na·nb); cos =
    dot / sqrt(double(na·nb)) — identical IEEE ops, so results are
    bit-equal to the pairwise formulation). Pairs are emitted with
    id_a < id_b; cross-bucket duplicates carry identical values, so
    the caller's dropDuplicates may keep any."""
    import numpy as np
    import pandas as pd

    t2 = tau * tau
    empty = pd.DataFrame(
        {
            "id_a": pd.Series(dtype="int64"),
            "id_b": pd.Series(dtype="int64"),
            "cos": pd.Series(dtype="float64"),
        }
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return empty
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        Q = np.array(list(pdf["qv"]), dtype=np.int64)
        nrm = pdf["nrm"].to_numpy(dtype=np.int64)
        # chunk rows so the (chunk × n) dot matrix stays ~64 MB even
        # on a degenerate hot bucket (CPU is O(b²·dim) either way —
        # inherent to LSH candidates — but memory must not be)
        chunk = max(1, min(n, (8 << 20) // n))
        out = []
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            D = Q[s:e] @ Q.T  # exact int64 dots, (e-s, n)
            prod = (nrm[s:e, None] * nrm[None, :]).astype(np.float64)
            dd = D.astype(np.float64)
            keep = (
                (D > 0)
                & (dd * dd >= t2 * prod)
                & (ids[s:e, None] < ids[None, :])
            )
            ci, cj = np.nonzero(keep)
            if len(ci):
                out.append(
                    pd.DataFrame(
                        {
                            "id_a": ids[s + ci],
                            "id_b": ids[cj],
                            "cos": D[ci, cj] / np.sqrt(prod[ci, cj]),
                        }
                    )
                )
        return pd.concat(out, ignore_index=True) if out else empty

    return bandedv.groupBy("band", "key").applyInPandas(
        kernel, "id_a long, id_b long, cos double"
    )


def _pair_dots_arrow(pairs_vecs: DataFrame) -> DataFrame:
    """(id_a, id_b, qv_a, qv_b, na, nb) → (id_a, id_b, dot, na, nb)
    with the dot computed as one numpy int64 row-wise product per Arrow
    batch. Exact integers — identical to the `int_dot` column fold —
    but vectorized instead of interpreted per element (higher-order
    functions don't enter whole-stage codegen; 128 MACs/row is past
    the break-even PERF.md §3 measured for Arrow kernels). Stays fully
    distributed: no driver collect, no broadcast — the verify step of
    the LSH scale path."""
    import numpy as np
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a = np.array(list(pdf["qv_a"]), dtype=np.int64)
            b = np.array(list(pdf["qv_b"]), dtype=np.int64)
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"].to_numpy(dtype=np.int64),
                    "id_b": pdf["id_b"].to_numpy(dtype=np.int64),
                    "dot": (a * b).sum(axis=1),
                    "na": pdf["na"].to_numpy(dtype=np.int64),
                    "nb": pdf["nb"].to_numpy(dtype=np.int64),
                }
            )

    return pairs_vecs.select("id_a", "id_b", "qv_a", "qv_b", "na", "nb").mapInPandas(
        kernel, "id_a long, id_b long, dot long, na long, nb long"
    )


N_MATMUL_BLOCKS = 16  # hash blocks for the distributed block matmul
# per-block ceiling: MAX_BLOCKED_ROWS spread over the blocks with 4×
# slack for hash imbalance — turns runaway O(N²) work into an
# actionable error instead of a silent multi-hour job
_BLOCK_CAP = (MAX_BLOCKED_ROWS // N_MATMUL_BLOCKS) * 4


def _pack_blocks(prep: DataFrame, n_blocks: int) -> DataFrame:
    """Pack each hash block of the prepared corpus into ONE row of
    serialized int64 numpy buffers (ids, matrix, norms) — the unit of
    the distributed block matmul."""
    import numpy as np
    import pandas as pd

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n > _BLOCK_CAP:
            raise ValueError(
                f"near_dup_pairs_blocked is the exact O(N²) baseline "
                f"(≈ {MAX_BLOCKED_ROWS} vectors); block of {n} rows "
                f"exceeds the {_BLOCK_CAP}-row block cap — use "
                "near_dup_pairs_lsh for large corpora"
            )
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        mat = np.array(list(pdf["qv"]), dtype=np.int64)
        nrms = pdf["nrm"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "blk": [int(pdf["blk"].iloc[0])],
                "n": [n],
                "dim": [int(mat.shape[1]) if n else 0],
                "ids": [ids.tobytes()],
                "mat": [mat.tobytes()],
                "nrms": [nrms.tobytes()],
            }
        )

    return (
        prep.withColumn("blk", F.pmod(F.col("vec_id"), F.lit(n_blocks)))
        .groupBy("blk")
        .applyInPandas(
            pack, "blk int, n long, dim int, ids binary, mat binary, nrms binary"
        )
    )


def near_dup_pairs_blocked(
    emb: DataFrame, tau: float = 0.97, n_blocks: int = N_MATMUL_BLOCKS
) -> DataFrame:
    """Exact all-pairs near-dup via a DISTRIBUTED block matmul — the
    fast form of the O(N²) baseline (same results as
    :func:`near_dup_pairs`, bit-for-bit).

    Fully lazy: no driver collect, no broadcast variable, zero jobs at
    construction (plan-only consumers are free). The corpus is hashed
    into ``n_blocks`` packed-matrix rows (one applyInPandas group
    each); every unordered block pair (i ≤ j) becomes one kernel task
    via a broadcast loop join over the n_blocks-row packed relation —
    n_blocks² tiny METADATA rows, the classic distributed block-matmul
    shape, NOT a row-level loop join. Each task runs one exact int64
    matmul A @ Bᵀ and emits pairs over the threshold in both id
    orders, so every (id_a < id_b) pair appears exactly once. Work is
    O(N²/2) MACs total — half the broadcast-corpus formulation, memory
    per task = two blocks.

    Still the exact-baseline regime (documented ≈ ≤ 10⁵ vectors);
    beyond that use :func:`near_dup_pairs_lsh`. The per-block row cap
    turns runaway quadratic work into an actionable task error (raised
    at action time, the lazy analog of the old construction-time cap).

    Quantization happens in Spark (`_prepared`) on BOTH sides, so the
    integers — and therefore the results — are identical to the join
    formulation (numpy's round-half-even never runs); the float
    discipline (int64 product first, ONE double conversion) matches
    Spark/DuckDB ``CAST(na*nb AS DOUBLE)`` exactly."""
    import numpy as np
    import pandas as pd

    packed = _pack_blocks(_prepared(emb), n_blocks)
    a = packed.select(*[F.col(c).alias(f"a_{c}") for c in packed.columns])
    b = packed.select(*[F.col(c).alias(f"b_{c}") for c in packed.columns])
    joined = a.join(F.broadcast(b), F.col("a_blk") <= F.col("b_blk"))
    t2 = tau * tau

    def _unpack(ids_b: bytes, mat_b: bytes, nrms_b: bytes, n: int, dim: int):
        ids = np.frombuffer(ids_b, dtype=np.int64)
        mat = np.frombuffer(mat_b, dtype=np.int64).reshape(n, dim)
        nrms = np.frombuffer(nrms_b, dtype=np.int64)
        return ids, mat, nrms

    def kernel(batches):
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                if row.a_n == 0 or row.b_n == 0:
                    continue
                ids_a, mat_a, nrm_a = _unpack(
                    row.a_ids, row.a_mat, row.a_nrms, row.a_n, row.a_dim
                )
                ids_b, mat_b, nrm_b = _unpack(
                    row.b_ids, row.b_mat, row.b_nrms, row.b_n, row.b_dim
                )
                dots = mat_a @ mat_b.T  # exact int64 dots
                # int64 multiply FIRST, float64 convert after — the
                # product can exceed 2^53, and Spark/DuckDB compute
                # CAST(na*nb AS DOUBLE) (integer product, then one
                # rounding), so converting the factors first would
                # round differently
                prod = (nrm_a[:, None] * nrm_b[None, :]).astype(np.float64)
                cond = (dots > 0) & (dots.astype(np.float64) ** 2 >= t2 * prod)
                m1 = (ids_a[:, None] < ids_b[None, :]) & cond
                ai, bi = np.nonzero(m1)
                if len(ai):
                    yield pd.DataFrame(
                        {
                            "id_a": ids_a[ai],
                            "id_b": ids_b[bi],
                            "dot": dots[ai, bi],
                            "na": nrm_a[ai],
                            "nb": nrm_b[bi],
                        }
                    )
                if row.a_blk != row.b_blk:
                    # pairs whose smaller id sits in block B
                    m2 = (ids_b[None, :] < ids_a[:, None]) & cond
                    ai2, bi2 = np.nonzero(m2)
                    if len(ai2):
                        yield pd.DataFrame(
                            {
                                "id_a": ids_b[bi2],
                                "id_b": ids_a[ai2],
                                "dot": dots[ai2, bi2],
                                "na": nrm_b[bi2],
                                "nb": nrm_a[ai2],
                            }
                        )

    pairs = joined.mapInPandas(
        kernel, "id_a long, id_b long, dot long, na long, nb long"
    )
    return _cos_filter(pairs, tau)


def release_cached() -> None:
    """Unpersist every tracked relation (all operator modules share one
    registry) — library callers' cleanup hook; idempotent."""
    _release_tracked()


def _ivf_hash(vec_id: Column) -> Column:
    """md5-derived stratification hash for codebook sampling — the
    repo-standard 60-bit hash (dedup.md5_long), namespaced."""
    from s1tiling_spark.operators.dedup import md5_long

    return md5_long(F.concat(F.lit("ivf:"), vec_id.cast("string")))


def ivf_codebook(prep: DataFrame, n_cells: int) -> DataFrame:
    """Hash-stratified rank-based codebook: the ``n_cells`` corpus
    vectors with the smallest (md5(vec_id), vec_id) rank — a uniform
    deterministic sample with NO dense-id assumption (works on sparse /
    offset id spaces), selected distributively as a top-k
    (TakeOrderedAndProject), never a global window sort. cid = rank
    within the selected set (1-based)."""
    sampled = (
        prep.withColumn("_h", _ivf_hash(F.col("vec_id")))
        .orderBy("_h", "vec_id")
        .limit(n_cells)
    )
    # cid = rank within the selected set. NOT a global window (a
    # no-partition WindowExec sprays "moving all data to a single
    # partition" warnings over every run): fold the n_cells rows into
    # one sorted array and posexplode — struct ordering is field-
    # lexicographic, so (_h, vec_id) leads and the tie-break fields
    # are never reached (vec_id is unique). Same single-node memory
    # profile the codebook already has (it is broadcast right after).
    agg = sampled.agg(
        F.sort_array(
            F.collect_list(F.struct("_h", "vec_id", "qv", "nrm"))
        ).alias("_cb")
    )
    return agg.select(F.posexplode("_cb").alias("_i", "_s")).select(
        (F.col("_i") + 1).cast("int").alias("cid"),
        F.col("_s.vec_id").alias("cvid"),
        F.col("_s.qv").alias("cqv"),
        F.col("_s.nrm").alias("cnrm"),
    )


def kmeans_refine(prep: DataFrame, cents: DataFrame, iters: int = 3) -> DataFrame:
    """Deterministic Lloyd refinement of an integer codebook: assign
    every vector to its argmax-cosine cell, recompute each cell's
    centroid as the ROUNDED element-wise mean (integer sums are
    associative → the refined codebook is identical at any
    parallelism), repeat ``iters`` times. Empty cells keep their
    previous centroid. Used by the recall tests; the oracle-gated query
    uses the un-refined hash-stratified codebook (SQL-mirrorable)."""
    for _ in range(iters):
        assigned = _assign_cells(prep, cents).filter(F.col("crk") == 1).select(
            "vec_id", "cid"
        )
        ex = (
            prep.join(assigned, "vec_id")
            .select("cid", F.posexplode("qv").alias("pos", "v"))
            .groupBy("cid", "pos")
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
            .withColumn("m", F.round(F.col("s") / F.col("n")).cast("long"))
        )
        new_qv = (
            ex.groupBy("cid")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm")
            )
            .select(
                "cid", F.transform(F.col("pm"), lambda x: x["m"]).alias("new_cqv")
            )
        )
        cents = (
            cents.join(new_qv, "cid", "left")
            .select(
                "cid",
                "cvid",
                # empty cells keep their previous centroid
                F.coalesce(F.col("new_cqv"), F.col("cqv")).alias("cqv"),
            )
            .withColumn("cnrm", int_dot(F.col("cqv"), F.col("cqv")))
        )
    return cents


def _assign_cells(prep: DataFrame, cents: DataFrame) -> DataFrame:
    """Argmax-cosine cell per vector: one O(N·C) broadcast map pass +
    rank-1 window on the per-vector scored cells."""
    scored = prep.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cid",
        (
            int_dot(F.col("qv"), F.col("cqv"))
            / F.sqrt((F.col("nrm") * F.col("cnrm")).cast("double"))
        ).alias("ccos"),
    )
    wc = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cid"))
    return scored.withColumn("crk", F.row_number().over(wc))


def ivf_topk(
    emb: DataFrame,
    k: int = 5,
    query_mod: int = 50,
    n_cells: int | None = None,
    nprobe: int = 2,
    refine_iters: int = 0,
    cents: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: coarse-quantize the corpus into cells,
    probe the query's ``nprobe`` nearest cells, exact re-rank inside.

    The scale anatomy (classic IVF, e.g. Faiss's IndexIVFFlat):
    - codebook: ``n_cells ≈ √N`` hash-stratified rank-sampled vectors
      (:func:`ivf_codebook`; optional deterministic k-means refinement
      via ``refine_iters``) — n_cells GROWS with the corpus, so cell
      population stays ≈ √N and probe work per query is
      O(nprobe · √N);
    - assignment: broadcast the codebook, one argmax per vector — a
      single O(N·C) map pass, no shuffle beyond the argmax window;
    - search: candidates = equi-join on cell id, so work is
      O(Q · nprobe · N/C) instead of O(Q · N).

    All similarity math is the exact integer-cosine discipline of this
    module; ties break on smaller id, so results are deterministic at
    any parallelism.

    NOTE: with ``n_cells=None`` (the scale-parameterized default),
    n_cells derives from the input's parquet FOOTERS when the plan is
    file-backed (driver-side metadata, no job — an upper bound on N is
    recall-safe: marginally more cells, same nprobe); only a
    non-file-backed input falls back to ONE count() job at
    plan-construction time. Pin ``n_cells`` to stay fully lazy always.
    """
    prep = _persist(_prepared(emb))
    if cents is None:
        if n_cells is None:
            n_cells = max(4, math.isqrt(_corpus_rows(emb, prep)))
        cents = ivf_codebook(prep, n_cells)
        if refine_iters:
            cents = kmeans_refine(prep, cents, iters=refine_iters)
    cents = F.broadcast(cents.select("cid", "cqv", "cnrm"))
    ranked = _assign_cells(prep, cents)
    cell = ranked.filter(F.col("crk") == 1).select("vec_id", "cid")
    qprobe = (
        ranked.filter(
            (F.col("crk") <= nprobe)
            & (F.pmod(F.col("vec_id"), F.lit(query_mod)) == 0)
        ).select(F.col("vec_id").alias("q_id"), "cid")
    )
    cand = qprobe.join(cell, "cid").filter(F.col("vec_id") != F.col("q_id"))
    return _rerank_topk(cand, prep, k)


def _rerank_topk(cand: DataFrame, prep: DataFrame, k: int) -> DataFrame:
    """Exact integer-cosine re-rank of (q_id, vec_id) candidates →
    per-query top-k (tie → smaller vec_id)."""
    scored = (
        cand.join(
            prep.select(
                F.col("vec_id").alias("q_id"),
                F.col("qv").alias("q_qv"),
                F.col("nrm").alias("q_nrm"),
            ),
            "q_id",
        )
        .join(prep, "vec_id")
        .select(
            "q_id",
            "vec_id",
            (
                int_dot(F.col("q_qv"), F.col("qv"))
                / F.sqrt((F.col("q_nrm") * F.col("nrm")).cast("double"))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "vec_id", "cos", "rk")
    )


def ann_lsh_topk(
    emb: DataFrame,
    k: int = 5,
    query_mod: int = 50,
    bands: int = 4,
    r: int | None = None,
    target_bucket: int = ANN_TARGET_BUCKET,
    multiprobe: int = 1,
) -> DataFrame:
    """ANN: banded-SRP candidates + exact integer-cosine re-rank, with
    the band-key width DERIVED FROM CORPUS SIZE and multiprobe recall
    recovery.

    Candidate generation: each vector gets `bands` keys of ``r`` sign
    bits (``r = derive_r(N)`` unless pinned), so the key space per band
    is ~N/target_bucket and the expected bucket holds ~target_bucket
    vectors AT ANY N — the corpus fraction kept as candidates shrinks
    as 1/keyspace instead of staying constant (round-2's fixed 4-bit
    keys kept ≈ 1-(15/16)^4 ≈ 23% of the corpus per query; the derived
    keys keep bands·(1+r)·target_bucket vectors, a few-per-million at
    10^9). Narrow keys alone would cost recall; each query therefore
    ALSO probes every band key at Hamming distance ≤ ``multiprobe``
    (=1: the r single-bit flips — classic multi-probe LSH), which
    multiplies query-side probes by (1+r) but adds no corpus-side
    state. Candidate fraction + recall are measured in
    tests/test_similarity_lsh.py on a planted 10^5-vector corpus.

    Candidates carry only ids through the join; vectors re-attach for
    the exact re-rank.

    NOTE: with ``r=None`` (the scale-parameterized default), r derives
    from the input's parquet FOOTERS when the plan is file-backed
    (driver-side metadata, no job — the footer sum is an upper bound on
    N, which only widens keys: smaller buckets, recall recovered by
    multiprobe); only a non-file-backed input falls back to ONE
    count() job at plan-construction time. Pin ``r`` to stay fully
    lazy always."""
    prep = _persist(_prepared(emb))
    if r is None:
        r = derive_r(_corpus_rows(emb, prep), target_bucket)
    cand = ann_lsh_candidates(prep, query_mod, bands, r, multiprobe)
    return _rerank_topk(cand, prep, k)


def ann_lsh_candidates(
    prep: DataFrame,
    query_mod: int,
    bands: int,
    r: int,
    multiprobe: int = 1,
) -> DataFrame:
    """Candidate (q_id, vec_id) pairs for :func:`ann_lsh_topk` —
    exposed so tests can measure the candidate FRACTION independently
    of the re-rank."""
    # persisted: both the corpus side and the query-probe side consume it
    banded = _persist(srp_banded_arrow(prep, bands, r))
    return lsh_candidates_from_banded(banded, query_mod, r, multiprobe)


def lsh_candidates_from_banded(
    banded: DataFrame,
    query_mod: int,
    r: int,
    multiprobe: int = 1,
) -> DataFrame:
    """Candidates from an EXISTING (vec_id, band, key) banded relation —
    shared by the fresh-compute path above and the persistent index
    (plans/vector_index.py), which serves the relation from storage.
    Each query probes every band key at Hamming distance ≤
    ``multiprobe``: all Σ_{d≤multiprobe} C(r,d) bit-flip masks are
    enumerated at plan time (multiprobe=1 → the classic r single-bit
    flips; capped at 3 — beyond that the probe count approaches the
    key space and brute force wins)."""
    import itertools

    if multiprobe > 3:
        raise ValueError(
            f"multiprobe={multiprobe} > 3: C({r},{multiprobe}) probes per "
            "key approaches the key space — use a wider target_bucket "
            "or the brute-force baseline instead"
        )
    qb = banded.filter(F.pmod(F.col("vec_id"), F.lit(query_mod)) == 0).select(
        F.col("vec_id").alias("q_id"), "band", "key"
    )
    masks = [0]
    for d in range(1, multiprobe + 1):
        for combo in itertools.combinations(range(r), d):
            m = 0
            for j in combo:
                m |= 1 << j
            masks.append(m)
    if len(masks) > 1:
        probe_keys = F.array(
            *[F.col("key").bitwiseXOR(F.lit(m)).cast("long") for m in masks]
        )
    else:
        probe_keys = F.array(F.col("key"))
    probes = qb.select(
        "q_id", "band", F.explode(probe_keys).alias("key")
    )
    return (
        banded.join(F.broadcast(probes), ["band", "key"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id")
        .dropDuplicates(["q_id", "vec_id"])
    )
