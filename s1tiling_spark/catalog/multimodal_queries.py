"""Multimodal queries.

- ``media_features``: the codec boundary is a deterministic byte
  interpretation of an md5-block payload (operators/multimodal.py), so
  every extracted feature IS SQL-expressible: the oracle re-derives the
  payload bytes in DuckDB (md5 hex blocks → 2-hex-char byte slices) and
  recomputes byte stats, the 16-bin histogram, the stride-resampled
  thumbnail and the video frame checksums — the analog of the
  reference's 1e-12 golden image compare
  (`/root/reference/tests/helpers.py:40-49`). Array outputs are
  emitted as deterministic digests so the driver's canonicalizer can
  sort them; the thumbnail digest is taken over the exactly-recovered
  integer bytes (``round(x*255)``) so no float-formatting ambiguity
  enters the hash.
- ``media_stats_by_kind``: downstream aggregate over the same table,
  exact integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s1tiling_spark.operators.multimodal import (
    FRAME_SIZE,
    MEDIA_KINDS,
    N_BYTE_BINS,
    RESIZE_LEN,
    extract_features,
    media_stats_by_kind,
    synth_media,
    synth_media_oracle_cte,
)
from s1tiling_spark.registry import register

_N_MEDIA = 500
_SEED = 42

_MD5L = "CAST(('0x' || substr(md5(CAST(id AS VARCHAR) || '{sfx}'), 1, 15)) AS BIGINT)"


def _media_bytes_cte(n_rows: int, seed: int) -> str:
    """DuckDB CTEs reconstructing synth_media's payload BYTES per row:
    ids (id, media_id, kind, n_bytes) and bytes (id, pos, b)."""
    hk = _MD5L.format(sfx=f":k:{seed}")
    hb = _MD5L.format(sfx=f":b:{seed}")
    kinds = ", ".join(f"'{k}'" for k in MEDIA_KINDS)
    return f"""
ids AS (
  SELECT id,
    'm-' || format('{{:08d}}', id) AS media_id,
    ([{kinds}])[CAST({hk} % {len(MEDIA_KINDS)} AS INT) + 1] AS kind,
    CAST({hb} % 240 + 16 AS INT) AS n_blocks,
    CAST(({hb} % 240 + 16) * 16 AS INT) AS n_bytes
  FROM range({n_rows}) t(id)),
blocks AS (
  -- decorrelated block expansion: cross join the max block range and
  -- filter (correlated unnest(range(...)) trips a DuckDB binder bug)
  SELECT ids.id, u.i,
    md5(CAST(ids.id AS VARCHAR) || '#' || CAST(u.i AS VARCHAR)) AS h
  FROM ids CROSS JOIN range(1, 256) u(i)
  WHERE u.i <= ids.n_blocks),
bytes AS (
  SELECT blocks.id,
    (i - 1) * 16 + v.j AS pos,
    CAST(('0x' || substr(h, CAST(2 * v.j + 1 AS INT), 2)) AS INT) AS b
  FROM blocks, range(16) v(j))
"""


def _media_features_oracle(n_rows: int, seed: int) -> str:
    return f"""
WITH {_media_bytes_cte(n_rows, seed)},
stats AS (
  SELECT id, CAST(sum(b) AS BIGINT) AS s, CAST(sum(b * b) AS BIGINT) AS sq
  FROM bytes GROUP BY id),
hist AS (
  SELECT i.id, g.bin,
    CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt
  FROM ids i
  CROSS JOIN range({N_BYTE_BINS}) g(bin)
  LEFT JOIN (SELECT id, b // 16 AS bin, count(*) AS cnt
             FROM bytes GROUP BY 1, 2) c
    ON c.id = i.id AND c.bin = g.bin),
hist_d AS (
  SELECT id, md5(array_to_string(list(cnt ORDER BY bin), ',')) AS byte_hist_digest
  FROM hist GROUP BY id),
thumb AS (
  SELECT i.id, w.k, bt.b
  FROM ids i
  CROSS JOIN range({RESIZE_LEN}) w(k)
  JOIN bytes bt ON bt.id = i.id AND bt.pos = (w.k * i.n_bytes) // {RESIZE_LEN}),
thumb_d AS (
  SELECT id, md5(array_to_string(list(b ORDER BY k), ',')) AS thumb_digest
  FROM thumb GROUP BY id),
vids AS (
  SELECT id, n_bytes // {FRAME_SIZE} AS n_frames,
    (n_bytes // {FRAME_SIZE} + 3) // 4 AS n_ck
  FROM ids WHERE kind = 'video'),
cks AS (
  SELECT v.id, u.c, CAST(sum(bt.b) AS BIGINT) AS ck
  FROM vids v
  CROSS JOIN range(0, 4) u(c)
  JOIN bytes bt ON bt.id = v.id
    AND bt.pos >= u.c * 4 * {FRAME_SIZE}
    AND bt.pos < u.c * 4 * {FRAME_SIZE} + {FRAME_SIZE}
  WHERE u.c < v.n_ck
  GROUP BY v.id, u.c),
cks_d AS (
  SELECT id, md5(array_to_string(list(ck ORDER BY c), ',')) AS frame_checksums_digest
  FROM cks GROUP BY id)
SELECT i.media_id, i.kind, i.n_bytes,
  round(CAST(s.s AS DOUBLE) / i.n_bytes, 9) AS byte_mean,
  round(sqrt(greatest(CAST(s.sq AS DOUBLE) / i.n_bytes
    - (CAST(s.s AS DOUBLE) / i.n_bytes) * (CAST(s.s AS DOUBLE) / i.n_bytes),
    0.0)), 9) AS byte_std,
  h.byte_hist_digest,
  t.thumb_digest,
  CAST(CASE WHEN i.kind = 'video' THEN i.n_bytes // {FRAME_SIZE} ELSE 0 END AS INT)
    AS n_frames,
  coalesce(c.frame_checksums_digest, md5('')) AS frame_checksums_digest
FROM ids i
JOIN stats s ON s.id = i.id
JOIN hist_d h ON h.id = i.id
JOIN thumb_d t ON t.id = i.id
LEFT JOIN cks_d c ON c.id = i.id
"""


@register("media_features", oracle=_media_features_oracle(_N_MEDIA, _SEED))
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = extract_features(synth_media(spark, _N_MEDIA, seed=_SEED))

    def digest_long(col: str) -> F.Column:
        return F.md5(F.concat_ws(",", F.col(col).cast("array<string>"))).alias(
            f"{col}_digest"
        )

    # thumbnail digest over the exactly-recovered integer bytes —
    # double→string formatting differs across engines, round(x*255)
    # does not (the /255.0 quantization is exactly invertible).
    thumb_ints = F.transform(
        F.col("thumb"), lambda x: F.round(x * 255).cast("int")
    )
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.round("byte_mean", 9).alias("byte_mean"),
        F.round("byte_std", 9).alias("byte_std"),
        digest_long("byte_hist"),
        F.md5(F.concat_ws(",", thumb_ints.cast("array<string>"))).alias(
            "thumb_digest"
        ),
        "n_frames",
        digest_long("frame_checksums"),
    )


_STATS_ORACLE = f"""
WITH {synth_media_oracle_cte(_N_MEDIA)}
SELECT kind, count(*) AS n_media,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       CAST(min(n_bytes) AS INT) AS min_bytes,
       CAST(max(n_bytes) AS INT) AS max_bytes
FROM media GROUP BY kind
"""


@register("media_stats_by_kind", oracle=_STATS_ORACLE)
def media_stats_by_kind_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_stats_by_kind(extract_features(synth_media(spark, _N_MEDIA)))
