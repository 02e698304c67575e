"""Multimodal queries.

- ``media_features``: the codec kernel itself is non-SQL-expressible
  (binary decode boundary), so it registers WITHOUT an oracle — the
  driver records a rows-only check; exact value verification lives in
  tests/test_multimodal.py (numpy cross-check per row). Array outputs
  are emitted as deterministic digests so the driver's canonicalizer
  can sort them.
- ``media_stats_by_kind``: the downstream aggregate is exact integer
  arithmetic over md5-derived sizes, so it gets a full DuckDB oracle
  (synth_media_oracle_cte reproduces the synth derivation in SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s1tiling_spark.operators.multimodal import (
    extract_features,
    media_stats_by_kind,
    synth_media,
    synth_media_oracle_cte,
)
from s1tiling_spark.registry import register

_N_MEDIA = 500


@register("media_features")  # rows-only: codec kernel has no SQL analog
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = extract_features(synth_media(spark, _N_MEDIA))

    def digest(col: str) -> F.Column:
        return F.md5(F.concat_ws(",", F.col(col).cast("array<string>"))).alias(
            f"{col}_digest"
        )

    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.round("byte_mean", 9).alias("byte_mean"),
        F.round("byte_std", 9).alias("byte_std"),
        digest("byte_hist"),
        digest("thumb"),
        "n_frames",
        digest("frame_checksums"),
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
