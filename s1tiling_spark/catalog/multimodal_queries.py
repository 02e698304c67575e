"""Multimodal queries — genuinely non-SQL-expressible (binary codec
kernels), so registered WITHOUT oracles: the driver records rows-only
checks; exact value verification lives in tests/test_multimodal.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from s1tiling_spark.operators.multimodal import (
    extract_features,
    media_stats_by_kind,
    synth_media,
)
from s1tiling_spark.registry import register

_N_MEDIA = 500


@register("media_features")  # rows-only
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_features(synth_media(spark, _N_MEDIA))


@register("media_stats_by_kind")  # rows-only
def media_stats_by_kind_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_stats_by_kind(extract_features(synth_media(spark, _N_MEDIA)))
