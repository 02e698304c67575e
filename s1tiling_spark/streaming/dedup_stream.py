"""Streaming exact dedup with bounded state: duplicate sequence rows
(same doc_id, e.g. a producer retry re-delivering a batch) are dropped
across micro-batches inside the watermark horizon.

The reference's analog is the "product already processed won't
retrigger" rule (`/root/reference/s1tiling/libs/otbpipeline.py:749-756`
product-existence pruning): an input seen twice must not produce twice.
In Structured Streaming that is ``dropDuplicatesWithinWatermark`` —
state holds one entry per key ONLY until the event-time watermark
passes it, so state is O(keys-per-horizon), not O(all keys ever) — the
property that keeps a 10^12-row stream's dedup state bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from s1tiling_spark.streaming.rollup_stream import SEQ_SCHEMA


def streaming_dedup(
    spark: SparkSession,
    landing_dir: str,
    watermark: str = "30 minutes",
) -> DataFrame:
    """File-source stream → watermarked exact dedup on doc_id."""
    stream = spark.readStream.schema(SEQ_SCHEMA).parquet(landing_dir)
    return stream.withWatermark("event_ts", watermark).dropDuplicatesWithinWatermark(
        ["doc_id"]
    )
