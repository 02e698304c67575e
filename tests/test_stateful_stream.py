"""Stateful gap detector: two deliveries; state carries the last hour
across micro-batches so cross-batch gaps are caught."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from s1tiling_spark.streaming.rollup_stream import SEQ_SCHEMA
from s1tiling_spark.streaming.stateful import gap_detector_stream


def _write_rows(spark, path, rows):
    df = spark.createDataFrame(
        [
            (f"d{i}", [1, 2], 2, src, datetime.fromisoformat(ts))
            for i, (src, ts) in enumerate(rows)
        ],
        schema=SEQ_SCHEMA,
    )
    df.write.mode("append").parquet(path)


def test_gap_detector(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: hours 00,01 for A; batch 2 later adds 04 (gap 02,03) and
    # B starts fresh at 10 (no gap emitted for a first observation)
    _write_rows(
        spark,
        landing,
        [("A", "2024-01-01 00:10:00"), ("A", "2024-01-01 01:20:00")],
    )

    def run_once():
        stream = spark.readStream.schema(SEQ_SCHEMA).parquet(landing)
        tier = stream.select(
            F.date_trunc("hour", "event_ts").alias("bucket_start"), "source"
        )
        q = (
            gap_detector_stream(tier)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)

    run_once()
    _write_rows(
        spark,
        landing,
        [("A", "2024-01-01 04:05:00"), ("B", "2024-01-01 10:00:00")],
    )
    run_once()

    got = spark.read.parquet(out_dir).collect()
    gaps = {(r["source"], str(r["gap_hour"]), r["gap_len_hours"]) for r in got}
    assert gaps == {("A", "2024-01-01 02:00:00", 2)}
