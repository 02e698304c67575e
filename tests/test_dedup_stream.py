"""Streaming dedup: a doc re-delivered in a later micro-batch (within
the watermark) is dropped; distinct docs all pass."""

from __future__ import annotations

from datetime import datetime

from s1tiling_spark.streaming.dedup_stream import streaming_dedup
from s1tiling_spark.streaming.rollup_stream import SEQ_SCHEMA


def _write(spark, path, rows):
    df = spark.createDataFrame(
        [
            (doc, [1, 2], 2, "A", datetime.fromisoformat(ts))
            for doc, ts in rows
        ],
        schema=SEQ_SCHEMA,
    )
    df.write.mode("append").parquet(path)


def test_streaming_dedup_across_batches(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            streaming_dedup(spark, landing)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)

    _write(
        spark,
        landing,
        [("d1", "2024-01-01 00:00:00"), ("d2", "2024-01-01 00:05:00")],
    )
    run_once()
    # d1 re-delivered (duplicate, within watermark) + new d3
    _write(
        spark,
        landing,
        [("d1", "2024-01-01 00:00:00"), ("d3", "2024-01-01 00:10:00")],
    )
    run_once()

    got = sorted(r["doc_id"] for r in spark.read.parquet(out_dir).collect())
    assert got == ["d1", "d2", "d3"]
