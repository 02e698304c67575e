"""Streaming gap-fill == batch gap-fill, bit-for-bit.

The stateful operator emits a gap's filled rows in the micro-batch
that delivers the gap's CLOSING anchor (interpolation needs the next
real point), so on in-order delivery the collected stream output must
equal the batch densify → locf → linear_interpolate chain exactly —
including the IEEE doubles of the interpolated column. Gaps here are
arranged to close ACROSS micro-batch boundaries so the state handoff
(last anchor per source) is what's under test, and the second delivery
re-enters through the checkpoint (resume path).
"""

from __future__ import annotations

from datetime import datetime

from s1tiling_spark.operators.gapfill import densify, linear_interpolate, locf
from s1tiling_spark.streaming.stateful import gapfill_stream

TIER_SCHEMA = (
    "source string, bucket_start timestamp, cnt long, "
    "sum_n_tok long, avg_n_tok double"
)

# interior gaps: A has a 2h gap closed in batch 2 and a 3h gap closed
# in batch 3; B is dense then gaps inside a single delivery; C is a
# single point (no grid, no fill — in batch OR stream)
ROWS = [
    # (source, ts, cnt, sum, avg)            delivery
    ("A", "2024-03-01 00:00:00", 4, 400, 100.0),  # 1
    ("A", "2024-03-01 01:00:00", 6, 540, 90.0),  # 1
    ("A", "2024-03-01 04:00:00", 2, 260, 130.0),  # 2  closes 02,03
    ("A", "2024-03-01 08:00:00", 5, 355, 71.0),  # 3  closes 05,06,07
    ("B", "2024-03-01 00:00:00", 1, 17, 17.0),  # 1
    ("B", "2024-03-01 03:00:00", 3, 99, 33.0),  # 1  closes 01,02
    ("B", "2024-03-01 05:00:00", 2, 34, 17.3),  # 2  closes 04
    ("C", "2024-03-01 02:00:00", 9, 900, 100.0),  # 2
]
DELIVERIES = [ROWS[0:2] + ROWS[4:6], [ROWS[2], ROWS[6], ROWS[7]], [ROWS[3]]]


def _tier_df(spark, rows):
    return spark.createDataFrame(
        [(s, datetime.fromisoformat(ts), c, n, a) for s, ts, c, n, a in rows],
        schema=TIER_SCHEMA,
    )


def _batch_reference_rows(spark, rows):
    tier = _tier_df(spark, rows)
    filled = locf(densify(tier, "1h"), ["cnt", "sum_n_tok"])
    return linear_interpolate(filled, "avg_n_tok").select(
        "source", "bucket_start", "cnt", "sum_n_tok", "avg_n_tok", "gap_filled"
    )


def _batch_reference(spark):
    return _batch_reference_rows(spark, ROWS)


def _as_set(rows):
    return {
        (r["source"], str(r["bucket_start"]), r["cnt"], r["sum_n_tok"],
         r["avg_n_tok"], r["gap_filled"])
        for r in rows
    }


def test_gapfill_stream_equals_batch(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.schema(TIER_SCHEMA).parquet(landing)
        q = (
            gapfill_stream(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)

    for delivery in DELIVERIES:
        _tier_df(spark, delivery).write.mode("append").parquet(landing)
        run_once()

    got = _as_set(spark.read.parquet(out_dir).collect())
    want = _as_set(_batch_reference(spark).collect())
    assert got == want
    # the gaps really were filled (not a trivially dense input)
    assert sum(1 for r in want if r[5]) == 8


def test_gapfill_stream_drops_late_out_of_order(spark, tmp_path):
    """A row older than the source's last anchor cannot be retracted in
    append mode: it is dropped, everything already emitted stands."""
    landing = str(tmp_path / "landing")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.schema(TIER_SCHEMA).parquet(landing)
        q = (
            gapfill_stream(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)

    on_time = [
        ("A", "2024-03-01 00:00:00", 4, 400, 100.0),
        ("A", "2024-03-01 02:00:00", 6, 540, 90.0),
    ]
    late = [("A", "2024-03-01 01:00:00", 9, 999, 111.0)]
    _tier_df(spark, on_time).write.mode("append").parquet(landing)
    run_once()
    _tier_df(spark, late).write.mode("append").parquet(landing)
    run_once()

    got = _as_set(spark.read.parquet(out_dir).collect())
    want = _as_set(_batch_reference_rows(spark, on_time).collect())
    assert got == want
