"""Watermarked stream-stream interval join: live calibration of a
sequence stream against a late-arriving per-source calibration stream.

The batch engine's 1:N calibration join (sigma0 x sin(LIA),
`catalog/relational.py` — reference analog
`/root/reference/s1tiling/libs/otbwrappers/lia.py:1540-1620`, where
every sigma0 product joins the per-(tile, orbit) LIA map) becomes, in
continuous operation, a STREAM-STREAM join: sequences arrive on one
stream, calibration rows (one per source per validity window) on
another, and neither side is complete when the other's rows show up.

Spark-first shape: two watermarked streams + an event-time interval
condition. Structured Streaming buffers each side in state ONLY until
the other side's watermark passes the interval bound, so state is
O(in-flight interval), not O(stream) — the well-known bounded
stream-stream join. Late rows on either side (within watermark) still
join exactly; rows later than the watermark age out of state and are
dropped, the documented trade every watermarked operator here makes.

No per-row Python: the join condition and the applied gain are pure
Catalyst expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from s1tiling_spark.streaming.rollup_stream import SEQ_SCHEMA

CAL_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("valid_from", TimestampType()),
        StructField("gain", DoubleType()),
    ]
)


def streaming_calibration_join(
    spark: SparkSession,
    seq_landing: str,
    cal_landing: str,
    watermark: str = "10 minutes",
    validity: str = "1 hour",
    reader_options: dict | None = None,
    how: str = "inner",
) -> DataFrame:
    """Sequences joined to the calibration row whose validity window
    ``[valid_from, valid_from + validity)`` covers their ``event_ts``
    (same source). Inner join: a sequence with no covering calibration
    row is held in state until the calibration watermark passes its
    bound, then dropped — exactly the batch inner-join semantics, which
    is what the convergence test asserts.

    ``how="left_outer"``: the production no-silent-drop variant —
    a sequence whose calibration never arrives EMITS once the
    calibration-side watermark proves no match can still come, with
    ``gain``/``cal_n_tok`` NULL (the streaming analog of the mosaic
    first-non-null fallback: downstream sees the row either way and
    NULL marks it uncalibrated). Matched rows are identical to the
    inner join; the null-emission time is watermark-driven, so a
    bounded replay emits exactly the rows whose join bound the final
    watermark passed (asserted in the test).

    OPERATIONAL REQUIREMENT (outer mode): Spark's multi-stream
    watermark is the MIN across watermarked inputs, and on a query
    restart each input's watermark is recomputed from the data that
    run sees (floored by the restored global) — an IDLE calibration
    stream therefore pins the global watermark and stalls null
    emission indefinitely (measured across availableNow restarts). A
    production deployment must keep the calibration side flowing
    (periodic heartbeat rows are enough), or opt into
    ``spark.sql.streaming.multipleWatermarkPolicy=max`` and accept
    the late-drop trade on the slower stream.

    Emits the calibrated row: sequence columns + ``gain`` +
    ``cal_n_tok = round(n_tok * gain)`` (bigint — exact integer
    comparisons in the oracle/tests, the engine-wide discipline).

    State bound: each side is retained only while the OTHER side's
    watermark can still produce a match — Spark derives the retention
    from the interval condition, so state is O(rows per validity
    window), independent of total stream length."""
    reader_s = spark.readStream.schema(SEQ_SCHEMA)
    reader_c = spark.readStream.schema(CAL_SCHEMA)
    for k, v in (reader_options or {}).items():
        reader_s = reader_s.option(k, v)
        reader_c = reader_c.option(k, v)
    seq = (
        reader_s.parquet(seq_landing)
        .withWatermark("event_ts", watermark)
        .alias("s")
    )
    cal = (
        reader_c.parquet(cal_landing)
        .withWatermark("valid_from", watermark)
        .alias("c")
    )
    joined = seq.join(
        cal,
        F.expr(
            "s.source = c.source "
            "AND s.event_ts >= c.valid_from "
            f"AND s.event_ts < c.valid_from + INTERVAL {validity}"
        ),
        how,
    )
    return joined.select(
        F.col("s.doc_id").alias("doc_id"),
        F.col("s.source").alias("source"),
        F.col("s.event_ts").alias("event_ts"),
        F.col("s.n_tok").alias("n_tok"),
        F.col("c.gain").alias("gain"),
        F.round(F.col("s.n_tok") * F.col("c.gain")).cast("long").alias("cal_n_tok"),
    )


def run_calibration_join_stream(
    spark: SparkSession,
    seq_landing: str,
    cal_landing: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
    validity: str = "1 hour",
    available_now: bool = True,
    how: str = "inner",
):
    """Drive the join to a parquet sink (append mode — stream-stream
    inner joins emit each match exactly once, so the sink accretes the
    exact join result across restarts via the checkpoint)."""
    joined = streaming_calibration_join(
        spark, seq_landing, cal_landing, watermark=watermark,
        validity=validity, how=how,
    )
    writer = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
