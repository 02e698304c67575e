"""Stream-stream interval join: out-of-order deliveries on BOTH sides
must converge to the exact batch inner-join result.

The calibration stream arrives late relative to the sequences it
calibrates (and vice versa in the second delivery) — the buffered
stream-stream state must hold each side until the other catches up,
then emit every match exactly once (append sink accretes the exact
join; a duplicate emission or a dropped pending row breaks equality).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from s1tiling_spark.sources.synth import synth_sequences
from s1tiling_spark.streaming.join_stream import run_calibration_join_stream

N = 2000


def _calibration(seq):
    """One calibration row per (source, hour) present in seq — gain is
    a deterministic function of the pair, exact in float64."""
    return (
        seq.select(
            "source", F.date_trunc("hour", "event_ts").alias("valid_from")
        )
        .distinct()
        .withColumn(
            "gain",
            1.0
            + (F.pmod(F.xxhash64("source", "valid_from"), F.lit(16)))
            .cast("double")
            / F.lit(16.0),
        )
    )


def _batch_expected(seq, cal):
    return (
        seq.alias("s")
        .join(
            cal.alias("c"),
            F.expr(
                "s.source = c.source AND s.event_ts >= c.valid_from "
                "AND s.event_ts < c.valid_from + INTERVAL 1 HOUR"
            ),
            "inner",
        )
        .select(
            F.col("s.doc_id").alias("doc_id"),
            F.col("s.source").alias("source"),
            F.col("s.event_ts").alias("event_ts"),
            F.col("s.n_tok").alias("n_tok"),
            F.col("c.gain").alias("gain"),
            F.round(F.col("s.n_tok") * F.col("c.gain"))
            .cast("long")
            .alias("cal_n_tok"),
        )
    )


def test_stream_stream_join_converges_to_batch(spark, tmp_path):
    seq_landing = str(tmp_path / "seq")
    cal_landing = str(tmp_path / "cal")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    seq = synth_sequences(spark, N, with_tokens=False).cache()
    cal = _calibration(seq).cache()

    part_s = F.pmod(F.xxhash64("doc_id"), F.lit(10))
    part_c = F.pmod(F.xxhash64("source", "valid_from"), F.lit(10))

    def run_once():
        q = run_calibration_join_stream(
            spark, seq_landing, cal_landing, out, ckpt,
            watermark="60 days", validity="1 hour",
        )
        q.awaitTermination(240)

    # delivery 1: 60% of sequences, but only 40% of calibration rows —
    # most sequences wait in state for their calibration row
    seq.filter(part_s < 6).write.mode("append").parquet(seq_landing)
    cal.filter(part_c < 4).write.mode("append").parquet(cal_landing)
    run_once()

    # delivery 2: the rest of BOTH sides, out of order — pending
    # sequences from delivery 1 must now match, and late sequences
    # must match calibration rows delivered earlier
    seq.filter(part_s >= 6).write.mode("append").parquet(seq_landing)
    cal.filter(part_c >= 4).write.mode("append").parquet(cal_landing)
    run_once()

    got = spark.read.parquet(out)
    want = _batch_expected(seq, cal)
    assert got.count() == want.count()
    # exact set equality (doc_id unique per seq row; one cal row per
    # (source, hour) makes the join 1:1 here)
    diff = got.unionByName(want).groupBy(got.columns).count().filter(
        F.col("count") != 2
    )
    assert diff.count() == 0, diff.limit(5).collect()


def test_left_outer_emits_uncalibrated_after_watermark(spark, tmp_path):
    """No-silent-drop variant: sequences whose calibration never
    arrives must EMIT with NULL gain once the watermark proves no
    match can come. BOTH streams are split at t_mid and delivered
    across two query restarts — per Spark's min-policy multi-stream
    watermark, an idle side pins the global watermark on restart (the
    per-run operator watermark restarts from that run's data, floored
    by the restored global), so both sides must keep flowing for
    outer results to progress (measured directly; the module
    docstring documents the heartbeat requirement). Assertions are
    watermark-robust: matched rows equal the batch inner join
    exactly; every NULL row is genuinely uncalibrated and emitted
    exactly once; and the early uncalibrated rows (bound far below
    the final watermark) did emit."""
    seq_landing = str(tmp_path / "seq")
    cal_landing = str(tmp_path / "cal")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    seq = synth_sequences(spark, N, with_tokens=False).cache()
    # drop ~30% of calibration groups -> those sequences are uncalibrated
    cal = _calibration(seq).filter(
        F.pmod(F.xxhash64("source", "valid_from"), F.lit(10)) < 7
    ).cache()

    t_mid = seq.agg(
        F.timestamp_seconds(
            (F.min(F.unix_timestamp("event_ts"))
             + F.max(F.unix_timestamp("event_ts"))) / 2
        ).alias("m")
    ).first()["m"]
    t_max = seq.agg(F.max("event_ts").alias("m")).first()["m"]

    def run_once():
        q = run_calibration_join_stream(
            spark, seq_landing, cal_landing, out, ckpt,
            watermark="1 hour", validity="1 hour", how="left_outer",
        )
        q.awaitTermination(240)

    # delivery 1: first half of BOTH streams (one batch each side:
    # watermark only advances AFTER a batch, so nothing inside a
    # delivery is late to itself)
    seq.filter(F.col("event_ts") < F.lit(t_mid)).write.mode("append").parquet(seq_landing)
    cal.filter(F.col("valid_from") < F.lit(t_mid)).write.mode("append").parquet(cal_landing)
    run_once()
    # delivery 2 (restart): the second half of BOTH streams — the
    # global watermark advances past every first-half bound and the
    # buffered uncalibrated rows emit with NULL gain
    seq.filter(F.col("event_ts") >= F.lit(t_mid)).write.mode("append").parquet(seq_landing)
    cal.filter(F.col("valid_from") >= F.lit(t_mid)).write.mode("append").parquet(cal_landing)
    run_once()

    got = spark.read.parquet(out).cache()
    want_inner = _batch_expected(seq, cal).cache()

    # 1) matched rows == batch inner join, exactly
    got_m = got.filter(F.col("gain").isNotNull())
    assert got_m.count() == want_inner.count()
    diff = got_m.unionByName(want_inner).groupBy(got.columns).count().filter(
        F.col("count") != 2
    )
    assert diff.count() == 0, diff.limit(5).collect()

    # 2) every NULL row is genuinely uncalibrated, emitted exactly once
    matched_ids = {r["doc_id"] for r in want_inner.select("doc_id").collect()}
    nulls = got.filter(F.col("gain").isNull()).select("doc_id").collect()
    null_ids = [r["doc_id"] for r in nulls]
    assert len(null_ids) == len(set(null_ids))  # exactly once
    assert not (set(null_ids) & matched_ids)  # no false nulls

    # 3) emission completeness: every uncalibrated row whose bound
    # sits clearly below the final watermark (4h of slack under max
    # event time: 1h watermark + 1h validity + no-data-batch margin)
    # must have emitted
    unmatched = seq.join(want_inner.select("doc_id"), "doc_id", "left_anti")
    must_emit = {
        r["doc_id"]
        for r in unmatched.filter(
            F.col("event_ts") < F.lit(t_max) - F.expr("INTERVAL 4 HOURS")
        ).select("doc_id").collect()
    }
    assert must_emit, "fixture degenerate: no early uncalibrated rows"
    missing = must_emit - set(null_ids)
    assert not missing, f"{len(missing)} uncalibrated rows never emitted"
