"""Streaming kill-and-resume e2e: a file-source rollup stream is
killed MID-RUN (injected sink crash between micro-batches), restarted
from the same checkpoint, and must converge EXACTLY to the batch
rollup — the streaming analog of
test_pipeline.test_crash_between_append_and_checkpoint, mirroring the
reference's restart test
(`/root/reference/tests/test_0200306-NR.py:178-256`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s1tiling_spark.operators.rollup import rollup_sequences
from s1tiling_spark.plans.store import TierStore
from s1tiling_spark.sources.synth import synth_sequences
from s1tiling_spark.streaming.rollup_stream import streaming_rollup_1h
from tests.helpers import assert_frames_match

N = 2400
N_FILES = 6
CRASH_AT_BATCH = 2  # die before committing the 3rd micro-batch


def _start(spark, landing, store, ckpt, crash: bool):
    agg = streaming_rollup_1h(
        spark,
        landing,
        watermark="60 days",
        reader_options={"maxFilesPerTrigger": 1},  # one file per batch
    )

    def sink(batch_df, batch_id):
        if crash and batch_id >= CRASH_AT_BATCH:
            raise RuntimeError("injected crash")  # before any commit
        seq_no = store.next_commit_seq()
        store.append("1h", batch_df, seq_no, f"resume-b{batch_id}")

    return (
        agg.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )


def test_stream_kill_and_resume_converges(spark, tmp_path):
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    seq = synth_sequences(spark, N).cache()
    # N_FILES parquet files → N_FILES micro-batches at 1 file/trigger
    seq.repartition(N_FILES).write.mode("append").parquet(landing)
    store = TierStore(spark, str(tmp_path / "store"))

    # first run: crashes after committing CRASH_AT_BATCH batches
    q = _start(spark, landing, store, ckpt, crash=True)
    with pytest.raises(Exception):
        q.awaitTermination(240)
        q.processAllAvailable()  # pragma: no cover — must have raised
    # the crash left a PARTIAL store (some batches committed, not all)
    partial = store.read("1h").count()
    full = rollup_sequences(seq, "1h")
    assert 0 < partial  # something was committed pre-crash

    # restart from the SAME checkpoint: the failed batch replays
    # (at-least-once), remaining files process, dedup-on-read keeps the
    # newest commit per (bucket, source)
    q2 = _start(spark, landing, store, ckpt, crash=False)
    q2.awaitTermination(240)

    got = store.read("1h").drop("commit_seq", "run_id", "p_date").toPandas()
    want = full.toPandas()
    assert_frames_match(got, want)


def test_counter_stream_crash_after_append_does_not_double_count(spark, tmp_path):
    """The nastiest additive-tier crash: the sink APPENDS a batch's
    counter partials, then dies BEFORE Spark commits the batch to the
    checkpoint. On restart the batch replays (at-least-once) — without
    the idempotency key the replayed append would double-count, since
    the additive read sums every version. With it, the replay is
    skipped, the stateful operator recomputes identical partials from
    its restored state, and the served totals equal the batch operator
    exactly."""
    from datetime import datetime, timedelta

    from s1tiling_spark.operators.rollup import counter_increase
    from s1tiling_spark.streaming.rollup_stream import EVENTS_COUNTER_SCHEMA
    from s1tiling_spark.streaming.stateful import counter_increase_stream

    landing = str(tmp_path / "cc_landing")
    ckpt = str(tmp_path / "cc_ckpt")
    store = TierStore(spark, str(tmp_path / "cc_store"))
    # Spark 4.1's state-store commit-count validation rejects replaying
    # a batch whose state was already committed before the sink crash —
    # but the replay is exactly what at-least-once recovery does, and
    # it is version-safe (the store loads state version N to re-run
    # batch N). Disable the new validation for this crash-injection
    # test; restore afterwards.
    _cv = "spark.sql.streaming.stateStore.commitValidation.enabled"
    old_cv = spark.conf.get(_cv, "true")
    spark.conf.set(_cv, "false")
    base = datetime(2024, 1, 1, 10, 0, 0)

    # 4 files, written in event-time order (counter semantics need
    # per-series in-order delivery across micro-batches); a reset is
    # planted inside file 2
    counters = [[10, 25], [40, 5], [30, 55], [70, 90]]
    all_rows = []
    for i, pair in enumerate(counters):
        rows = [
            ("m1", base + timedelta(minutes=20 * i + 10 * j), 2 * i + j, c)
            for j, c in enumerate(pair)
        ]
        all_rows += rows
        spark.createDataFrame(rows, EVENTS_COUNTER_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(landing)

    def start(crash: bool):
        stream = counter_increase_stream(
            spark.readStream.schema(EVENTS_COUNTER_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )

        def sink(bdf, bid):
            if bdf.isEmpty():
                return
            store.append(
                "c1h", bdf, store.next_commit_seq(), f"cc-b{bid}",
                idempotency_key=f"b{bid}",
            )
            if crash and bid == 1:
                # AFTER the append, BEFORE the checkpoint commit —
                # the replay-double-count window
                raise RuntimeError("injected crash")

        return (
            stream.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(sink)
            .trigger(availableNow=True)
            .start()
        )

    q = start(crash=True)
    with pytest.raises(Exception):
        q.awaitTermination(240)
        q.processAllAvailable()  # pragma: no cover — must have raised
    # the exception can surface to awaitTermination a beat before the
    # query fully detaches; a restart during that window re-runs the
    # OLD (crashing) sink closure for the replayed batch
    import time as _time

    for _ in range(100):
        if not q.isActive:
            break
        _time.sleep(0.1)

    q2 = start(crash=False)
    q2.awaitTermination(240)

    got = {
        (r["series"], str(r["bucket_start"])): (r["increase"], r["n_samples"])
        for r in store.read_summed(
            "c1h", keys=("series", "bucket_start"),
            sum_cols=("increase", "n_samples"),
        ).collect()
    }
    full = spark.createDataFrame(all_rows, EVENTS_COUNTER_SCHEMA)
    want = {
        (r["k"], str(r["bucket_start"])): (r["increase"], r["n_samples"])
        for r in counter_increase(
            full.withColumnRenamed("series", "k"),
            keys=["k"], ts_col="ts", counter_col="counter", tier="1h",
            order_cols=("order_id",),
        ).collect()
    }
    assert got == want
    spark.conf.set(_cv, old_cv)
