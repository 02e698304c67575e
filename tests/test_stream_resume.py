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
