"""Multi-format ingestion parity: the same sequence table written as
parquet / JSON-lines / CSV must read back schema-identical and produce
IDENTICAL tier rollups (format-oblivious downstream operators)."""

from __future__ import annotations

import pytest

from s1tiling_spark.operators.rollup import rollup_sequences
from s1tiling_spark.sources.formats import read_sequences, write_sequences
from s1tiling_spark.sources.synth import synth_sequences
from tests.helpers import assert_frames_match

N = 1500


@pytest.fixture(scope="module")
def seq(spark):
    return synth_sequences(spark, N).cache()


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv"])
def test_roundtrip_schema_and_rollup_parity(spark, seq, tmp_path_factory, fmt):
    path = str(tmp_path_factory.mktemp("fmt") / f"seq_{fmt}")
    write_sequences(seq, path, fmt)
    back = read_sequences(spark, path, fmt)
    assert dict(back.dtypes) == dict(seq.dtypes)
    got = rollup_sequences(back, "1h").toPandas()
    want = rollup_sequences(seq, "1h").toPandas()
    assert_frames_match(got, want)


def test_csv_tokens_roundtrip_exact(spark, seq, tmp_path):
    """Token arrays survive the CSV string hop exactly (the pass-through
    invariant across the weakest wire format)."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "seq_csv_exact")
    write_sequences(seq, path, "csv")
    back = read_sequences(spark, path, "csv")

    def digests(df):
        return {
            r["doc_id"]: r["d"]
            for r in df.select(
                "doc_id",
                F.md5(
                    F.concat_ws(",", F.col("tokens").cast("array<string>"))
                ).alias("d"),
            ).collect()
        }

    assert digests(back) == digests(seq)


def test_csv_preserves_null_token_arrays(spark, tmp_path):
    """NULL tokens must survive the CSV hop as NULL (not fold to []) —
    format-oblivious pipelines branch on size(tokens) = -1 vs 0."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            ("d-null", None, 0, "src", "2024-01-01 00:00:00"),
            ("d-empty", [], 0, "src", "2024-01-01 00:00:01"),
            ("d-full", [1, 2, 3], 3, "src", "2024-01-01 00:00:02"),
        ],
        "doc_id string, tokens array<int>, n_tok int, source string, event_ts string",
    ).withColumn("event_ts", F.col("event_ts").cast("timestamp"))
    path = str(tmp_path / "nulls_csv")
    write_sequences(df, path, "csv")
    back = {
        r["doc_id"]: r["tokens"]
        for r in read_sequences(spark, path, "csv").collect()
    }
    assert back == {"d-null": None, "d-empty": [], "d-full": [1, 2, 3]}


def test_chunking_empty_and_remainder(spark):
    """Chunking edge semantics: n_tok=0 emits NO chunks (the
    descending-sequence phantom guard); remainders form a short tail."""
    from s1tiling_spark.operators.textstats import chunk_token_arrays

    df = spark.createDataFrame(
        [
            ("empty", "s", [], 0),
            ("exact", "s", list(range(4)), 4),
            ("tail", "s", list(range(5)), 5),
        ],
        "doc_id string, source string, tokens array<int>, n_tok int",
    )
    rows = chunk_token_arrays(df, max_len=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_id"], r["n_chunk_tok"]))
    assert "empty" not in by_doc
    assert sorted(by_doc["exact"]) == [(0, 4)]
    assert sorted(by_doc["tail"]) == [(0, 4), (1, 1)]


def test_compact_refuses_wrong_sketch_keys(spark, tmp_path):
    """Compacting a long-form sketch tier without its bin key must be
    REFUSED (it would physically delete all but one counter/group)."""
    import pytest
    from pyspark.sql import functions as F

    from s1tiling_spark.plans.store import TierStore

    store = TierStore(spark, str(tmp_path / "guard"))
    hist = spark.createDataFrame(
        [("2024-01-01 00:00:00", "s", 0, 5), ("2024-01-01 00:00:00", "s", 1, 7)],
        "bucket_start string, source string, bin int, tok_cnt long",
    ).withColumn("bucket_start", F.col("bucket_start").cast("timestamp"))
    store.append("hist_1h", hist, store.next_commit_seq(), "r0")
    with pytest.raises(ValueError, match="sketch key"):
        store.compact("hist_1h")  # default keys lack 'bin'
    stats = store.compact("hist_1h", keys=("bucket_start", "source", "bin"))
    assert stats["rows"] == 2
