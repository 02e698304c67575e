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
