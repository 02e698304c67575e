"""Multi-format ingestion for the sequence table: parquet (canonical),
JSON-lines, and CSV — the "every source a user ingests from" breadth of
a training-data pipeline (the reference's analog: SAFE zip / GeoTIFF /
VRT inputs all normalizing into one product model,
`/root/reference/s1tiling/libs/S1FileManager.py:1056-1146`).

Semantics: whatever the wire format, the table that comes back is
SCHEMA-IDENTICAL to the canonical parquet table — same column names,
same types (`doc_id string, tokens array<int>, n_tok int, source
string, event_ts timestamp`) — so every downstream operator is
format-oblivious. CSV cannot carry arrays or microsecond timestamps
natively, so tokens travel as a comma-joined string and are re-parsed
on read (exact integer round-trip; empty arrays round-trip via the
empty string, NULL arrays via an explicit nullValue marker so NULL and
[] stay distinct like they do in parquet/JSON), and event_ts
serializes as ISO-8601 with microseconds.

Scale notes: all three readers are Spark file sources — partition
discovery, predicate/column pushdown (parquet), and schema enforcement
(`FAILFAST`) come from the DataSource framework; JSON/CSV scans are
schema-pinned (never inferSchema — a second pass over 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEQ_DDL = (
    "doc_id string, tokens array<int>, n_tok int, source string, "
    "event_ts timestamp"
)
_CSV_DDL = (
    "doc_id string, tokens_csv string, n_tok int, source string, "
    "event_ts timestamp"
)
_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def write_sequences(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Write a sequence table in `fmt` ∈ {parquet, json, csv}."""
    if fmt == "parquet":
        df.write.mode("overwrite").parquet(path)
    elif fmt == "json":
        df.write.mode("overwrite").json(path)
    elif fmt == "csv":
        out = df.select(
            "doc_id",
            # NULL arrays stay NULL (concat_ws would fold them to ''
            # and silently become empty arrays on read)
            F.when(
                F.col("tokens").isNull(), F.lit(None).cast("string")
            ).otherwise(
                F.concat_ws(",", F.col("tokens").cast("array<string>"))
            ).alias("tokens_csv"),
            "n_tok",
            "source",
            F.date_format("event_ts", _TS_FMT).alias("event_ts"),
        )
        out.write.mode("overwrite").option("header", "true").option(
            "nullValue", "\\N"
        ).csv(path)
    else:
        raise ValueError(f"unknown format {fmt!r}")


def read_sequences(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Read a sequence table back with the CANONICAL schema regardless
    of wire format."""
    if fmt == "parquet":
        return spark.read.schema(SEQ_DDL).parquet(path)
    if fmt == "json":
        return (
            spark.read.schema(SEQ_DDL)
            .option("mode", "FAILFAST")
            .json(path)
            .select("doc_id", "tokens", "n_tok", "source", "event_ts")
        )
    if fmt == "csv":
        raw = (
            spark.read.schema(_CSV_DDL)
            .option("header", "true")
            .option("mode", "FAILFAST")
            .option("timestampFormat", _TS_FMT)
            .option("nullValue", "\\N")
            .csv(path)
        )
        tokens = (
            F.when(F.col("tokens_csv").isNull(), F.lit(None).cast("array<int>"))
            .when(F.length("tokens_csv") == 0, F.array().cast("array<int>"))
            .otherwise(
                F.transform(F.split("tokens_csv", ","), lambda x: x.cast("int"))
            )
        )
        return raw.select(
            "doc_id",
            tokens.alias("tokens"),
            "n_tok",
            "source",
            "event_ts",
        )
    raise ValueError(f"unknown format {fmt!r}")
