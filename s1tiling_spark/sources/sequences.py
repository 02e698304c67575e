"""The primary input: the pre-tokenized sequence table.

Shape mandated by the north rule (BASELINE.json ``input_hint``)::

    (doc_id string, tokens array<int32>, n_tok int32, source string)
    + event_ts timestamp (derived event time — the analog of the
      reference's ``acquisition_time`` hoisted from product metadata,
      `/root/reference/s1tiling/libs/otbwrappers/s1_to_s2.py:179-189`)

Two providers:

- :func:`sequences_from_documents` — deterministic derivation from the
  driver's ``documents`` parquet, expressed ONLY with built-in JVM-side
  column functions so the identical derivation can be written in ANSI
  SQL for the DuckDB oracle (see :data:`SEQUENCES_ORACLE_CTE`). This is
  the oracle-checkable small-scale path.
- :mod:`s1tiling_spark.sources.synth` — a pure ``spark.range``-based
  generator for arbitrary row counts (bench / scale tests).

The tokenization rule is a fixed deterministic word→id map computable in
any SQL dialect: ``tok(w) = length(w)*131 + ascii(first_char(w))``. Event
time spans 45 days (covers the 1h/1d/30d tiers) via
``base + (doc_id*797 mod 64800) minutes`` — 797 is coprime with 64800 so
doc ids spread over the whole range.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from s1tiling_spark.sources.tables import load_table

BASE_TS = "2024-01-01 00:00:00"
SPAN_MINUTES = 64800  # 45 days
TS_MULT = 797  # coprime with SPAN_MINUTES


def _tok(w: Column) -> Column:
    return (F.length(w) * F.lit(131) + F.ascii(F.substring(w, 1, 1))).cast("int")


def sequences_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → sequences, all JVM-side (split/transform/length/ascii).

    Analog of the reference's first pipeline step ExtractSentinel1Metadata
    (`s1_to_s2.py:140-242`): hoist raw payload into typed columns the rest
    of the engine groups and aggregates on.
    """
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.transform(F.split(F.col("text"), " "), _tok).alias("tokens"),
        F.col("source"),
        F.timestamp_add(
            "MINUTE",
            ((F.col("doc_id") * TS_MULT) % SPAN_MINUTES).cast("int"),
            F.lit(BASE_TS).cast("timestamp"),
        ).alias("event_ts"),
        # n_tok == size(tokens) == size(split(text,' ')) == spaces+1
        # (split keeps trailing empties), computed WITHOUT the split:
        # Catalyst cannot simplify size(transform(split(...))) away, so
        # deriving n_tok from `tokens` made every count-only consumer
        # (the rollup gates read only event_ts/source/n_tok) pay the
        # full per-token tokenization; this form is a char count.
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            + F.lit(1)
        )
        .cast("int")
        .alias("n_tok"),
    )


# DuckDB CTE computing the identical sequences relation from the
# pre-registered `documents` view. Every oracle query over sequences
# starts with `WITH {SEQUENCES_ORACLE_CTE} SELECT ...`.
SEQUENCES_ORACLE_CTE = f"""sequences AS (
  SELECT
    CAST(doc_id AS VARCHAR) AS doc_id,
    list_transform(string_split(text, ' '),
                   w -> CAST(length(w)*131 + ascii(substr(w,1,1)) AS INT)) AS tokens,
    source,
    TIMESTAMP '{BASE_TS}' + (doc_id*{TS_MULT} % {SPAN_MINUTES}) * INTERVAL 1 MINUTE AS event_ts,
    CAST(len(string_split(text, ' ')) AS INT) AS n_tok
  FROM documents
)"""
