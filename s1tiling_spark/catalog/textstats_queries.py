"""Text-analysis queries + DuckDB oracles (lang-ID, quality scoring,
token counting, fingerprinting)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from s1tiling_spark.operators.textstats import (
    FP_MOD,
    STOPWORDS,
    TOKEN_REGEX,
    doc_fingerprint,
    lang_id,
    quality_features,
    token_count_regex,
)
from s1tiling_spark.registry import register
from s1tiling_spark.sources.tables import load_table

_W = "string_split(text, ' ')"


def _hits(lg: str) -> str:
    inlist = ", ".join(f"'{w}'" for w in STOPWORDS[lg])
    return f"CAST(len(list_filter({_W}, w -> w IN ({inlist}))) AS INT)"


_LANG_ORACLE = (
    "WITH scores AS (SELECT doc_id, "
    + ", ".join(f"{_hits(lg)} AS hits_{lg}" for lg in STOPWORDS)
    + " FROM documents), stacked AS ("
    + " UNION ALL ".join(
        f"SELECT doc_id, '{lg}' AS lang, hits_{lg} AS hits FROM scores"
        for lg in STOPWORDS
    )
    + ") SELECT doc_id, lang AS pred_lang, hits FROM ("
    "SELECT *, row_number() OVER (PARTITION BY doc_id "
    "ORDER BY hits DESC, lang ASC) AS rk FROM stacked) WHERE rk = 1"
)


@register("lang_id", oracle=_LANG_ORACLE)
def lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(load_table(spark, "documents", sf_dir))


_QUALITY_ORACLE = f"""
SELECT doc_id,
  CAST(len({_W}) AS INT) AS n_words,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS BIGINT) AS n_punct,
  {_hits('en')} AS sw_hits,
  CAST(length(text) - (len({_W}) - 1) AS DOUBLE) / len({_W}) AS mean_wlen,
  CAST({_hits('en')} AS DOUBLE) / len({_W}) AS sw_ratio,
  0.4 * (CAST({_hits('en')} AS DOUBLE) / len({_W}))
  + 0.3 * least(CAST(len({_W}) AS DOUBLE) / 100.0, 1.0)
  + 0.3 * (1.0 - CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE)
           / length(text)) AS quality
FROM documents
"""


@register("quality_score", oracle=_QUALITY_ORACLE)
def quality_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_features(load_table(spark, "documents", sf_dir))


_TOKCOUNT_ORACLE = (
    "SELECT doc_id, "
    f"CAST(len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS INT) AS n_regex_tok, "
    f"CAST(len({_W}) AS INT) AS n_ws_tok FROM documents"
)


@register("token_count_regex", oracle=_TOKCOUNT_ORACLE)
def token_count_regex_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_count_regex(load_table(spark, "documents", sf_dir))


_FP_ORACLE = (
    "SELECT doc_id, CAST(list_sum(list_transform("
    f"{_W}, (w, i) -> "
    "((CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % 1048576) "
    f"* (2*i + 1)) % {FP_MOD})) % {FP_MOD} AS BIGINT) AS fingerprint "
    "FROM documents"
)


@register("doc_fingerprint", oracle=_FP_ORACLE)
def doc_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_fingerprint(load_table(spark, "documents", sf_dir))
