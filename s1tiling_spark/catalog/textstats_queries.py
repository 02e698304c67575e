"""Text-analysis gated query + DuckDB oracle: language-ID, quality
scoring, token counting and document fingerprinting folded into ONE
multi-column query keyed by doc_id (the driver's correctness window
caps at 50 entries; each analysis maps to its column(s) here —
``pred_lang``/``lang_hits`` = language ID, ``n_words``..``quality`` =
quality scoring, ``n_regex_tok``/``n_ws_tok`` = token census,
``fingerprint`` = rolling fingerprint)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


_LANG_CTE = (
    "scores AS (SELECT doc_id, "
    + ", ".join(f"{_hits(lg)} AS hits_{lg}" for lg in STOPWORDS)
    + " FROM documents), stacked AS ("
    + " UNION ALL ".join(
        f"SELECT doc_id, '{lg}' AS lang, hits_{lg} AS hits FROM scores"
        for lg in STOPWORDS
    )
    + "), lang AS (SELECT doc_id, lang AS pred_lang, hits AS lang_hits FROM ("
    "SELECT *, row_number() OVER (PARTITION BY doc_id "
    "ORDER BY hits DESC, lang ASC) AS rk FROM stacked) WHERE rk = 1)"
)

_FEATURES_CTE = f"""
feat AS (SELECT doc_id,
  CAST(len({_W}) AS INT) AS n_words,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS BIGINT) AS n_punct,
  {_hits('en')} AS sw_hits,
  CAST(length(text) - (len({_W}) - 1) AS DOUBLE) / len({_W}) AS mean_wlen,
  CAST({_hits('en')} AS DOUBLE) / len({_W}) AS sw_ratio,
  0.4 * (CAST({_hits('en')} AS DOUBLE) / len({_W}))
  + 0.3 * least(CAST(len({_W}) AS DOUBLE) / 100.0, 1.0)
  + 0.3 * (1.0 - CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE)
           / length(text)) AS quality,
  CAST(len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS INT) AS n_regex_tok,
  CAST(len({_W}) AS INT) AS n_ws_tok,
  CAST(list_sum(list_transform(
    {_W}, (w, i) ->
    ((CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % 1048576)
    * (2*i + 1)) % {FP_MOD})) % {FP_MOD} AS BIGINT) AS fingerprint
FROM documents)
"""

_TEXT_ANALYSIS_ORACLE = (
    f"WITH {_LANG_CTE}, {_FEATURES_CTE} "
    "SELECT f.doc_id, l.pred_lang, l.lang_hits, f.n_words, f.n_chars, "
    "f.n_punct, f.sw_hits, f.mean_wlen, f.sw_ratio, f.quality, "
    "f.n_regex_tok, f.n_ws_tok, f.fingerprint "
    "FROM feat f JOIN lang l USING (doc_id)"
)


@register("text_analysis", oracle=_TEXT_ANALYSIS_ORACLE)
def text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    lang = lang_id(docs).select(
        "doc_id", "pred_lang", F.col("hits").alias("lang_hits")
    )
    qual = quality_features(docs)
    toks = token_count_regex(docs)
    fp = doc_fingerprint(docs)
    return (
        qual.join(lang, "doc_id")
        .join(toks, "doc_id")
        .join(fp, "doc_id")
        .select(
            "doc_id",
            "pred_lang",
            "lang_hits",
            "n_words",
            "n_chars",
            "n_punct",
            "sw_hits",
            "mean_wlen",
            "sw_ratio",
            "quality",
            "n_regex_tok",
            "n_ws_tok",
            "fingerprint",
        )
    )
