"""Text analysis for training-data pipelines — quality metrics, token
statistics, language scoring, document fingerprints. Pure expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from sequenzo_spark.pipeline.dedup import _spread, tokens_col

STOPWORDS = ["the", "a", "of", "to", "in", "and", "is"]


def quality_metrics(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc quality signals: token counts, type/token ratio, mean token
    length, stopword ratio, alpha ratio — the classic cheap quality filters
    for web-scale corpus cleaning."""
    # spread: the token HOFs below are interpreted and the local fixture
    # scan is one task (projections stay above the repartition)
    docs = _spread(docs)
    empty = F.length(F.trim(F.col(text_col))) == 0
    toks = tokens_col(text_col)
    n_tok = F.when(empty, F.lit(0)).otherwise(F.size(toks))
    n_distinct = F.when(empty, F.lit(0)).otherwise(F.size(F.array_distinct(toks)))
    # Σ token lengths == non-whitespace chars of the trimmed text (tokens
    # are the \s+-split pieces, so trimmed = tokens ⊎ whitespace runs):
    # one native regexp instead of the per-token transform+aggregate fold,
    # which Spark evaluates interpreted (higher-order functions are
    # excluded from codegen — guide §4.1: prefer built-ins).
    tok_chars = F.when(empty, F.lit(0)).otherwise(
        F.length(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", ""))
    )
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.when(empty, F.lit(0)).otherwise(
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    )
    n_chars = F.length(F.col(text_col))
    n_alpha = F.length(F.regexp_replace(F.col(text_col), r"[^a-zA-Z]", ""))

    def safe(num, den):
        return F.when(den == 0, F.lit(0.0)).otherwise(num.cast("double") / den)

    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_tok.cast("long").alias("n_tokens"),
        n_distinct.cast("long").alias("n_distinct_tokens"),
        F.round(safe(n_distinct, n_tok), 9).alias("type_token_ratio"),
        F.round(safe(tok_chars, n_tok), 9).alias("mean_token_len"),
        F.round(safe(n_stop, n_tok), 9).alias("stopword_ratio"),
        F.round(safe(n_alpha, n_chars), 9).alias("alpha_ratio"),
    )


def doc_fingerprint(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Canonical content fingerprint: md5 of the sorted distinct token set.
    Detects bag-of-words duplicates (reordered/duplicated-token copies)."""
    toks = tokens_col(text_col)
    canon = F.array_join(F.array_sort(F.array_distinct(toks)), " ")
    docs = _spread(docs)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(canon).alias("fingerprint"),
    )
