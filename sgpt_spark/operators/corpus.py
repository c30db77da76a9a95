"""Corpus cleaning / projection operators.

Reference behaviors re-expressed as Catalyst-optimizable expressions
(SURVEY.md §2.2):
- empty-document filter        beir_dense_retriever.py:393-398
- null-title repair            beir_dense_retriever.py:500-504 (clean_titles)
- title+text concat projection beir_dense_retriever.py:341
- newline normalization        beir_dense_retriever.py:168-169
- char truncation + ellipsis   io_utils/plugin_io_utils.py:45-62
- token truncation + telemetry beir_dense_retriever.py:128-137,160-184
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def non_empty_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Drop rows with NULL/empty/whitespace-only text.

    Mirrors the reference's empty-document filter
    (beir_dense_retriever.py:393-398). Pure predicate — pushed down to
    the parquet scan by Catalyst.
    """
    c = F.col(text_col)
    return df.filter(c.isNotNull() & (F.length(F.trim(c)) > 0))


def clean_title(title: Column) -> Column:
    """None -> "" (reference clean_titles, beir_dense_retriever.py:500-504)."""
    return F.coalesce(title, F.lit(""))


def doc_fulltext(title: Column, text: Column) -> Column:
    """(title + " " + text).strip() when title present
    (beir_dense_retriever.py:341)."""
    return F.trim(F.concat_ws(" ", clean_title(title), F.coalesce(text, F.lit(""))))


def normalize_newlines(text: Column) -> Column:
    """txt.replace("\\n", " ") pre-tokenization
    (beir_dense_retriever.py:168-169)."""
    return F.regexp_replace(text, "\n", " ")


def order_by_length(
    df: DataFrame, text_col: str = "text", desc: bool = True, within_partitions: bool = True
) -> DataFrame:
    """Length-ordered corpus — the reference's batching perf tactic
    (exact_search.py:64-71 longest-first corpus sort;
    SentenceTransformer.py:148-149 length-sorted encode batching): rows
    of similar length land in the same Arrow batch, so padded/vectorized
    UDFs waste less work and OOM on the longest batch surfaces first.

    ``within_partitions=True`` (default) sorts without any shuffle —
    batching benefits are per-batch anyway; set False for a global
    range-partitioned order when downstream wants monotone lengths.
    """
    key = F.length(F.coalesce(F.col(text_col), F.lit("")))
    key = key.desc() if desc else key.asc()
    if within_partitions:
        return df.sortWithinPartitions(key)
    return df.orderBy(key)


def truncate_chars(text: Column, max_chars: int, ellipsis: str = "...") -> Column:
    """Cap strings at ``max_chars`` characters, appending ``ellipsis``
    when something was cut (plugin_io_utils.py:45-62 semantics: the
    ellipsis is ADDED after the cap, not counted within it)."""
    t = F.coalesce(text, F.lit(""))
    return F.when(
        F.length(t) > max_chars,
        F.concat(F.substring(t, 1, max_chars), F.lit(ellipsis)),
    ).otherwise(t)


def truncate_tokens(tokens: Column, max_tokens: int) -> Column:
    """Cap a token array at ``max_tokens`` (the reference's
    max_token_len cut, beir_dense_retriever.py:177-184)."""
    return F.slice(tokens, 1, max_tokens)


def truncation_stats(
    df: DataFrame,
    tokens_col: str = "terms",
    max_tokens: int = 256,
) -> DataFrame:
    """Truncation telemetry (beir_dense_retriever.py:160-162,175-180,
    216-219: docs truncated / tokens dropped, surfaced as warnings in
    the reference): one row with n_docs, n_truncated, tokens_before,
    tokens_after, truncated_frac. Pure aggregate — map-side combined.
    """
    n_tok = F.size(F.col(tokens_col))
    kept = F.least(n_tok, F.lit(max_tokens))
    return df.agg(
        F.count("*").alias("n_docs"),
        F.sum((n_tok > max_tokens).cast("long")).alias("n_truncated"),
        F.sum(n_tok.cast("long")).alias("tokens_before"),
        F.sum(kept.cast("long")).alias("tokens_after"),
        F.round(F.avg((n_tok > max_tokens).cast("double")), 6).alias("truncated_frac"),
    )
