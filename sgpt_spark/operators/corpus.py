"""Corpus cleaning / projection operators.

Reference behaviors re-expressed as Catalyst-optimizable expressions
(SURVEY.md §2.2):
- empty-document filter        beir_dense_retriever.py:393-398
- null-title repair            beir_dense_retriever.py:500-504 (clean_titles)
- title+text concat projection beir_dense_retriever.py:341
- newline normalization        beir_dense_retriever.py:168-169
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
