"""Corpus statistics for BM25 — the numbers Elasticsearch computes
invisibly for the reference (SURVEY.md §2.5 "Corpus stats for BM25").

All pure DataFrame aggregations: partial (map-side) + final hash
aggregation, no custom shuffle logic needed. At 10^12 docs these are
single-pass scans producing either scalars (N, avgdl) or a term-keyed
table (df) that the indexer reuses.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sgpt_spark.functions.analyzer import tokenize_ws
from sgpt_spark.operators.corpus import non_empty_text

Tokenizer = Callable[[Column], Column]


def doc_terms(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer: Tokenizer = tokenize_ws,
) -> DataFrame:
    """corpus -> (doc_id, terms array<string>) with empty docs dropped."""
    return non_empty_text(corpus, text_col).select(
        F.col(id_col).alias("doc_id"), tokenizer(F.col(text_col)).alias("terms")
    )


def term_freqs(doc_terms_df: DataFrame) -> DataFrame:
    """(doc_id, terms) -> (term, doc_id, tf, doc_len).

    The flat posting relation. ``doc_len`` is denormalized onto every
    posting at index time so query-time scoring never joins back to a
    10^12-row doc-stats table (this is exactly what Lucene's per-doc
    norms achieve, minus the lossy 1-byte encoding — SURVEY.md §7.4(1)).

    explode -> groupBy(term, doc_id) is a map-side-combinable agg; the
    shuffle key (term, doc_id) is high-cardinality and therefore NOT
    skewed even for stopword terms — skew only appears when grouping by
    term alone, which the indexer handles with salting.
    """
    return (
        doc_terms_df.select(
            "doc_id",
            F.size("terms").alias("doc_len"),
            F.explode("terms").alias("term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"), F.first("doc_len").alias("doc_len"))
    )


def doc_stats(doc_terms_df: DataFrame) -> DataFrame:
    """(doc_id, doc_len) — exact lengths, not ES's lossy norms."""
    return doc_terms_df.select("doc_id", F.size("terms").alias("doc_len"))


def term_df(term_freqs_df: DataFrame) -> DataFrame:
    """(term, df) — document frequency per term.

    Input rows are already distinct (term, doc_id) pairs, so df is a
    plain count — no countDistinct shuffle.
    """
    return term_freqs_df.groupBy("term").agg(F.count("*").alias("df"))


@dataclass(frozen=True)
class CorpusStats:
    n_docs: int
    avgdl: float


def corpus_stats(doc_terms_df: DataFrame) -> CorpusStats:
    """Scalar N + avgdl. One small action; the two numbers are broadcast
    into downstream plans as literals (like ES's global index stats)."""
    row = doc_terms_df.select(
        F.count("*").alias("n"), F.avg(F.size("terms")).alias("avgdl")
    ).collect()[0]
    return CorpusStats(n_docs=int(row["n"]), avgdl=float(row["avgdl"] or 0.0))
