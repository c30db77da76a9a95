"""Okapi/Lucene BM25 scalar math as Spark column expressions.

The reference delegates this to Elasticsearch 7.0.0's default similarity
(Lucene BM25, k1=1.2, b=0.75 — crossencoder/beir/crossencoder_beir_bm25.ipynb
cell 10; SURVEY.md Appendix B). We implement the exact (non-lossy) formula:

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfn(t, d)   = tf / (tf + k1 * (1 - b + b * dl / avgdl))
    score(q, d) = sum over query-term occurrences of idf * tfn

Everything here is a JVM column expression — BM25 scoring runs inside
whole-stage codegen, never in Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def idf(df_col: Column, n_docs: float) -> Column:
    """Lucene BM25 idf: ln(1 + (N - df + 0.5) / (df + 0.5))."""
    return F.log(1.0 + (F.lit(float(n_docs)) - df_col + 0.5) / (df_col + 0.5))


def tf_norm(tf_col: Column, dl_col: Column, avgdl: float, k1: float = K1, b: float = B) -> Column:
    """BM25 tf saturation with exact doc-length normalization."""
    return tf_col / (tf_col + k1 * (1.0 - b + b * dl_col / F.lit(float(avgdl))))


def bm25_term_score(
    tf_col: Column,
    df_col: Column,
    dl_col: Column,
    n_docs: float,
    avgdl: float,
    k1: float = K1,
    b: float = B,
) -> Column:
    return idf(df_col, n_docs) * tf_norm(tf_col, dl_col, avgdl, k1, b)


def idf_py(df: float, n_docs: float) -> float:
    """Python twin for the brute-force oracle and block-max computation."""
    import math

    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def score_py(tf: float, df: float, dl: float, n_docs: float, avgdl: float,
             k1: float = K1, b: float = B) -> float:
    return idf_py(df, n_docs) * tf / (tf + k1 * (1.0 - b + b * dl / avgdl))
