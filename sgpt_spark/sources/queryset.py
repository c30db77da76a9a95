"""Deterministic BEIR-style query set derived from the documents table.

The reference evaluates against BEIR query sets shipped with each dataset
(beir_dense_retriever.py:390). The driver testdata has no queries table,
so we derive one deterministically from the corpus itself — the standard
known-item trick: every ``every``-th document contributes a query made of
its first ``n_terms`` tokens, qid = doc_id. The source doc is the
known-relevant item (qrels), which also gives the metrics operators a
ground truth. Fully expressible in both Spark and ANSI SQL, so the DuckDB
oracle derives the *identical* query set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sgpt_spark.operators.corpus import non_empty_text

EVERY = 10
N_TERMS = 5


def derived_queries(documents: DataFrame, every: int = EVERY, n_terms: int = N_TERMS) -> DataFrame:
    """documents(doc_id, text) -> (qid, query)."""
    return (
        non_empty_text(documents)
        .filter(F.col("doc_id") % every == 0)
        .select(
            F.col("doc_id").alias("qid"),
            F.array_join(F.slice(F.split(F.col("text"), " ", -1), 1, n_terms), " ").alias(
                "query"
            ),
        )
    )


def derived_qrels(documents: DataFrame, every: int = EVERY) -> DataFrame:
    """Known-item qrels: the source doc is relevant (relevance=1)."""
    return (
        non_empty_text(documents)
        .filter(F.col("doc_id") % every == 0)
        .select(
            F.col("doc_id").alias("qid"),
            F.col("doc_id").alias("doc_id"),
            F.lit(1).alias("relevance"),
        )
    )


# SQL twins (DuckDB dialect) — kept next to the Spark definitions so the
# two can't drift apart.
QUERIES_SQL = f"""
  SELECT doc_id AS qid,
         array_to_string(list_slice(string_split(text, ' '), 1, {N_TERMS}), ' ') AS query
  FROM documents
  WHERE doc_id % {EVERY} = 0 AND text IS NOT NULL AND length(trim(text)) > 0
"""

QRELS_SQL = f"""
  SELECT doc_id AS qid, doc_id, 1 AS relevance
  FROM documents
  WHERE doc_id % {EVERY} = 0 AND text IS NOT NULL AND length(trim(text)) > 0
"""
