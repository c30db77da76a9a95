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


PREFIX_LEN = 3


def derived_phrase_prefix_queries(
    documents: DataFrame,
    every: int = EVERY,
    n_terms: int = N_TERMS,
    prefix_len: int = PREFIX_LEN,
) -> DataFrame:
    """The known-item query set reshaped for ``match_phrase_prefix``
    (search-as-you-type): same first ``n_terms`` tokens, but the LAST
    token is truncated to its first ``prefix_len`` characters — the
    user stopped typing mid-word. The SQL twin below applies the
    identical string transformation, so the DuckDB oracle derives the
    same query set character-for-character."""
    q = derived_queries(documents, every=every, n_terms=n_terms)
    arr = F.split(F.col("query"), " ", -1)
    trunc = F.concat(
        F.slice(arr, F.lit(1), F.size(arr) - F.lit(1)),
        F.array(F.substring(F.element_at(arr, -1), 1, prefix_len)),
    )
    return q.select("qid", F.array_join(trunc, " ").alias("query"))


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

# match_phrase_prefix queryset: derived_phrase_prefix_queries' twin —
# the same raw-token truncation on the same base query string (DuckDB
# string_split keeps empty tokens like Spark's split, list_slice(_, 1, 0)
# is [] like Spark's slice, so the two stay byte-identical).
PHRASE_PREFIX_QUERIES_SQL = f"""
  SELECT qid,
         array_to_string(
           list_append(
             list_slice(qarr, 1, len(qarr) - 1),
             substr(qarr[len(qarr)], 1, {PREFIX_LEN})
           ), ' ') AS query
  FROM (SELECT qid, string_split(query, ' ') AS qarr FROM ({QUERIES_SQL}))
"""
