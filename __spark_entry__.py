"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from sgpt_spark.functions.bm25 import B, K1  # noqa: E402
from sgpt_spark.operators.metrics import mean_metrics  # noqa: E402
from sgpt_spark.operators.stats import doc_stats, doc_terms, term_df, term_freqs  # noqa: E402
from sgpt_spark.operators.search import bm25_search  # noqa: E402
from sgpt_spark.operators.topk import SCORE_DECIMALS  # noqa: E402
from sgpt_spark.sources.queryset import (  # noqa: E402
    QRELS_SQL,
    QUERIES_SQL,
    derived_qrels,
    derived_queries,
)
from sgpt_spark.sources.tables import load_table  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: BM25 top-10 retrieval over the documents corpus
    with the derived BEIR-style query set (SURVEY.md §3.1)."""
    docs = load_table(spark, SMOKE_SF_DIR, "documents")
    return bm25_search(docs, derived_queries(docs), k=10)


# ---------------------------------------------------------------------------
# queries() — one entry per implemented operator from SURVEY.md §2
# ---------------------------------------------------------------------------

def _q_bm25_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return bm25_search(docs, derived_queries(docs), k=10)


def _q_queryset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derived_queries(load_table(spark, sf_dir, "documents"))


def _q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    dt = doc_terms(load_table(spark, sf_dir, "documents"))
    return dt.select(
        F.count("*").alias("n_docs"),
        F.round(F.avg(F.size("terms")), SCORE_DECIMALS).alias("avgdl"),
    )


def _q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    dt = doc_terms(load_table(spark, sf_dir, "documents"))
    return doc_stats(dt).select("doc_id", F.col("doc_len").cast("long").alias("doc_len"))


def _q_term_df_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = term_freqs(doc_terms(load_table(spark, sf_dir, "documents")))
    return (
        term_df(tf)
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(100)
    )


def _q_bm25_index_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same flagship query, but through the compressed inverted index
    (delta+varint posting blocks, segmented build, per-segment top-k +
    global merge) — must be value-identical to the exhaustive path."""
    from sgpt_spark.operators.index_search import search_index
    from sgpt_spark.operators.indexer import build_postings

    docs = load_table(spark, sf_dir, "documents")
    postings, meta = build_postings(docs, segment_size=200)
    return search_index(spark, postings, meta, derived_queries(docs), k=10)


def _q_ir_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    run = bm25_search(docs, derived_queries(docs), k=10)
    return mean_metrics(run, derived_qrels(docs), k=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_top10": _q_bm25_top10,
        "bm25_index_top10": _q_bm25_index_top10,
        "queryset_derive": _q_queryset,
        "corpus_stats": _q_corpus_stats,
        "doc_stats": _q_doc_stats,
        "term_df_top100": _q_term_df_top100,
        "ir_metrics_mean": _q_ir_metrics,
    }


# ---------------------------------------------------------------------------
# oracle_sql() — DuckDB twins
# ---------------------------------------------------------------------------

# Shared CTE block: tokenize documents exactly like the engine's
# whitespace analyzer (string_split(' ') minus empties; empty docs dropped).
_TOKENS_CTE = """
  docs AS (
    SELECT doc_id, string_split(text, ' ') AS toks
    FROM documents
    WHERE text IS NOT NULL AND length(trim(text)) > 0
  ),
  terms AS (
    SELECT doc_id, u.term AS term
    FROM docs, unnest(toks) AS u(term)
    WHERE u.term <> ''
  ),
  doclen AS (SELECT doc_id, count(*) AS doc_len FROM terms GROUP BY doc_id),
  tf AS (SELECT term, doc_id, count(*) AS tf FROM terms GROUP BY term, doc_id),
  tdf AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
"""

_BM25_SQL = f"""
WITH {_TOKENS_CTE},
  stats AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM doclen),
  queryset AS ({QUERIES_SQL}),
  qterms AS (
    SELECT qid, u.term AS term, count(*) AS qtf
    FROM queryset, unnest(string_split(query, ' ')) AS u(term)
    WHERE u.term <> ''
    GROUP BY qid, u.term
  ),
  scored AS (
    SELECT q.qid, tf.doc_id,
           sum(
             q.qtf
             * ln(1 + (s.n - tdf.df + 0.5) / (tdf.df + 0.5))
             * tf.tf / (tf.tf + {K1} * (1 - {B} + {B} * dl.doc_len / s.avgdl))
           ) AS raw_score
    FROM qterms q
    JOIN tf  ON q.term = tf.term
    JOIN tdf ON tf.term = tdf.term
    JOIN doclen dl ON tf.doc_id = dl.doc_id
    CROSS JOIN stats s
    GROUP BY q.qid, tf.doc_id
  ),
  ranked AS (
    SELECT qid, doc_id, round(raw_score, {SCORE_DECIMALS}) AS score,
           row_number() OVER (
             PARTITION BY qid
             ORDER BY round(raw_score, {SCORE_DECIMALS}) DESC, doc_id ASC
           ) AS rnk
    FROM scored
  )
SELECT qid, doc_id, score, CAST(rnk AS INTEGER) AS rank
FROM ranked WHERE rnk <= 10
"""


# IR metrics over the BM25 run vs known-item qrels, matching
# InformationRetrievalEvaluator semantics (see operators/metrics.py).
_METRICS_SQL = f"""
WITH run AS ({_BM25_SQL}),
  qrels AS ({QRELS_SQL}),
  nrel AS (SELECT qid, count(*) AS n_rel FROM qrels GROUP BY qid),
  lab AS (
    SELECT r.qid, r.rank, CASE WHEN q.qid IS NOT NULL THEN 1 ELSE 0 END AS rel
    FROM run r LEFT JOIN qrels q ON r.qid = q.qid AND r.doc_id = q.doc_id
    WHERE r.rank <= 10
  ),
  runn AS (
    SELECT qid, rank, rel,
           sum(rel) OVER (PARTITION BY qid ORDER BY rank) AS cum_hits
    FROM lab
  ),
  perq0 AS (
    SELECT qid,
           sum(rel / log2(rank + 1)) AS dcg,
           sum(CASE WHEN rel = 1 THEN cum_hits * 1.0 / rank ELSE 0 END) AS psum,
           max(CASE WHEN rel = 1 THEN 1.0 / rank ELSE 0 END) AS mrr,
           sum(rel) AS hits
    FROM runn GROUP BY qid
  ),
  perq AS (
    SELECT n.qid, n.n_rel,
           coalesce(p.dcg, 0) AS dcg, coalesce(p.psum, 0) AS psum,
           coalesce(p.mrr, 0) AS mrr, coalesce(p.hits, 0) AS hits,
           list_sum([1.0 / log2(i + 1) for i in generate_series(1, least(10, n.n_rel))]) AS idcg
    FROM nrel n LEFT JOIN perq0 p ON n.qid = p.qid
  )
SELECT round(avg(dcg / idcg), 6) AS ndcg,
       round(avg(psum / least(10, n_rel)), 6) AS map,
       round(avg(mrr), 6) AS mrr,
       round(avg(hits / 10.0), 6) AS precision,
       round(avg(hits * 1.0 / n_rel), 6) AS recall
FROM perq
"""


def oracle_sql() -> dict[str, str]:
    return {
        "ir_metrics_mean": _METRICS_SQL,
        "bm25_index_top10": _BM25_SQL,
        "bm25_top10": _BM25_SQL,
        "queryset_derive": QUERIES_SQL,
        "corpus_stats": f"""
            WITH {_TOKENS_CTE}
            SELECT count(*) AS n_docs,
                   round(avg(doc_len), {SCORE_DECIMALS}) AS avgdl
            FROM doclen
        """,
        "doc_stats": f"""
            WITH {_TOKENS_CTE}
            SELECT doc_id, doc_len FROM doclen
        """,
        "term_df_top100": f"""
            WITH {_TOKENS_CTE}
            SELECT term, df FROM tdf
            ORDER BY df DESC, term ASC LIMIT 100
        """,
    }
