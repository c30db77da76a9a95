"""Phrase search (ES ``match_phrase``) — exhaustive declarative path.

The reference's retrieval stack is Elasticsearch/Lucene
(crossencoder/beir/crossencoder_beir_bm25.ipynb cell 10); its BM25
queries use ``multi_match``, but the same index serves Lucene
``PhraseQuery`` (ES ``match_phrase``) — a core full-text operator any
ES user switching to this engine expects. Semantics implemented
(Lucene PhraseQuery, slop=0, public docs/source):

  - analyze the query into an ORDERED term sequence q[1..m];
  - a document matches where all m terms occur at consecutive
    positions: pf(d) = |{ s : toks[s+j-1] = q[j] for all j }| — the
    phrase frequency (overlaps count: "a a a" matches "a a" twice);
  - BM25 scores the phrase as one pseudo-term with freq = pf and
    idf = SUM of the member terms' idfs (Lucene sums ``termStats``
    over the phrase's term array, duplicates counted per occurrence):

        score = sum_j idf(q[j]) * pf / (pf + k1*(1-b+b*dl/avgdl))

Plan shape (100 TB notes): the ONLY big relation is the positional
posting stream (doc_id, pos, term) — one row per token occurrence,
exactly what Lucene's .prx positions file stores.  It is filtered by a
BROADCAST of the query (term, offset) pairs BEFORE any shuffle, so
shuffled rows are matched occurrences only (sum over query terms of
their collection frequency).  Alignment is pure relational math: a
matched (doc pos p, query offset j) pair votes for start s = p - j;
a start covered by all m offsets is one phrase hit:

    positions (doc_id, pos, term, doc_len)          [big: one scan]
      join BROADCAST(query (term, j, m))  on term   [no shuffle]
      groupBy(qid, doc_id, start).count             [map-side combine]
      -> starts with count == m  are phrase hits
      groupBy(qid, doc_id).count -> pf              [map-side combine]
      join BROADCAST(per-query summed idf)
      -> BM25 -> per-qid top-k window               [one narrow shuffle]

Every expression is a JVM column op (whole-stage codegen); there is no
UDF and no token-array shuffle.  The index-backed paths (positional
sidecar in the persisted index) live in ``operators/positions.py``
(collect + cogroup), the multifield composition in
``operators/phrase_multifield.py``; this module is their exhaustive
ground-truth twin, mirrored 1:1 by the DuckDB oracle in
``__spark_entry__``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sgpt_spark.functions.analyzer import tokenize_ws
from sgpt_spark.functions.bm25 import B, K1, idf, idf_py, tf_norm
from sgpt_spark.operators.corpus import non_empty_text
from sgpt_spark.operators.stats import (
    CorpusStats,
    corpus_stats,
    doc_terms,
    term_df,
    term_freqs,
)
from sgpt_spark.operators.topk import topk_per_group

Tokenizer = Callable[[Column], Column]


def positional_postings(doc_terms_df: DataFrame) -> DataFrame:
    """(doc_id, terms) -> (doc_id, doc_len, pos, term), pos 1-based.

    The flat positional relation — the exhaustive-path analog of
    Lucene's .prx file.  One row per token OCCURRENCE (unlike
    ``term_freqs``'s per-(term, doc) rows); doc_len is denormalized on
    so scoring never joins a doc-stats table.
    """
    return doc_terms_df.select(
        "doc_id",
        F.size("terms").alias("doc_len"),
        F.posexplode("terms").alias("pos0", "term"),
    ).select("doc_id", "doc_len", (F.col("pos0") + 1).alias("pos"), "term")


def query_phrases(
    queries: DataFrame,
    qid_col: str = "qid",
    query_col: str = "query",
    tokenizer: Tokenizer = tokenize_ws,
) -> DataFrame:
    """queries -> (qid, j, m, term): the ORDERED analyzed phrase, one
    row per query-term occurrence at 1-based offset j, with the phrase
    length m on every row.  Order is what distinguishes a phrase from
    the bag-of-terms ``query_terms``."""
    qarr = (
        non_empty_text(queries, query_col)
        .select(F.col(qid_col).alias("qid"), tokenizer(F.col(query_col)).alias("qarr"))
        .filter(F.size("qarr") > 0)
    )
    return qarr.select(
        "qid",
        F.size("qarr").alias("m"),
        F.posexplode("qarr").alias("j0", "term"),
    ).select("qid", (F.col("j0") + 1).alias("j"), "m", "term")


def phrase_frequencies(
    positions: DataFrame, qphrase: DataFrame, broadcast_queries: bool = True
) -> DataFrame:
    """-> (qid, doc_id, doc_len, pf) for docs with pf >= 1.

    A matched (doc position p, phrase offset j) pair votes for phrase
    start s = p - j; for fixed (doc, start, j) at most one vote exists
    (position s + j holds exactly one term), so a start with m votes is
    covered at every offset — one phrase occurrence.  Both groupBys key
    on high-cardinality (qid, doc_id, ...) and combine map-side.
    """
    q = F.broadcast(qphrase) if broadcast_queries else qphrase
    starts = (
        positions.join(q, "term")
        .select("qid", "doc_id", "doc_len", "m", (F.col("pos") - F.col("j")).alias("start"))
        .groupBy("qid", "doc_id", "doc_len", "m", "start")
        .agg(F.count("*").alias("nm"))
    )
    return (
        starts.filter(F.col("nm") == F.col("m"))
        .groupBy("qid", "doc_id", "doc_len")
        .agg(F.count("*").alias("pf"))
    )


def phrase_idf_sums(
    qphrase: DataFrame, dfs: DataFrame, n_docs: float, broadcast_queries: bool = True
) -> DataFrame:
    """-> (qid, sum_idf): Lucene sums the phrase terms' idfs over the
    term ARRAY (a term at two offsets contributes twice).  Inner join —
    a corpus-absent term contributes nothing, and such a query can have
    no phrase hit anyway, so the dropped idf never meets a result row."""
    q = F.broadcast(qphrase) if broadcast_queries else qphrase
    return (
        q.join(dfs, "term")
        .groupBy("qid")
        .agg(F.sum(idf(F.col("df"), n_docs)).alias("sum_idf"))
    )


def score_phrase_candidates(
    pf_df: DataFrame,
    sidf: DataFrame,
    stats: CorpusStats,
    k1: float = K1,
    b: float = B,
    broadcast_queries: bool = True,
) -> DataFrame:
    """(qid, doc_id, doc_len, pf) x (qid, sum_idf) -> (qid, doc_id,
    score) with pf as the BM25 pseudo-term frequency."""
    s = F.broadcast(sidf) if broadcast_queries else sidf
    return pf_df.join(s, "qid").select(
        "qid",
        "doc_id",
        (
            F.col("sum_idf")
            * tf_norm(F.col("pf"), F.col("doc_len"), stats.avgdl, k1, b)
        ).alias("score"),
    )


def phrase_search(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    tokenizer: Tokenizer = tokenize_ws,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    broadcast_queries: bool = True,
) -> DataFrame:
    """End-to-end exhaustive phrase top-k: corpus x phrase queries ->
    (qid, doc_id, score, rank).  ES ``match_phrase`` with slop=0 over a
    single field; corpus stats (N, avgdl, df) are the same whole-corpus
    stats the match query uses — a phrase is scored against the same
    index, not a phrase-specific one.

    ``broadcast_queries=False`` switches every query-sized relation to
    plain shuffle joins for query sets too large to broadcast (the same
    contract as ``search.score_candidates``).
    """
    dt = doc_terms(corpus, id_col=id_col, text_col=text_col, tokenizer=tokenizer)
    dfs = term_df(term_freqs(dt))
    stats = corpus_stats(dt)
    qp = query_phrases(queries, tokenizer=tokenizer)
    pf_df = phrase_frequencies(
        positional_postings(dt), qp, broadcast_queries=broadcast_queries
    )
    sidf = phrase_idf_sums(qp, dfs, stats.n_docs, broadcast_queries=broadcast_queries)
    scored = score_phrase_candidates(
        pf_df, sidf, stats, k1=k1, b=b, broadcast_queries=broadcast_queries
    )
    return topk_per_group(scored, k=k).select("qid", "doc_id", "score", "rank")


# --- Python twin (brute-force oracle for tests; mirrors the Spark and
# --- DuckDB definitions token-for-token) ---------------------------------


def phrase_freq_py(toks: list[str], q: list[str]) -> int:
    """Overlapping occurrence count of q as a contiguous slice of toks."""
    m = len(q)
    if m == 0 or len(toks) < m:
        return 0
    return sum(1 for i in range(len(toks) - m + 1) if toks[i : i + m] == q)


def phrase_score_py(
    pf: int, dl: int, q: list[str], df: dict[str, int], n_docs: int, avgdl: float,
    k1: float = K1, b: float = B,
) -> float:
    sum_idf = sum(idf_py(df[t], n_docs) for t in q if t in df)
    return sum_idf * pf / (pf + k1 * (1.0 - b + b * dl / avgdl))
