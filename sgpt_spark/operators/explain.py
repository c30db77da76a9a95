"""ES ``explain`` API — the per-hit SCORE BREAKDOWN (``explain=true``
on a search, or the ``_explain/<id>`` endpoint): for every top-k hit,
one row per matched query term with the full Lucene BM25 anatomy the
ES response tree spells out (idf, tf-norm, per-term weight), so a user
can see WHY a document ranked where it did.

Relational spelling of the ES explanation tree: the nested JSON
("sum of: [weight(term ...), ...]" with "idf" and "tf" children)
flattens to

    (qid, doc_id, score, rank,          -- the hit, repeated per term
     term, qtf, tf, df, doc_len,        -- the evidence
     idf, tf_norm, term_score)          -- the breakdown

with ``term_score = qtf * idf * tf_norm`` and
``sum(term_score) over the hit's terms == the hit's (unrounded) score``
— the invariant the tests assert. Every breakdown column is ONE scalar
expression per row (no aggregation), so each value is bit-identical
across engines — the strongest oracle shape this engine has.

Plan shape: the top-k hits come from the GATED search plan
(``search_index``); the breakdown joins the term-pruned flat postings
relation against the hits' (qid, doc_id) pairs — bounded by
k x |query terms| per query, never the match set. Scale: explaining a
page is O(k * terms) rows per query regardless of corpus size.

Reference seam: the reference debugs ES relevance through this API
(its BM25 bodies in crossencoder/beir/crossencoder_beir_bm25.ipynb are
tuned against ES responses); no reference-side code equivalent exists
— ES-parity surface per SURVEY.md §2.5.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sgpt_spark.functions.bm25 import B, K1


def _breakdown_cols(n_docs: int, avgdl: float, k1: float, b: float):
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf_norm = F.col("tf") / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("doc_len") / F.lit(avgdl))
    )
    return idf.alias("idf"), tf_norm.alias("tf_norm")


def explain_search_index(
    spark: SparkSession,
    postings: DataFrame,
    meta,
    queries: DataFrame | Iterable[tuple],
    k: int = 10,
    term_stats: DataFrame | None = None,
    tokenize=None,
) -> DataFrame:
    """ES explain over the compressed index: the GATED ``search_index``
    top-k page joined back to its per-term evidence. -> one row per
    (hit, matched term); see module docstring for columns."""
    from sgpt_spark.functions.analyzer import resolve_jvm_analyzer
    from sgpt_spark.operators.index_search import (
        flatten_postings,
        normalize_queries,
        search_index,
    )
    from sgpt_spark.operators.search import query_terms

    queries, qid_type = normalize_queries(queries)
    if not isinstance(queries, DataFrame):
        queries = spark.createDataFrame(queries, f"qid {qid_type}, query string")
    hits = search_index(
        spark, postings, meta, queries, k=k,
        term_stats=term_stats, tokenize=tokenize,
    )
    tok = tokenize or resolve_jvm_analyzer(meta.analyzer)
    qt = query_terms(queries, tokenizer=tok)
    cand = postings.join(qt.select("term").distinct(), "term", "left_semi")
    flat = flatten_postings(cand, codec=meta.codec)
    dfs = (
        term_stats
        if term_stats is not None
        else postings.groupBy("term").agg(F.sum("df").alias("df"))
    )
    evidence = (
        flat.join(qt, "term")
        .join(dfs, "term")
        .join(hits, ["qid", "doc_id"])
    )
    idf, tf_norm = _breakdown_cols(meta.n_docs, meta.avgdl, meta.k1, meta.b)
    return evidence.select(
        "qid", "doc_id", "score", "rank", "term", "qtf", "tf", "df",
        "doc_len", idf, tf_norm,
        (F.col("qtf") * idf * tf_norm).alias("term_score"),
    )


def explain_search(
    corpus: DataFrame,
    queries: DataFrame | Iterable[tuple],
    k: int = 10,
    tokenizer=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Exhaustive twin over a raw corpus (no index) — the same
    breakdown relation derived from tokenize-time tf/df/doclen."""
    from sgpt_spark.functions.analyzer import tokenize_ws
    from sgpt_spark.operators.index_search import normalize_queries
    from sgpt_spark.operators.search import bm25_search, query_terms
    from sgpt_spark.operators.stats import (
        corpus_stats,
        doc_terms,
        term_df,
        term_freqs,
    )

    spark = corpus.sparkSession
    queries, qid_type = normalize_queries(queries)
    if not isinstance(queries, DataFrame):
        queries = spark.createDataFrame(queries, f"qid {qid_type}, query string")
    tok = tokenizer or tokenize_ws
    hits = bm25_search(
        corpus, queries, k=k, tokenizer=tok, id_col=id_col, text_col=text_col,
        k1=k1, b=b,
    )
    dt = doc_terms(corpus, id_col=id_col, text_col=text_col, tokenizer=tok)
    stats = corpus_stats(dt)
    tfreqs = term_freqs(dt)
    dfs = term_df(tfreqs)
    qt = query_terms(queries, tokenizer=tok)
    evidence = (
        tfreqs.join(qt, "term").join(dfs, "term").join(hits, ["qid", "doc_id"])
    )
    idf, tf_norm = _breakdown_cols(stats.n_docs, stats.avgdl, k1, b)
    return evidence.select(
        "qid", "doc_id", "score", "rank", "term", "qtf", "tf", "df",
        "doc_len", idf, tf_norm,
        (F.col("qtf") * idf * tf_norm).alias("term_score"),
    )
