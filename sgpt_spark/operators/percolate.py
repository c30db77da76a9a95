"""ES ``percolate`` query — reverse search: match incoming DOCUMENTS
against a table of STORED queries (the alerting/classification
primitive behind ES's percolator field type).

In ES you index queries into a percolator field and run a ``percolate``
query with a candidate document; Lucene answers by extracting each
stored query's terms into a side index and running the document's
terms against THAT, so only queries sharing a term with the document
are evaluated. The reference delegates its query DSL to ES indexes
(crossencoder/beir/crossencoder_beir_bm25.ipynb cell 10); this module
re-expresses the percolator's match-query subset Spark-first, where the
term-extraction index IS a term-keyed join:

  - stored queries analyze once into the (qid, term, qtf) relation —
    exactly ``search.query_terms`` (the percolator's extracted-terms
    side index, built as data, not as a Lucene structure);
  - incoming docs tokenize once into distinct (doc_id, term) pairs;
  - one shuffle join on term + one groupBy(doc_id, qid) counts matched
    clause units (qtf per matched term — the engine-wide
    ``required_df`` convention), so only (doc, query) pairs sharing a
    term ever materialize: the same candidate-pruning the percolator's
    term extraction buys, without a per-doc query loop;
  - ``operator='and'`` / ``minimum_should_match`` gate per stored query
    through the shared ``required_df`` bar.

-> (doc_id, qid, matched): which stored queries fire for which docs.
ES also supports full bool/phrase percolator queries and scores hits on
request; this spells the match subset (term clauses + msm/and), the
shape alert rules overwhelmingly take — richer stored queries compose
by post-filtering the fired pairs with the engine's standalone query
operators. No ranking is imposed: the result is a match relation, not
a top-k page (the ES percolate response is the set of matching query
ids).

Scale shape (the reason this matters at 10^12 docs/alerts): both sides
tokenize once; the join fan-out is bounded by sum over shared terms of
|docs with term| x |queries with term| — the percolator candidate set —
and the groupBy combines map-side. Millions of stored queries and a
firehose of documents are both just rows; neither side collects or
broadcasts by default (``broadcast_queries=True`` opts the stored-query
relation into a broadcast for small rule sets).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["percolate"]


def percolate(
    stored_queries: DataFrame | Iterable[tuple],
    docs: DataFrame,
    minimum_should_match: int = 0,
    operator: str = "or",
    tokenizer=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_queries: bool = False,
) -> DataFrame:
    """-> (doc_id, qid, matched): stored match queries fired per doc.

    ``stored_queries``: (qid, query) rows (DataFrame or iterable).
    ``matched`` counts clause units (qtf per matched analyzed term).
    ``operator='and'`` requires every clause; ``minimum_should_match``
    sets an explicit bar (both per stored query, the match-query
    semantics). Default is OR: any shared term fires the query.
    """
    from sgpt_spark.functions.analyzer import tokenize_ws
    from sgpt_spark.operators.index_search import normalize_queries
    from sgpt_spark.operators.search import query_terms, required_df

    spark = docs.sparkSession
    stored_queries, qid_type = normalize_queries(stored_queries)
    if not isinstance(stored_queries, DataFrame):
        stored_queries = spark.createDataFrame(
            stored_queries, f"qid {qid_type}, query string"
        )
    tokenizer = tokenizer or tokenize_ws
    qt = query_terms(stored_queries, tokenizer=tokenizer)
    required = required_df(qt, minimum_should_match, operator)
    if broadcast_queries:
        qt = F.broadcast(qt)
    doc_terms = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokenizer(F.col(text_col))).alias("term"),
        )
        .distinct()
    )
    fired = (
        doc_terms.join(qt, "term")
        .groupBy("doc_id", "qid")
        .agg(F.sum("qtf").alias("matched"))
    )
    if required is not None:
        req = F.broadcast(required) if broadcast_queries else required
        fired = (
            fired.join(req, "qid", "left")
            .filter(F.col("matched") >= F.coalesce(F.col("req"), F.lit(0)))
            .drop("req")
        )
    return fired.select("doc_id", "qid", "matched")
