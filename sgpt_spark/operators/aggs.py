"""ES search AGGREGATIONS — the ``aggs`` half of a search request,
computed over the full match set (not the top-k page), the way ES runs
a terms or histogram aggregation alongside a query.

The reference rides ES for all retrieval (crossencoder/beir/
crossencoder_beir_bm25.ipynb builds the search bodies); the analytics
surface those requests COULD carry is the Lucene facet/doc-values
aggregation machinery. This module re-expresses it Spark-first,
reusing two existing relations:

  * the MATCH SET: docs matching >= 1 analyzed query term — one
    term-pruned postings scan, ``flatten_postings`` decode, shuffle
    join against the in-plan query vocabulary, distinct. Exactly the
    doc set ES's aggregation phase iterates (its hit bitset), bounded
    by the matched terms' total df, never |corpus|.
  * the DOC-VALUES sidecar (``indexer.build_postings_with_docvalues``)
    joined by doc_id — aggregations don't need segment alignment, only
    the per-doc field values (the Lucene doc-values read path).

Both aggregations are pure DataFrame plans (no UDF, no driver loop):

``terms_agg``      ES ``terms``: top-``size`` buckets per query by
                   (doc_count desc, value asc) — the ES bucket order.
                   NULL field values are excluded (ES ``missing`` is an
                   opt-in parameter, not the default).
``histogram_agg``  ES ``histogram``: fixed-interval buckets, keys =
                   floor(value / interval) * interval; empty buckets
                   between each query's min and max key are emitted
                   with doc_count 0 (the ES min_doc_count=0 default),
                   via a per-query ``sequence`` explode — declarative,
                   no driver knowledge of the key range.

Scale notes (10^12 docs): the postings scan is pruned to the query
vocabulary at the parquet reader; the match set is |matching docs| x
|queries sharing them| rows (the ES agg-phase iteration cost); the
docvalues join shuffles on doc_id and the bucket counting is one
map-side-combinable groupBy. Bucket fan-out is bounded by size (terms)
or the key span / interval (histogram).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sgpt_spark.operators.index_search import flatten_postings, normalize_queries
from sgpt_spark.operators.indexer import IndexMeta
from sgpt_spark.operators.search import query_terms


def match_candidates(
    spark: SparkSession,
    postings: DataFrame,
    meta: IndexMeta,
    queries: DataFrame | Iterable[tuple],
    tokenizer=None,
) -> DataFrame:
    """-> distinct (qid, doc_id) docs matching >= 1 analyzed query term
    (ES match query, operator=or — the aggregation phase's hit set).

    Fully in-plan: queries tokenize with the index's analyzer (JVM
    column twin), the postings scan left-semi prunes to the query
    vocabulary, and the decoded flat relation probe-joins on term.
    """
    from sgpt_spark.functions.analyzer import resolve_jvm_analyzer

    queries, qid_type = normalize_queries(queries)
    if not isinstance(queries, DataFrame):
        queries = spark.createDataFrame(queries, f"qid {qid_type}, query string")
    tok = tokenizer or resolve_jvm_analyzer(meta.analyzer)
    qt = query_terms(queries, tokenizer=tok)
    cand = postings.join(qt.select("term").distinct(), "term", "left_semi")
    flat = flatten_postings(cand, codec=meta.codec).select("term", "doc_id")
    return (
        flat.join(qt.select("qid", "term").distinct(), "term")
        .select("qid", "doc_id")
        .distinct()
    )


def terms_agg(
    candidates: DataFrame,
    docvalues: DataFrame,
    field: str,
    size: int = 10,
) -> DataFrame:
    """ES ``terms`` aggregation over the match set -> (qid, value,
    doc_count, bucket_rank), top-``size`` buckets per query by
    (doc_count desc, value asc). Values compare as strings (the ES
    keyword-bucket key); NULL field values are excluded."""
    if field not in docvalues.columns:
        raise ValueError(
            f"terms_agg field {field!r} not in docvalues columns "
            f"{docvalues.columns}"
        )
    vals = candidates.join(
        docvalues.select("doc_id", field), "doc_id"
    ).filter(F.col(field).isNotNull())
    counts = vals.groupBy(
        "qid", F.col(field).cast("string").alias("value")
    ).agg(F.count("*").alias("doc_count"))
    w = Window.partitionBy("qid").orderBy(
        F.col("doc_count").desc(), F.col("value").asc()
    )
    return counts.withColumn("bucket_rank", F.row_number().over(w)).filter(
        F.col("bucket_rank") <= size
    )


def histogram_agg(
    candidates: DataFrame,
    docvalues: DataFrame,
    field: str,
    interval: int,
    min_doc_count: int = 0,
) -> DataFrame:
    """ES ``histogram`` aggregation over the match set -> (qid, bucket,
    doc_count), bucket = floor(value / interval) * interval (bigint
    keys — the engine's numeric doc values are integral; ES's
    double-keyed buckets for float fields are a documented boundary).

    ``min_doc_count=0`` (the ES default) emits EMPTY buckets between
    each query's min and max key: a per-query ``sequence(min, max,
    interval)`` explode left-joins the counts — no driver-side key
    range, no UDF. ``min_doc_count=1`` skips the fill (counts only).
    """
    if field not in docvalues.columns:
        raise ValueError(
            f"histogram_agg field {field!r} not in docvalues columns "
            f"{docvalues.columns}"
        )
    if interval <= 0:
        raise ValueError(f"histogram_agg interval must be positive, got {interval}")
    vals = candidates.join(
        docvalues.select("doc_id", field), "doc_id"
    ).filter(F.col(field).isNotNull())
    bucket = (
        F.floor(F.col(field).cast("double") / F.lit(int(interval)))
        * F.lit(int(interval))
    ).cast("long")
    counts = vals.groupBy("qid", bucket.alias("bucket")).agg(
        F.count("*").alias("doc_count")
    )
    if min_doc_count >= 1:
        return counts.select("qid", "bucket", "doc_count")
    bounds = counts.groupBy("qid").agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
    )
    filled = bounds.select(
        "qid",
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(int(interval)))
        ).alias("bucket"),
    )
    return filled.join(counts, ["qid", "bucket"], "left").select(
        "qid",
        "bucket",
        F.coalesce(F.col("doc_count"), F.lit(0)).alias("doc_count"),
    )
