"""ES sort-by-field — the search request's ``sort`` clause over
doc values instead of ``_score`` (the Lucene SortField / doc-values
sort role).

The reference's ES searches rank by BM25 only (crossencoder/beir/
crossencoder_beir_bm25.ipynb search bodies), but the ES surface those
requests ride always accepts ``"sort": [{"field": "desc"}, ...]``;
this module completes that half of the search request the way the
aggregation phase was completed: the MATCH SET comes from the same
term-pruned postings decode (``aggs.match_candidates`` — the hit
bitset ES would iterate), the sort keys come from the doc-values
sidecar, and the per-query top-k cut is one window.

ES semantics carried:

* multi-level sort: ``by`` is an ordered list of (field, "asc"|"desc")
  — earlier fields dominate, exactly the ES sort array.
* ``missing="_last"`` (the ES default) puts NULL sort values after
  every present value regardless of direction; ``"_first"`` the
  opposite. Applied to every level (per-field missing is an ES
  refinement not carried; documented boundary).
* scoring is OFF (ES ``track_scores`` defaults false under explicit
  sort): the result carries the sort-field values, not ``_score``.
* deterministic final tie-break: doc_id asc. ES's own intra-shard
  tie order is insertion order (non-deterministic across rebuilds);
  an explicit unique tie-break is the documented ES best practice for
  stable pagination, and it is what makes this operator value-gateable.

Scale notes (10^12 docs): the postings scan is pruned to the query
vocabulary at the parquet reader, the match set is bounded by the
matched terms' total df, the docvalues join shuffles on doc_id, and
the per-qid window compiles to partial/final WindowGroupLimit — each
shuffle carries at most k rows per (query, partition) after the
partial cut, the same shape as every other top-k in the engine.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sgpt_spark.operators.aggs import match_candidates
from sgpt_spark.operators.indexer import IndexMeta


def _sort_cols(by, missing: str) -> list:
    cols = []
    for field, order in by:
        if order not in ("asc", "desc"):
            raise ValueError(f"sort order must be asc|desc, got {order!r}")
        c = F.col(field)
        if order == "asc":
            cols.append(c.asc_nulls_last() if missing == "_last" else c.asc_nulls_first())
        else:
            cols.append(c.desc_nulls_last() if missing == "_last" else c.desc_nulls_first())
    return cols


def sort_search_index(
    spark: SparkSession,
    postings: DataFrame,
    meta: IndexMeta,
    queries: DataFrame | Iterable[tuple],
    docvalues: DataFrame,
    by: Iterable[tuple[str, str]],
    k: int = 10,
    missing: str = "_last",
    tokenizer=None,
) -> DataFrame:
    """ES match query + ``sort`` clause -> (qid, doc_id, *sort fields,
    rank): the top-``k`` matching docs per query ordered by the sort
    spec instead of BM25 (see module docstring for the ES semantics).

    ``by``: ordered (field, "asc"|"desc") pairs, fields resolved
    against the doc-values sidecar. Fully in-plan — queries tokenize
    inside the plan and nothing touches the driver.
    """
    by = list(by)
    if not by:
        raise ValueError("sort_search_index needs at least one sort field")
    if missing not in ("_last", "_first"):
        raise ValueError(f"missing must be '_last' or '_first', got {missing!r}")
    fields = [f for f, _ in by]
    if len(set(fields)) != len(fields):
        raise ValueError(f"duplicate sort fields in {fields}")
    for f_ in fields:
        if f_ not in docvalues.columns:
            raise ValueError(
                f"sort field {f_!r} not in docvalues columns {docvalues.columns}"
            )
    # single downstream action: the request-sharing checkpoint would be
    # pure storage overhead here (r6)
    cand = match_candidates(
        spark, postings, meta, queries, tokenizer=tokenizer,
        materialize=False,
    )
    vals = cand.join(docvalues.select("doc_id", *fields), "doc_id")
    w = Window.partitionBy("qid").orderBy(
        *_sort_cols(by, missing), F.col("doc_id").asc()
    )
    return (
        vals.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "doc_id", *fields, "rank")
    )
