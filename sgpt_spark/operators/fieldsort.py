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
    strategy: str = "kernel",
) -> DataFrame:
    """ES match query + ``sort`` clause -> (qid, doc_id, *sort fields,
    rank): the top-``k`` matching docs per query ordered by the sort
    spec instead of BM25 (see module docstring for the ES semantics).

    ``by``: ordered (field, "asc"|"desc") pairs, fields resolved
    against the doc-values sidecar. Fully in-plan — queries tokenize
    inside the plan and nothing touches the driver (the kernel path
    takes the engine's interactive collect contract instead).

    ``strategy='kernel'`` (default, r6, segment-aligned sidecars): the
    sidecar cogroups with the pruned postings; each segment sorts its
    OWN doc-value rows once by the sort spec (pandas stable multi-key,
    the ``_sort_cols`` null semantics), ranks every hit against that
    order, and ships only <= k (qid, doc_id) survivors; the JVM joins
    the sort-field values back onto that tiny relation and re-ranks —
    the match set never joins the sidecar at full width. Valid per
    segment because the sort spec + doc_id is a total order and
    segments partition docs. ``strategy='relational'`` pins the r5
    spelling (the verification twin; also the fallback for
    segment-less sidecars).
    """
    by = list(by)
    if not by:
        raise ValueError("sort_search_index needs at least one sort field")
    if missing not in ("_last", "_first"):
        raise ValueError(f"missing must be '_last' or '_first', got {missing!r}")
    if strategy not in ("kernel", "relational"):
        raise ValueError(
            f"unknown strategy {strategy!r}: use kernel|relational"
        )
    fields = [f for f, _ in by]
    if len(set(fields)) != len(fields):
        raise ValueError(f"duplicate sort fields in {fields}")
    for f_ in fields:
        if f_ not in docvalues.columns:
            raise ValueError(
                f"sort field {f_!r} not in docvalues columns {docvalues.columns}"
            )
    if strategy == "kernel" and "segment" in docvalues.columns:
        seg_topk = _sort_kernel(
            spark, postings, meta, queries, docvalues, by, missing, k,
            tokenizer,
        )
        if seg_topk is not None:
            vals = F.broadcast(seg_topk).join(
                docvalues.select("doc_id", *fields), "doc_id"
            )
            w = Window.partitionBy("qid").orderBy(
                *_sort_cols(by, missing), F.col("doc_id").asc()
            )
            return (
                vals.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("qid", "doc_id", *fields, "rank")
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


def _sort_kernel(
    spark: SparkSession,
    postings: DataFrame,
    meta: IndexMeta,
    queries,
    docvalues: DataFrame,
    by: list,
    missing: str,
    k: int,
    tokenizer,
):
    """Per-segment sort-spec top-k -> (qid, doc_id) survivors, or None
    when the query batch is empty (caller falls through to the
    relational path, which returns the canonical empty relation)."""
    import numpy as np
    import pandas as pd

    from sgpt_spark.functions.analyzer import resolve_py_analyzer
    from sgpt_spark.operators.index_search import (
        collect_query_terms,
        normalize_queries,
    )
    from sgpt_spark.functions.compress import decode_many

    q, qid_type = normalize_queries(queries)
    if not isinstance(q, DataFrame):
        q = spark.createDataFrame(q, f"qid {qid_type}, query string")
    tok = tokenizer or resolve_py_analyzer(meta.analyzer)
    qid_t = q.schema["qid"].dataType.simpleString()

    per_query: dict = {}
    all_terms: set = set()
    for qid, t, _qtf in collect_query_terms(q, tokenize=tok):
        per_query.setdefault(qid, set()).add(t)
        all_terms.add(t)
    if not per_query:
        return None
    terms = sorted(all_terms)
    cand = postings.filter(F.col("term").isin(terms)).select(
        "segment", "term", "blocks"
    )
    fields = [f for f, _ in by]
    dvr = docvalues.select(
        F.col("segment").cast("int").alias("segment"), "doc_id", *fields
    )
    b_state = spark.sparkContext.broadcast(
        {q_: sorted(s) for q_, s in per_query.items()}
    )
    codec, kk = meta.codec, int(k)
    na_pos = "last" if missing == "_last" else "first"
    by_local = list(by)

    def srt_kernel(pleft: pd.DataFrame, pright: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"qid": pd.Series([], dtype=object),
                              "doc_id": pd.Series([], dtype="int64")})
        if len(pleft) == 0 or len(pright) == 0:
            return empty
        offs, d_all, _, _ = decode_many(list(pleft["blocks"]), codec)
        docs_of = {}
        for i, term in enumerate(pleft["term"]):
            s, e = int(offs[i]), int(offs[i + 1])
            if e > s:
                docs_of[term] = d_all[s:e]
        if not docs_of:
            return empty
        # one stable multi-key sort of the segment's doc-value rows,
        # last key first so earlier fields dominate (_sort_cols order),
        # doc_id asc as the innermost tie-break
        dvp = pright.sort_values("doc_id", kind="stable", ignore_index=True)
        srt = dvp.sort_values("doc_id", ascending=True, kind="stable")
        for fld, o in reversed(by_local):
            srt = srt.sort_values(
                fld, ascending=(o == "asc"), kind="stable",
                na_position=na_pos,
            )
        dv_ids = dvp["doc_id"].to_numpy(np.int64)
        ranks = np.empty(len(dvp), dtype=np.int64)
        ranks[srt.index.to_numpy()] = np.arange(len(dvp))
        qids_out, docs_out = [], []
        for qid, tl in b_state.value.items():
            arrs = [docs_of[t] for t in tl if t in docs_of]
            if not arrs:
                continue
            hits = (
                arrs[0]
                if len(arrs) == 1
                else np.unique(np.concatenate(arrs))
            )
            pos = np.searchsorted(dv_ids, hits)
            pos[pos == len(dv_ids)] = 0
            found = dv_ids[pos] == hits
            hits, pos = hits[found], pos[found]
            if not len(hits):
                continue
            r = ranks[pos]
            if len(r) > kk:
                keep = np.argpartition(r, kk - 1)[:kk]
                hits = hits[keep]
            qids_out.append(np.full(len(hits), qid, dtype=object))
            docs_out.append(hits.astype(np.int64))
        if not qids_out:
            return empty
        return pd.DataFrame(
            {
                "qid": np.concatenate(qids_out),
                "doc_id": np.concatenate(docs_out),
            }
        )

    return (
        cand.groupBy("segment")
        .cogroup(dvr.groupBy("segment"))
        .applyInPandas(srt_kernel, schema=f"qid {qid_t}, doc_id long")
    )
