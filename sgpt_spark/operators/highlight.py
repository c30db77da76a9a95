"""Highlighting — per-occurrence match positions for retrieval results.

Elasticsearch's ``highlight`` on a search response marks WHERE the query
terms matched inside each hit (the reference's retrieval stack is ES —
crossencoder/beir/crossencoder_beir_bm25.ipynb cell 10 — and its search
API carries the highlighter with it). Lucene's unified highlighter
re-derives match positions from the postings/term-vector positions;
this module does the same off the engine's positional sidecar
(``operators/positions.py``): for each (query, hit doc), one row per
occurrence of each analyzed query term in the doc, in token-position
units (char offsets are an index-time option Lucene stores separately;
this engine records positions — the deterministic, analyzer-exact unit
— and documents that boundary).

Plan shape (100 TB notes): the hit set is a top-k result (q x k rows —
contractually small); the ONLY large relation touched is the positions
parquet, term-pruned at the scan by the pushed In(term, ...) filter and
row-filtered to the hit docs INSIDE the per-segment decode (docs are
segment-partitioned, so each occurrence row is emitted exactly once).
Output volume is bounded by (hit docs) x (query-term occurrences in
them) — highlighting-sized, never corpus-sized.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sgpt_spark.operators.index_search import normalize_queries
from sgpt_spark.operators.positions import _decode_rows, read_positional_index


def highlight_positions(
    spark: SparkSession,
    index_path: str,
    results: DataFrame,
    queries,
    tokenize=None,
) -> DataFrame:
    """(results (qid, doc_id[, ...]) x queries) -> one row per
    (qid, doc_id, term, pos): every occurrence of each analyzed query
    term inside each hit doc, 1-based token positions ascending.

    ``results`` is any retrieval output carrying (qid, doc_id) — the
    top-k of ``search_index``/``phrase_search_index``/exhaustive paths.
    Both results and queries follow the collect contract (top-k result
    sets are q x k rows by construction); the positions relation stays
    distributed and term-pruned."""
    from sgpt_spark.functions.analyzer import resolve_py_analyzer

    positions, meta = read_positional_index(spark, index_path)
    queries, qid_type = normalize_queries(queries)
    tok = tokenize or resolve_py_analyzer(meta.analyzer)
    if isinstance(queries, DataFrame):
        pairs = [(r["qid"], r["query"]) for r in queries.collect()]
    else:
        pairs = list(queries)
    qterms: dict = {}
    for qid, qtext in pairs:
        ts = set(tok(qtext or ""))
        if ts:
            qterms[qid] = ts
    out_schema = f"qid {qid_type}, doc_id long, term string, pos long"
    empty = spark.createDataFrame([], out_schema)
    if not qterms:
        return empty

    # hit docs per query (q x k — the collect contract); a doc can be a
    # hit for several queries
    doc_qids: dict = {}
    for r in results.select("qid", "doc_id").collect():
        if r["qid"] in qterms:
            doc_qids.setdefault(int(r["doc_id"]), []).append(r["qid"])
    if not doc_qids:
        return empty
    all_terms = sorted({t for ts in qterms.values() for t in ts})
    cand = positions.filter(F.col("term").isin(all_terms))
    b_ctx = spark.sparkContext.broadcast((qterms, doc_qids))
    codec = meta.codec

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qterms_b, doc_qids_b = b_ctx.value
        wanted = np.fromiter(doc_qids_b.keys(), dtype=np.int64, count=len(doc_qids_b))
        wanted.sort()
        for pdf in batches:
            if len(pdf) == 0:
                continue
            row_off, docs, tfs, _, pos_off, pos = _decode_rows(pdf["runs"], codec)
            frames = []
            for i, term in enumerate(pdf["term"]):
                ps, pe = int(row_off[i]), int(row_off[i + 1])
                if pe == ps:
                    continue
                d_i, tf_i = docs[ps:pe], tfs[ps:pe]
                # only hit docs: positions of everything else never leave
                # the task
                sel = np.flatnonzero(np.isin(d_i, wanted, assume_unique=True))
                if len(sel) == 0:
                    continue
                occ_doc = np.repeat(d_i, tf_i)
                occ_pos = pos[int(pos_off[i]): int(pos_off[i + 1])]
                occ_sel = np.isin(occ_doc, d_i[sel], assume_unique=False)
                for d, p in zip(occ_doc[occ_sel], occ_pos[occ_sel]):
                    for qid in doc_qids_b[int(d)]:
                        if term in qterms_b[qid]:
                            frames.append((qid, int(d), term, int(p)))
            if frames:
                yield pd.DataFrame(
                    frames, columns=["qid", "doc_id", "term", "pos"]
                )

    return cand.mapInPandas(emit, schema=out_schema)


def highlight_search(
    spark: SparkSession,
    index_path: str,
    queries,
    k: int = 10,
    tokenize=None,
    term_stats=None,
) -> DataFrame:
    """BM25 top-k + highlight in one call -> (qid, doc_id, rank, term,
    pos): the ES search-with-highlight response shape. The match run
    uses the positional index's derived postings (identical to a plain
    index); positions come from the sidecar."""
    from sgpt_spark.operators.index_search import search_index
    from sgpt_spark.operators.indexer import read_index

    postings, meta = read_index(spark, index_path)
    run = search_index(
        spark, postings, meta, queries, k=k, tokenize=tokenize,
        term_stats=term_stats,
    )
    run = run.select("qid", "doc_id", "rank")
    hits = highlight_positions(
        spark, index_path, run, queries, tokenize=tokenize
    )
    return (
        run.join(hits, ["qid", "doc_id"])
        .select("qid", "doc_id", "rank", "term", "pos")
    )
