"""Top-k BM25 query execution over the compressed inverted index.

Physical plan (the reference's chunk->score->local-topk->merge scan,
exact_search.py:80-132, mapped onto Spark — SURVEY.md §4):

  postings parquet  ──filter term ∈ query-terms──   [parquet row-group
                                                     pruning: files are
                                                     term-sorted]
    ──groupBy(segment)──applyInPandas──>  per-segment top-k per query
                                          (numpy-vectorized decode+score)
    ──topk_per_group(qid)──>              global top-k merge
                                          [one narrow shuffle: <=k rows
                                           per (query, segment)]

Exactness: every doc lives in exactly one segment, so per-segment top-k
followed by a global merge loses nothing — identical results to the
exhaustive DataFrame path (tested against it and the brute-force
oracle). Block-max metadata is carried for the WAND pruning stage
(operators/wand.py).

Scale: query terms are collected to the driver (query sets are small by
contract — BEIR query sets are 10^2..10^4 strings) and shipped as a
broadcast; the only big data touched is the posting rows for those
terms, pruned at the parquet scan.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sgpt_spark.functions.analyzer import tokenize_py_ws
from sgpt_spark.functions.bm25 import idf_py
from sgpt_spark.functions.compress import decode_blocks
from sgpt_spark.operators.indexer import IndexMeta
from sgpt_spark.operators.topk import SCORE_DECIMALS, topk_per_group


def collect_query_terms(
    queries: DataFrame | Iterable[tuple], tokenize=tokenize_py_ws
) -> list[tuple]:
    """-> [(qid, term, qtf)] on the driver (query sets are small)."""
    if isinstance(queries, DataFrame):
        pairs = [(r["qid"], r["query"]) for r in queries.collect()]
    else:
        pairs = list(queries)
    out = []
    for qid, qtext in pairs:
        counts: dict[str, int] = {}
        for t in tokenize(qtext):
            counts[t] = counts.get(t, 0) + 1
        out.extend((qid, t, c) for t, c in counts.items())
    return out


def deterministic_topk(
    doc_ids: np.ndarray, scores_rounded: np.ndarray, k: int
) -> np.ndarray:
    """Indices of the top-k by (score desc, doc_id asc), tie-exact.

    Avoids a full sort when the candidate set is large: partition to the
    k-th score, keep every candidate at or above that threshold (so ties
    at the boundary are all still in play), then lexsort the survivors.
    """
    n = len(doc_ids)
    if n > k:
        thresh = -np.partition(-scores_rounded, k - 1)[k - 1]
        cand = np.flatnonzero(scores_rounded >= thresh)
    else:
        cand = np.arange(n)
    order = cand[np.lexsort((doc_ids[cand], -scores_rounded[cand]))]
    return order[:k]


def search_index(
    spark: SparkSession,
    postings: DataFrame,
    meta: IndexMeta,
    queries: DataFrame,
    k: int = 10,
    use_wand: bool = True,
) -> DataFrame:
    """-> RESULTS (qid, doc_id, score, rank), rank-identical to the
    exhaustive path and the brute-force oracle."""
    qterms = collect_query_terms(queries)
    qid_type = (
        queries.schema["qid"].dataType.simpleString()
        if isinstance(queries, DataFrame)
        else "string"
    )
    seg_schema = f"qid {qid_type}, doc_id long, score double"
    empty = spark.createDataFrame([], seg_schema + ", rank int")
    if not qterms:
        return empty

    terms = sorted({t for _, t, _ in qterms})
    cand = postings.filter(F.col("term").isin(terms))

    # Global df per query term = sum of segment-local dfs — a tiny agg
    # over candidate rows only (the "global stats" ES keeps per shard).
    global_df = {
        r["term"]: int(r["df"])
        for r in cand.groupBy("term").agg(F.sum("df").alias("df")).collect()
    }
    idf = {t: idf_py(d, meta.n_docs) for t, d in global_df.items()}

    # qid -> [(term, weight = qtf * idf)]
    per_query: dict = {}
    for qid, t, qtf in qterms:
        if t in idf:  # query terms absent from the corpus contribute 0
            per_query.setdefault(qid, []).append((t, qtf * idf[t]))
    if not per_query:
        return empty
    b_queries = spark.sparkContext.broadcast(per_query)
    k1, b, avgdl, kk = meta.k1, meta.b, meta.avgdl, k

    def score_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        out_qid, out_doc, out_score = [], [], []
        if use_wand:
            from sgpt_spark.operators.wand import TermPostings, maxscore_topk

            tps = {
                term: TermPostings(blocks, k1, b, avgdl)
                for term, blocks in zip(pdf["term"], pdf["blocks"])
            }
            for qid, tws in b_queries.value.items():
                wt = [(w, tps[t]) for t, w in tws if t in tps]
                if not wt:
                    continue
                uniq, scores_raw = maxscore_topk(wt, kk)
                if len(uniq) == 0:
                    continue
                scores = np.round(scores_raw, SCORE_DECIMALS)
                order = deterministic_topk(uniq, scores, kk)
                out_qid.extend([qid] * len(order))
                out_doc.extend(uniq[order].tolist())
                out_score.extend(scores[order].tolist())
        else:
            decoded: dict[str, tuple[np.ndarray, np.ndarray]] = {}
            for term, blocks in zip(pdf["term"], pdf["blocks"]):
                docs, tfs, dls = decode_blocks(blocks)
                tfn = tfs.astype(np.float64) / (
                    tfs + k1 * (1.0 - b + b * dls.astype(np.float64) / avgdl)
                )
                decoded[term] = (docs, tfn)
            for qid, tws in b_queries.value.items():
                present = [(t, w) for t, w in tws if t in decoded]
                if not present:
                    continue
                docs_cat = np.concatenate([decoded[t][0] for t, _ in present])
                w_cat = np.concatenate([decoded[t][1] * w for t, w in present])
                uniq, inv = np.unique(docs_cat, return_inverse=True)
                scores = np.round(np.bincount(inv, weights=w_cat), SCORE_DECIMALS)
                order = deterministic_topk(uniq, scores, kk)
                out_qid.extend([qid] * len(order))
                out_doc.extend(uniq[order].tolist())
                out_score.extend(scores[order].tolist())
        return pd.DataFrame({"qid": out_qid, "doc_id": out_doc, "score": out_score})

    seg_topk = cand.groupBy("segment").applyInPandas(
        lambda _key, pdf: score_segment(pdf), schema=seg_schema
    )
    return topk_per_group(seg_topk, k=k).select("qid", "doc_id", "score", "rank")
