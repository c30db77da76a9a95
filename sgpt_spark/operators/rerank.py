"""Re-ranking — reference entry point C (SURVEY.md §3.3).

The reference takes each query's BM25 top-100, pairs (query, doc text),
scores pairs with a GPT cross-encoder (sum of continuation-token
log-probs, crossencoder/beir/sgptce.py:265-333, 150-262), and rebuilds
the run with the re-scored top-100 above the untouched tail
(sgptce.py:343-374).

Spark shape:
  run(top_k slice) ⨝ corpus texts  [hash join — the reference's
      rerank-gather dict lookup, sgptce.py:343-365]
  -> applyInPandas per qid: scorer over (query, doc_text) pairs
  -> re-rank slice, keep tail ordering below  [window]

The scorer is pluggable (the reference's score_function pluggability,
exact_search.py:27-28): any (query, Series[doc_text]) -> Series[float].
The default is a STUB cross-encoder — a deterministic lexical-overlap
log-score (no GPU models in this container) with the same signature a
real model UDF drops into.
"""

from __future__ import annotations

import math
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PairScorer = Callable[[str, pd.Series], pd.Series]


def stub_cross_encoder(query: str, doc_texts: pd.Series) -> pd.Series:
    """Deterministic stand-in for GPTRanker.predict (sgptce.py:265-333):
    sum over query-token occurrences of a smoothed per-token "log-prob"
    derived from lexical overlap. Pure function of (query, doc)."""
    q_terms = [t for t in (query or "").split(" ") if t]
    if not q_terms:
        return pd.Series(np.zeros(len(doc_texts)))

    def score(text: str) -> float:
        toks = [t for t in (text or "").split(" ") if t]
        n = max(len(toks), 1)
        counts: dict[str, int] = {}
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
        return sum(math.log((counts.get(t, 0) + 0.5) / (n + 1.0)) for t in q_terms)

    return doc_texts.map(score)


def rerank(
    results: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    top_k: int = 100,
    scorer: PairScorer = stub_cross_encoder,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> RESULTS with the per-query top_k re-scored by ``scorer`` and the
    tail (rank > top_k) preserved BELOW the reranked slice in original
    order — exactly the reference's rerank semantics (sgptce.py:343-374).

    Output score column: reranked rows carry the new score; tail rows
    keep their original score. Ranks are rebuilt 1..n per query.
    """
    head = results.filter(F.col("rank") <= top_k)
    tail = results.filter(F.col("rank") > top_k)

    # gather doc texts for the head slice only (the expensive join stays
    # proportional to |queries| x top_k, never the corpus). The head is
    # the small side (|queries| x top_k rows) — broadcast it explicitly
    # so the corpus is probed without a shuffle regardless of AQE stats.
    pairs = (
        F.broadcast(head).join(
            corpus.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_doc_text")),
            "doc_id",
        )
        .join(F.broadcast(queries.select("qid", "query")), "qid")
    )

    out_schema = "qid string, doc_id long, score double"
    qid_type = results.schema["qid"].dataType.simpleString()
    doc_type = results.schema["doc_id"].dataType.simpleString()
    out_schema = f"qid {qid_type}, doc_id {doc_type}, score double"

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        query = pdf["query"].iloc[0]
        scores = scorer(query, pdf["_doc_text"])
        return pd.DataFrame(
            {
                "qid": pdf["qid"],
                "doc_id": pdf["doc_id"],
                "score": np.round(np.asarray(scores, dtype=np.float64), 6),
            }
        )

    rescored = pairs.groupBy("qid").applyInPandas(score_group, schema=out_schema)

    w_head = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    head_ranked = rescored.withColumn("rank", F.row_number().over(w_head)).withColumn(
        "_section", F.lit(0)
    )
    tail_marked = tail.select("qid", "doc_id", "score", "rank").withColumn(
        "_section", F.lit(1)
    )
    merged = head_ranked.select("qid", "doc_id", "score", "rank", "_section").unionByName(
        tail_marked
    )
    w_all = Window.partitionBy("qid").orderBy(F.col("_section").asc(), F.col("rank").asc())
    return merged.withColumn("rank", F.row_number().over(w_all)).select(
        "qid", "doc_id", "score", "rank"
    )
