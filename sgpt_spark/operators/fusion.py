"""Reciprocal rank fusion — the ES ``rrf`` retriever / hybrid-search
combiner (Cormack et al., SIGIR'09), and the natural join point for
this engine's two retrieval stacks: BM25 over the inverted index and
dense cosine over the md5/pluggable encoder (the reference pairs the
same two signals when it reranks BM25 candidate pools with bi-encoder
scores — biencoder/beir/custommodels/exact_search.py; RRF is the
rank-space version that needs no score calibration between them).

``rrf_fusion`` takes N ranked result sets (qid, doc_id, rank) — each
already cut to its retrieval window — and scores every (qid, doc_id)
as ``sum_r w_r / (rank_constant + rank_r)`` over the rankings that
contain it (a doc outside some retriever's window contributes 0 from
that retriever — the ES semantics; rank_constant default 60, the value
both ES and the original paper fix). Output is the engine's standard
deterministic top-k: rounded score desc, doc_id asc.

Plan shape: each input is already ≤ window rows per query, so the
union is query-bounded (never corpus-bounded) and the one groupBy
(qid, doc_id) shuffle moves at most N_retrievers x window rows per
query — trivially small next to the retrievals that produced them. At
10^12 docs the fusion cost is unchanged: it scales with the query
batch, not the corpus. No UDF, whole-stage codegen end to end.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sgpt_spark.operators.topk import topk_per_group


def rrf_fusion(
    rankings: Sequence[DataFrame],
    k: int = 10,
    rank_constant: int = 60,
    weights: Iterable[float] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Fuse ranked result sets -> (qid, doc_id, score, rank).

    ``rankings``: DataFrames with columns (qid, ``id_col``, rank) —
    rank 1-based within qid, each input already cut to its window.
    ``weights``: per-ranking multipliers (default all 1.0 — classic
    RRF); ES exposes the same knob on its linear/rrf retrievers.
    """
    rankings = list(rankings)
    if len(rankings) < 2:
        raise ValueError(
            f"rrf_fusion fuses >= 2 rankings, got {len(rankings)}"
        )
    if rank_constant < 1:
        raise ValueError(f"rank_constant must be >= 1, got {rank_constant}")
    ws = [1.0] * len(rankings) if weights is None else [float(w) for w in weights]
    if len(ws) != len(rankings):
        raise ValueError(
            f"{len(ws)} weights for {len(rankings)} rankings"
        )
    if any(w < 0 for w in ws):
        raise ValueError(f"weights must be >= 0, got {ws}")
    parts = []
    for df, w in zip(rankings, ws):
        for col in ("qid", id_col, "rank"):
            if col not in df.columns:
                raise ValueError(
                    f"ranking missing column {col!r} (has {df.columns})"
                )
        parts.append(
            df.select(
                "qid",
                F.col(id_col).alias("doc_id"),
                (
                    F.lit(w)
                    / (F.lit(rank_constant) + F.col("rank")).cast("double")
                ).alias("_c"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy("qid", "doc_id").agg(F.sum("_c").alias("score"))
    return topk_per_group(fused, k=k).select("qid", "doc_id", "score", "rank")
